"""DatasetTemplate: host-side prepare_data pipeline + fixed-capacity collate.

Mirrors reference pcdet/datasets/dataset.py:13-217 but collates to the TPU
static-shape contract: every batch tensor is padded to the capacities in
DATA_CONFIG.TPU_PADDING (points -> (B, MAX_POINTS, C) + point_mask,
gt_boxes -> (B, MAX_GT_BOXES, 8)), so the jitted train step never retraces.
"""
from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import numpy as np

from ..utils import common_utils
from .augmentor.data_augmentor import DataAugmentor
from .processor.data_processor import DataProcessor
from .processor.point_feature_encoder import PointFeatureEncoder

try:
    import torch.utils.data as torch_data

    _TorchDataset = torch_data.Dataset
except Exception:  # pragma: no cover - torch is baked into the image
    _TorchDataset = object


class DatasetTemplate(_TorchDataset):
    def __init__(self, dataset_cfg=None, class_names=None, training=True,
                 root_path=None, logger=None):
        super().__init__()
        self.dataset_cfg = dataset_cfg
        self.training = training
        self.class_names = class_names
        self.logger = logger
        self.root_path = Path(root_path if root_path is not None else dataset_cfg.DATA_PATH)
        if dataset_cfg is None or class_names is None:
            return

        self.point_cloud_range = np.array(dataset_cfg.POINT_CLOUD_RANGE, np.float32)
        self.point_feature_encoder = PointFeatureEncoder(
            dataset_cfg.POINT_FEATURE_ENCODING,
            point_cloud_range=self.point_cloud_range,
        )
        self.data_augmentor = DataAugmentor(
            self.root_path, dataset_cfg.DATA_AUGMENTOR, class_names, logger=logger
        ) if self.training and dataset_cfg.get("DATA_AUGMENTOR", None) else None
        self.data_processor = DataProcessor(
            dataset_cfg.DATA_PROCESSOR,
            point_cloud_range=self.point_cloud_range,
            training=self.training,
            num_point_features=self.point_feature_encoder.num_point_features,
        )
        self.grid_size = self.data_processor.grid_size
        self.voxel_size = self.data_processor.voxel_size

        pad_cfg = dataset_cfg.get("TPU_PADDING", {})
        self.max_points = int(pad_cfg.get("MAX_POINTS", 32768))
        self.max_pillars = int(pad_cfg.get("MAX_PILLARS", 12288))
        self.max_gt_boxes = int(pad_cfg.get("MAX_GT_BOXES", 64))

        # epoch state lives in shared memory: the loader runs PERSISTENT
        # fork'd workers, so a plain attribute updated by the training
        # loop's set_epoch would stay frozen at the fork-time value inside
        # the workers (stale fade_epoch scheduling, epoch-invariant MAE
        # masks — ADVICE r4 medium)
        import multiprocessing as _mp

        self._epoch_val = _mp.Value("i", 0)
        self._total_epochs_val = _mp.Value("i", 0)
        self._merge_all_iters_to_one_epoch = False

    @property
    def mode(self):
        return "train" if self.training else "test"

    @property
    def cur_epoch(self):
        v = getattr(self, "_epoch_val", None)
        return 0 if v is None else int(v.value)

    @property
    def total_epochs(self):
        v = getattr(self, "_total_epochs_val", None)
        return 0 if v is None else int(v.value)

    def set_epoch(self, cur_epoch, total_epochs):
        self._epoch_val.value = int(cur_epoch)
        self._total_epochs_val.value = int(total_epochs)

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, index):
        raise NotImplementedError

    # -- reference prepare_data (:103-166) ------------------------------- #
    def prepare_data(self, data_dict):
        if self.training and self.data_augmentor is not None:
            aug_dict = {
                **data_dict,
                "cur_epoch": self.cur_epoch,
                "total_epochs": self.total_epochs,
            }
            if data_dict.get("gt_boxes", None) is not None:
                aug_dict["gt_boxes_mask"] = np.array(
                    [n in self.class_names for n in data_dict["gt_names"]], dtype=np.bool_)
            data_dict = self.data_augmentor.forward(data_dict=aug_dict)

        if data_dict.get("gt_boxes", None) is not None:
            selected = common_utils.keep_arrays_by_name(
                data_dict["gt_names"], self.class_names)
            data_dict["gt_boxes"] = data_dict["gt_boxes"][selected]
            data_dict["gt_names"] = data_dict["gt_names"][selected]
            gt_classes = np.array(
                [self.class_names.index(n) + 1 for n in data_dict["gt_names"]],
                dtype=np.int32)
            data_dict["gt_boxes"] = np.concatenate(
                (data_dict["gt_boxes"],
                 gt_classes.reshape(-1, 1).astype(np.float32)), axis=1)

        if data_dict.get("points", None) is not None:
            data_dict = self.point_feature_encoder.forward(data_dict)

        data_dict = self.data_processor.forward(data_dict=data_dict)

        if self.training and data_dict.get("gt_boxes", None) is not None \
                and len(data_dict["gt_boxes"]) == 0:
            return self.__getitem__(np.random.randint(self.__len__()))

        data_dict.pop("gt_names", None)
        data_dict.pop("cur_epoch", None)
        data_dict.pop("total_epochs", None)
        return data_dict

    # -- fixed-capacity collate ------------------------------------------ #
    def collate_batch(self, batch_list, _unused=False):
        """Pad each sample to static capacities and stack.  Replaces the
        reference's ragged concat collate (dataset.py:168-217)."""
        out = {}
        b = len(batch_list)
        keys = set().union(*[d.keys() for d in batch_list])

        if "points" in keys:
            c = batch_list[0]["points"].shape[-1]
            pts = np.zeros((b, self.max_points, c), np.float32)
            mask = np.zeros((b, self.max_points), bool)
            truncated = 0
            for i, d in enumerate(batch_list):
                p = d["points"]
                if len(p) > self.max_points:
                    sel = np.random.choice(len(p), self.max_points, replace=False)
                    p = p[sel]
                    truncated += 1
                pts[i, :len(p)] = p
                mask[i, :len(p)] = True
            out["points"] = pts
            out["point_mask"] = mask
            if truncated and self.logger is not None:
                self.logger.warning("collate: %d samples exceeded MAX_POINTS", truncated)

        if "gt_boxes" in keys:
            code = max(d["gt_boxes"].shape[-1] for d in batch_list if "gt_boxes" in d)
            gt = np.zeros((b, self.max_gt_boxes, code), np.float32)
            for i, d in enumerate(batch_list):
                g = d.get("gt_boxes", np.zeros((0, code), np.float32))
                n = min(len(g), self.max_gt_boxes)
                gt[i, :n] = g[:n]
            out["gt_boxes"] = gt

        for key in ("voxels", "voxel_coords", "voxel_num_points"):
            if key in keys:
                arrs = [d[key] for d in batch_list]
                cap = max(len(a) for a in arrs)
                shp = (b, cap) + arrs[0].shape[1:]
                buf = np.zeros(shp, arrs[0].dtype)
                msk = np.zeros((b, cap), bool)
                for i, a in enumerate(arrs):
                    buf[i, :len(a)] = a
                    msk[i, :len(a)] = True
                out[key] = buf
                if key == "voxels":
                    out["voxel_mask"] = msk

        for key in keys - {"points", "gt_boxes", "voxels", "voxel_coords",
                           "voxel_num_points", "use_lead_xyz",
                           "transformation_3d_list", "transformation_3d_params"}:
            vals = [d.get(key) for d in batch_list]
            if isinstance(vals[0], np.ndarray) and all(
                    v is not None and v.shape == vals[0].shape for v in vals):
                out[key] = np.stack(vals, axis=0)
            else:
                out[key] = vals
        out["batch_size"] = b
        # epoch tag (shared-memory backed, live inside persistent workers)
        # so collate-time host prep can fold the epoch into per-batch rng
        out["cur_epoch"] = self.cur_epoch
        return out
