"""ONCE dataset — labeled train/val plus unlabeled raw splits for MAE
pretraining (reference pcdet/datasets/once/once_dataset.py)."""
from __future__ import annotations

import copy
import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate


class ONCEDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names, training=training,
            root_path=root_path, logger=logger,
        )
        self.split = dataset_cfg.DATA_SPLIT["train"] if training \
            else dataset_cfg.DATA_SPLIT["test"]
        assert self.split in ["train", "val", "test",
                              "raw_small", "raw_medium", "raw_large"]
        split_file = self.root_path / "ImageSets" / (self.split + ".txt")
        self.sample_seq_list = (
            [x.strip() for x in split_file.read_text().splitlines()]
            if split_file.exists() else []
        )
        self.cam_names = ["cam01", "cam03", "cam05", "cam06", "cam07",
                          "cam08", "cam09"]
        self.once_infos = []
        self.include_once_data(self.split)

    def include_once_data(self, split):
        infos = []
        for info_path in self.dataset_cfg.INFO_PATH[split]:
            path = self.root_path / info_path
            if not path.exists():
                continue
            with open(path, "rb") as f:
                infos.extend(pickle.load(f))
        # labeled splits keep only annotated frames (reference :48-52)
        if split in ("train", "val"):
            infos = [i for i in infos if "annos" in i]
        self.once_infos.extend(infos)
        if self.logger is not None:
            self.logger.info("Total samples for ONCE dataset: %d", len(infos))

    def get_lidar(self, sequence_id, frame_id):
        f = self.root_path / "data" / sequence_id / "lidar_roof" / f"{frame_id}.bin"
        return np.fromfile(str(f), dtype=np.float32).reshape(-1, 4)

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.once_infos) * self.total_epochs
        return len(self.once_infos)

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.once_infos)
        info = copy.deepcopy(self.once_infos[index])
        points = self.get_lidar(info["sequence_id"], info["frame_id"])
        input_dict = {"points": points, "frame_id": info["frame_id"]}
        if "annos" in info:
            annos = info["annos"]
            input_dict.update({
                "gt_names": annos["name"],
                "gt_boxes": annos["boxes_3d"],
            })
        data_dict = self.prepare_data(data_dict=input_dict)
        data_dict.pop("num_points_in_gt", None)
        return data_dict

    @staticmethod
    def generate_prediction_dicts(batch_dict, pred_dicts, class_names, output_path=None):
        annos = []
        for index, box_dict in enumerate(pred_dicts):
            scores = np.asarray(box_dict["pred_scores"])
            boxes = np.asarray(box_dict["pred_boxes"])
            labels = np.asarray(box_dict["pred_labels"]).astype(np.int64)
            out = {
                "name": np.zeros(len(scores), dtype=object),
                "score": scores,
                "boxes_3d": boxes,
                "frame_id": batch_dict["frame_id"][index],
            }
            if len(scores):
                out["name"] = np.array(class_names)[labels - 1]
            annos.append(out)
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        from .once_eval.evaluation import get_evaluation_results

        eval_det = copy.deepcopy(det_annos)
        eval_gt = [copy.deepcopy(info["annos"]) for info in self.once_infos]
        return get_evaluation_results(eval_gt, eval_det, class_names)
