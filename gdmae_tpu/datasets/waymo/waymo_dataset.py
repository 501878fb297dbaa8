"""Waymo Open Dataset loader (reference
pcdet/datasets/waymo/waymo_dataset.py).

Consumes the same per-sequence ``<seq>/<seq>.pkl`` infos + ``NNNN.npy``
point files the reference tooling produces.  Evaluation modes:
  * 'kitti': KITTI-protocol AP on Waymo annos (always available — the
    native numpy evaluator).
  * 'waymo': official Waymo OD metrics, gated on the waymo-open-dataset
    package being installed.
  * 'waymo_custom': writes ``detection_pred.bin`` for the external
    compute_detection_metrics_main binary (gated on waymo protos).
Shared-memory point caching mirrors the reference (:78-120) via
multiprocessing.shared_memory instead of the SharedArray package.
"""
from __future__ import annotations

import copy
import os
import pickle
from pathlib import Path

import numpy as np

from ...utils import box_utils, common_utils
from ..dataset import DatasetTemplate


class WaymoDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names, training=training,
            root_path=root_path, logger=logger,
        )
        self.data_path = self.root_path / self.dataset_cfg.PROCESSED_DATA_TAG
        self.split = self.dataset_cfg.DATA_SPLIT[self.mode]
        split_file = self.root_path / "ImageSets" / (self.split + ".txt")
        self.sample_sequence_list = (
            [x.strip() for x in split_file.read_text().splitlines()]
            if split_file.exists() else []
        )
        self.infos = []
        self.include_waymo_data(self.mode)

        self.use_shared_memory = self.dataset_cfg.get("USE_SHARED_MEMORY", False) \
            and self.training
        self.shared_memory_file_limit = self.dataset_cfg.get(
            "SHARED_MEMORY_FILE_LIMIT", 0x7FFFFFFF)
        if self.use_shared_memory:
            self.load_data_to_shared_memory()

    def check_sequence_name_with_all_version(self, sequence_file):
        sequence_file = Path(sequence_file)
        if sequence_file.exists():
            return sequence_file
        for pre in ("training", "validation", "testing"):
            cand = Path(str(sequence_file).replace("segment", pre + "_segment"))
            if cand.exists():
                return cand
        cand = Path(str(sequence_file).replace("_with_camera_labels", ""))
        return cand if cand.exists() else sequence_file

    def include_waymo_data(self, mode):
        infos = []
        skipped = 0
        for seq_file in self.sample_sequence_list:
            seq = os.path.splitext(seq_file)[0]
            info_path = self.check_sequence_name_with_all_version(
                self.data_path / seq / f"{seq}.pkl")
            if not info_path.exists():
                skipped += 1
                continue
            with open(info_path, "rb") as f:
                infos.extend(pickle.load(f))
        self.infos.extend(infos)
        if self.logger is not None:
            self.logger.info("Total skipped sequences: %d", skipped)
            self.logger.info("Total samples for Waymo dataset: %d", len(infos))
        interval = self.dataset_cfg.SAMPLED_INTERVAL[mode]
        if interval > 1:
            self.infos = self.infos[::interval]
            if self.logger is not None:
                self.logger.info("Sampled to %d samples", len(self.infos))

    def set_split(self, split):
        """Re-point the dataset at another ImageSets split (reference
        waymo_dataset.py:59-69); used by the raw-extraction driver."""
        super().__init__(
            dataset_cfg=self.dataset_cfg, class_names=self.class_names,
            training=self.training, root_path=self.root_path,
            logger=self.logger)
        self.split = split
        split_file = self.root_path / "ImageSets" / (split + ".txt")
        self.sample_sequence_list = (
            [x.strip() for x in split_file.read_text().splitlines()]
            if split_file.exists() else [])
        self.infos = []

    def get_infos(self, raw_data_path, save_path, num_workers=4,
                  has_label=True, sampled_interval=1, frame_parser=None):
        """Extract every sequence of the current split from raw tfrecords
        (reference waymo_dataset.py:137-160; extraction itself is the
        torch/TF-free waymo_extract.process_single_sequence)."""
        import multiprocessing
        from functools import partial

        from . import waymo_extract

        process = partial(
            waymo_extract.process_single_sequence, save_path=save_path,
            sampled_interval=sampled_interval, has_label=has_label,
            frame_parser=frame_parser)
        files = [self.check_sequence_name_with_all_version(
            Path(raw_data_path) / seq) for seq in self.sample_sequence_list]
        if num_workers > 1 and frame_parser is None and len(files) > 1:
            with multiprocessing.Pool(num_workers) as pool:
                seq_infos = pool.map(process, files)
        else:  # injected parsers may not pickle
            seq_infos = [process(f) for f in files]
        return [info for infos in seq_infos for info in infos]

    # -- /dev/shm point cache (reference waymo_dataset.py:78-120) --------- #
    def _shm_key(self, sequence_name, sample_idx):
        return f"gdmae_{sequence_name}___{sample_idx}"

    def load_data_to_shared_memory(self):
        for info in self.infos[:self.shared_memory_file_limit]:
            pc = info["point_cloud"]
            key = self._shm_key(pc["lidar_sequence"], pc["sample_idx"])
            if not common_utils.sa_exists(key):
                lidar_file = self.data_path / pc["lidar_sequence"] \
                    / ("%04d.npy" % pc["sample_idx"])
                common_utils.sa_create(key, np.load(lidar_file))
        if self.logger is not None:
            self.logger.info("Shared-memory cache populated")

    def clean_shared_memory(self):
        for info in self.infos[:self.shared_memory_file_limit]:
            pc = info["point_cloud"]
            common_utils.sa_delete(
                self._shm_key(pc["lidar_sequence"], pc["sample_idx"]))

    def get_lidar(self, sequence_name, sample_idx):
        if self.use_shared_memory and \
                common_utils.sa_exists(self._shm_key(sequence_name, sample_idx)):
            point_features = np.array(
                common_utils.sa_attach(self._shm_key(sequence_name, sample_idx)))
        else:
            lidar_file = self.data_path / sequence_name / ("%04d.npy" % sample_idx)
            point_features = np.load(lidar_file)  # (N, 6): x,y,z,intensity,elong,NLZ
        points_all, nlz = point_features[:, 0:5], point_features[:, 5]
        if not self.dataset_cfg.get("DISABLE_NLZ_FLAG_ON_POINTS", False):
            points_all = points_all[nlz == -1]
        points_all[:, 3] = np.tanh(points_all[:, 3])
        return points_all

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.infos) * self.total_epochs
        return len(self.infos)

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = copy.deepcopy(self.infos[index])
        pc_info = info["point_cloud"]
        sequence_name = pc_info["lidar_sequence"]
        sample_idx = pc_info["sample_idx"]
        info["frame_id"] = sequence_name + ("_%03d" % sample_idx)
        points = self.get_lidar(sequence_name, sample_idx)

        input_dict = {"points": points, "frame_id": info["frame_id"]}
        if "annos" in info:
            annos = common_utils.drop_info_with_name(info["annos"], name="unknown")
            gt_boxes_lidar = annos["gt_boxes_lidar"]
            if self.training and self.dataset_cfg.get("FILTER_EMPTY_BOXES_FOR_TRAIN", False):
                mask = annos["num_points_in_gt"] > 0
                annos["name"] = annos["name"][mask]
                gt_boxes_lidar = gt_boxes_lidar[mask]
            input_dict.update({
                "gt_names": annos["name"],
                "gt_boxes": gt_boxes_lidar,
            })
        data_dict = self.prepare_data(data_dict=input_dict)
        data_dict["metadata"] = info.get("metadata", info["frame_id"])
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
                "boxes_lidar": boxes,
                "frame_id": batch_dict["frame_id"][index],
                "metadata": batch_dict.get("metadata", batch_dict["frame_id"])[index],
            }
            if len(scores):
                out["name"] = np.array(class_names)[labels - 1]
            annos.append(out)
        return annos

    def evaluation(self, det_annos, class_names, eval_metric="kitti", **kwargs):
        eval_det_annos = copy.deepcopy(det_annos)

        if eval_metric in ("kitti", "waymo"):
            if "annos" not in self.infos[0]:
                return "No ground-truth boxes for evaluation", {}
            eval_gt_annos = [copy.deepcopy(info["annos"]) for info in self.infos]
            if eval_metric == "kitti":
                from ..kitti import kitti_utils
                from ..kitti.kitti_object_eval_python import eval as kitti_eval

                name_map = {"Vehicle": "Car", "Pedestrian": "Pedestrian",
                            "Cyclist": "Cyclist", "Sign": "Sign", "Car": "Car"}
                kitti_utils.transform_annotations_to_kitti_format(
                    eval_det_annos, map_name_to_kitti=name_map)
                kitti_utils.transform_annotations_to_kitti_format(
                    eval_gt_annos, map_name_to_kitti=name_map)
                kitti_classes = [name_map[x] for x in class_names]
                return kitti_eval.get_official_eval_result(
                    eval_gt_annos, eval_det_annos, kitti_classes)
            try:
                from .waymo_eval import OpenPCDetWaymoDetectionMetricsEstimator
            except ImportError as e:
                return f"waymo-open-dataset unavailable ({e}); " \
                       "use EVAL_METRIC kitti or waymo_custom", {}
            estimator = OpenPCDetWaymoDetectionMetricsEstimator()
            ap_dict = estimator.waymo_evaluation(
                eval_det_annos, eval_gt_annos, class_name=class_names,
                distance_thresh=1000)
            ap_str = "\n".join(f"{k}: {float(v[0]):.4f}" for k, v in ap_dict.items())
            return ap_str, {k: float(v[0]) for k, v in ap_dict.items()}

        if eval_metric == "waymo_custom":
            from . import waymo_utils

            out_path = kwargs.get("output_path", ".")
            waymo_utils.create_pd_detection(eval_det_annos, self.infos, out_path)
            return f"predictions written to {out_path}", {}
        raise NotImplementedError(eval_metric)


    # -- gt database creation (reference :330-409) ------------------------ #
    def create_groundtruth_database(self, info_path, save_path, split="train",
                                    sampled_interval=10, processed_data_tag=None):
        """Per-object point clips + global npy blob + db infos for the
        gt-sampling augmentor (class-subsampling identical to the reference:
        Vehicles kept every 4th frame, Pedestrians every 2nd)."""
        from ...utils import box_utils

        tag = processed_data_tag or self.dataset_cfg.PROCESSED_DATA_TAG
        save_path = Path(save_path)
        db_info_path = save_path / (
            f"{tag}_waymo_dbinfos_{split}_sampled_{sampled_interval}.pkl")
        db_data_path = save_path / (
            f"{tag}_gt_database_{split}_sampled_{sampled_interval}_global.npy")
        with open(info_path, "rb") as f:
            infos = pickle.load(f)

        all_db_infos = {}
        stacked = []
        offset = 0
        for k in range(0, len(infos), sampled_interval):
            info = infos[k]
            annos = info["annos"]
            names = annos["name"]
            difficulty = annos["difficulty"]
            gt_boxes = annos["gt_boxes_lidar"]
            if k % 4 != 0 and len(names) > 0:
                keep = names != "Vehicle"
                names, difficulty, gt_boxes = names[keep], difficulty[keep], gt_boxes[keep]
            if k % 2 != 0 and len(names) > 0:
                keep = names != "Pedestrian"
                names, difficulty, gt_boxes = names[keep], difficulty[keep], gt_boxes[keep]
            if len(gt_boxes) == 0:
                continue
            pc_info = info["point_cloud"]
            points = self.get_lidar(pc_info["lidar_sequence"], pc_info["sample_idx"])
            corners = box_utils.boxes_to_corners_3d(gt_boxes[:, :7])
            for i in range(len(gt_boxes)):
                inside = box_utils.in_hull(points[:, 0:3], corners[i])
                gt_points = points[inside].astype(np.float32)
                gt_points[:, :3] -= gt_boxes[i, :3]
                stacked.append(gt_points)
                db_info = {
                    "name": names[i],
                    "path": "",  # points live in the global blob
                    "sequence_name": pc_info["lidar_sequence"],
                    "sample_idx": pc_info["sample_idx"], "gt_idx": i,
                    "box3d_lidar": gt_boxes[i],
                    "num_points_in_gt": len(gt_points),
                    "difficulty": difficulty[i],
                    "global_data_offset": (offset, offset + len(gt_points)),
                }
                offset += len(gt_points)
                all_db_infos.setdefault(str(names[i]), []).append(db_info)
        np.save(db_data_path, np.concatenate(stacked, axis=0)
                if stacked else np.zeros((0, 5), np.float32))
        with open(db_info_path, "wb") as f:
            pickle.dump(all_db_infos, f)
        return db_info_path
