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

    # -- info / gt-database creation (reference once_dataset.py:106-291) -- #
    def get_infos(self, num_workers=4, sample_seq_list=None):
        """Parse per-sequence ``<seq>/<seq>.json`` into pcdet-format info
        dicts (frame chain, calib per camera, annos + num_points_in_gt)."""
        import concurrent.futures as futures
        import json

        from ...utils import box_utils

        root_path = self.root_path
        cam_names = self.cam_names

        def process_single_sequence(seq_idx):
            seq_infos = []
            seq_path = Path(root_path) / "data" / seq_idx
            with open(seq_path / f"{seq_idx}.json") as f:
                info_this_seq = json.load(f)
            meta_info = info_this_seq.get("meta_info")
            calib = info_this_seq["calib"]
            frames = info_this_seq["frames"]
            for f_idx, frame in enumerate(frames):
                frame_id = frame["frame_id"]
                frame_dict = {
                    "sequence_id": seq_idx,
                    "frame_id": frame_id,
                    "timestamp": int(frame_id),
                    "prev_id": frames[f_idx - 1]["frame_id"] if f_idx > 0 else None,
                    "next_id": (frames[f_idx + 1]["frame_id"]
                                if f_idx < len(frames) - 1 else None),
                    "meta_info": meta_info,
                    "lidar": str(seq_path / "lidar_roof" / f"{frame_id}.bin"),
                    "pose": np.array(frame["pose"]),
                }
                calib_dict = {}
                for cam in cam_names:
                    frame_dict[cam] = str(seq_path / cam / f"{frame_id}.jpg")
                    calib_dict[cam] = {
                        "cam_to_velo": np.array(calib[cam]["cam_to_velo"]),
                        "cam_intrinsic": np.array(calib[cam]["cam_intrinsic"]),
                        "distortion": np.array(calib[cam]["distortion"]),
                    }
                frame_dict["calib"] = calib_dict

                if "annos" in frame:
                    annos = frame["annos"]
                    boxes_3d = np.array(annos["boxes_3d"])
                    if boxes_3d.shape[0] == 0:
                        continue
                    annos_dict = {
                        "name": np.array(annos["names"]),
                        "boxes_3d": boxes_3d,
                        "boxes_2d": {cam: np.array(annos["boxes_2d"][cam])
                                     for cam in cam_names},
                    }
                    points = self.get_lidar(seq_idx, frame_id)
                    corners = box_utils.boxes_to_corners_3d(boxes_3d)
                    npig = np.array([
                        box_utils.in_hull(points[:, 0:3], corners[k]).sum()
                        for k in range(boxes_3d.shape[0])], dtype=np.int32)
                    annos_dict["num_points_in_gt"] = npig
                    frame_dict["annos"] = annos_dict
                seq_infos.append(frame_dict)
            return seq_infos

        seq_list = sample_seq_list if sample_seq_list is not None else self.sample_seq_list
        with futures.ThreadPoolExecutor(num_workers) as executor:
            results = executor.map(process_single_sequence, seq_list)
        all_infos = []
        for info in results:
            all_infos.extend(info)
        return all_infos

    def create_groundtruth_database(self, info_path=None, used_classes=None,
                                    split="train"):
        """Crop per-object point clips into gt_database/*.bin + dbinfos pkl
        for the gt-sampling augmentor."""
        from ...utils import box_utils

        database_save_path = Path(self.root_path) / (
            "gt_database" if split == "train" else f"gt_database_{split}")
        db_info_save_path = Path(self.root_path) / f"once_dbinfos_{split}.pkl"
        database_save_path.mkdir(parents=True, exist_ok=True)

        all_db_infos = {}
        with open(info_path, "rb") as f:
            infos = pickle.load(f)
        for info in infos:
            if "annos" not in info:
                continue
            points = self.get_lidar(info["sequence_id"], info["frame_id"])
            names = info["annos"]["name"]
            gt_boxes = np.asarray(info["annos"]["boxes_3d"], np.float32)
            inside = box_utils.points_in_boxes_3d(
                points[:, 0:3], gt_boxes[:, :7]).T  # (nbox, npts)
            for i in range(gt_boxes.shape[0]):
                if used_classes is not None and names[i] not in used_classes:
                    continue
                filename = "%s_%s_%d.bin" % (info["frame_id"], names[i], i)
                gt_points = points[inside[i] > 0].copy()
                gt_points[:, :3] -= gt_boxes[i, :3]
                (database_save_path / filename).write_bytes(gt_points.tobytes())
                db_info = {
                    "name": names[i],
                    "path": str((database_save_path / filename).relative_to(self.root_path)),
                    "gt_idx": i,
                    "box3d_lidar": gt_boxes[i],
                    "num_points_in_gt": gt_points.shape[0],
                }
                all_db_infos.setdefault(str(names[i]), []).append(db_info)
        with open(db_info_save_path, "wb") as f:
            pickle.dump(all_db_infos, f)
        return db_info_save_path

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
