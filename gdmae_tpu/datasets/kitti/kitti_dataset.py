"""KITTI dataset (host-side; reference pcdet/datasets/kitti/kitti_dataset.py).

Loads the same ``kitti_infos_*.pkl`` info files and gt database the
reference tooling produces, applies FOV filtering / similar-type mapping /
road planes, and evaluates with the official KITTI protocol (numpy port of
kitti_object_eval_python).
"""
from __future__ import annotations

import copy
import pickle
from pathlib import Path

import numpy as np

from ...utils import box_utils, calibration_kitti, common_utils, object3d_kitti
from ...utils.file_client import HardDiskBackend
from ..dataset import DatasetTemplate


class KittiDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names, training=training,
            root_path=root_path, logger=logger,
        )
        self.client = HardDiskBackend()
        self.split = self.dataset_cfg.DATA_SPLIT[self.mode]
        self.root_split_path = self.root_path / ("training" if self.split != "test" else "testing")

        split_file = self.root_path / "ImageSets" / (self.split + ".txt")
        self.sample_id_list = (
            [x.strip() for x in split_file.read_text().splitlines()]
            if split_file.exists() else []
        )
        self.kitti_infos = []
        self.include_kitti_data(self.mode)

    def include_kitti_data(self, mode):
        infos = []
        for info_path in self.dataset_cfg.INFO_PATH[mode]:
            path = self.root_path / info_path
            if not path.exists():
                continue
            with open(path, "rb") as f:
                infos.extend(pickle.load(f))
        self.kitti_infos.extend(infos)
        if self.logger is not None:
            self.logger.info("Total samples for KITTI dataset: %d", len(infos))

    def get_lidar(self, idx):
        f = self.root_split_path / "velodyne_reduced" / f"{idx}.bin"
        if not f.exists():
            f = self.root_split_path / "velodyne" / f"{idx}.bin"
        return np.fromfile(str(f), dtype=np.float32).reshape(-1, 4)

    def get_calib(self, idx):
        return calibration_kitti.Calibration(
            self.root_split_path / "calib" / f"{idx}.txt")

    def get_label(self, idx):
        return object3d_kitti.get_objects_from_label(
            self.root_split_path / "label_2" / f"{idx}.txt")

    def get_road_plane(self, idx):
        plane_file = self.root_split_path / "planes" / f"{idx}.txt"
        if not plane_file.exists():
            return None
        lines = plane_file.read_text().splitlines()
        plane = np.asarray([float(i) for i in lines[3].split()])
        if plane[1] > 0:
            plane = -plane
        return plane / np.linalg.norm(plane[0:3])

    @staticmethod
    def get_fov_flag(pts_rect, img_shape, calib):
        pts_img, pts_rect_depth = calib.rect_to_img(pts_rect)
        flag = (
            (pts_img[:, 0] >= 0) & (pts_img[:, 0] < img_shape[1])
            & (pts_img[:, 1] >= 0) & (pts_img[:, 1] < img_shape[0])
            & (pts_rect_depth >= 0)
        )
        return flag

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.kitti_infos) * self.total_epochs
        return len(self.kitti_infos)

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.kitti_infos)
        info = copy.deepcopy(self.kitti_infos[index])
        sample_idx = info["point_cloud"]["lidar_idx"]
        img_shape = info["image"]["image_shape"]
        calib = self.get_calib(sample_idx)
        get_item_list = self.dataset_cfg.get("GET_ITEM_LIST", ["points"])

        input_dict = {"frame_id": sample_idx, "calib": calib}

        if "annos" in info:
            annos = common_utils.drop_info_with_name(info["annos"], name="DontCare")
            loc, dims, rots = annos["location"], annos["dimensions"], annos["rotation_y"]
            gt_names = annos["name"]
            if self.dataset_cfg.get("ENABLE_SIMILAR_TYPE", False):
                gt_names = np.array(
                    ["Car" if n == "Van" else n for n in gt_names])
            boxes_cam = np.concatenate(
                [loc, dims, rots[..., None]], axis=1).astype(np.float32)
            input_dict["gt_names"] = gt_names
            input_dict["gt_boxes"] = box_utils.boxes3d_kitti_camera_to_lidar(boxes_cam, calib)
            if "gt_boxes2d" in get_item_list:
                input_dict["gt_boxes2d"] = annos["bbox"]
            road_plane = self.get_road_plane(sample_idx)
            if road_plane is not None:
                input_dict["road_plane"] = road_plane

        if "points" in get_item_list:
            points = self.get_lidar(sample_idx)
            if self.dataset_cfg.get("FOV_POINTS_ONLY", False):
                pts_rect = calib.lidar_to_rect(points[:, 0:3])
                points = points[self.get_fov_flag(pts_rect, img_shape, calib)]
            input_dict["points"] = points

        data_dict = self.prepare_data(data_dict=input_dict)
        data_dict["image_shape"] = img_shape
        data_dict["calib"] = calib
        return data_dict

    # -- predictions + evaluation (reference :247-338) -------------------- #
    @staticmethod
    def generate_prediction_dicts(batch_dict, pred_dicts, class_names, output_path=None):
        """pred_dicts: list (per sample) of {pred_boxes (N,7) np,
        pred_scores (N,), pred_labels (N,)} — already on host."""

        def template(n):
            return {
                "name": np.zeros(n), "truncated": np.zeros(n), "occluded": np.zeros(n),
                "alpha": np.zeros(n), "bbox": np.zeros([n, 4]),
                "dimensions": np.zeros([n, 3]), "location": np.zeros([n, 3]),
                "rotation_y": np.zeros(n), "score": np.zeros(n),
                "boxes_lidar": np.zeros([n, 7]),
            }

        annos = []
        for index, box_dict in enumerate(pred_dicts):
            pred_scores = np.asarray(box_dict["pred_scores"])
            pred_boxes = np.asarray(box_dict["pred_boxes"])
            pred_labels = np.asarray(box_dict["pred_labels"]).astype(np.int64)
            out = template(len(pred_scores))
            if len(pred_scores) > 0:
                calib = batch_dict["calib"][index]
                image_shape = batch_dict["image_shape"][index]
                boxes_cam = box_utils.boxes3d_lidar_to_kitti_camera(pred_boxes, calib)
                boxes_img = box_utils.boxes3d_kitti_camera_to_imageboxes(
                    boxes_cam, calib, image_shape=image_shape)
                out["name"] = np.array(class_names)[pred_labels - 1]
                out["alpha"] = (-np.arctan2(-pred_boxes[:, 1], pred_boxes[:, 0])
                                + boxes_cam[:, 6])
                out["bbox"] = boxes_img
                out["dimensions"] = boxes_cam[:, 3:6]
                out["location"] = boxes_cam[:, 0:3]
                out["rotation_y"] = boxes_cam[:, 6]
                out["score"] = pred_scores
                out["boxes_lidar"] = pred_boxes
            out["frame_id"] = batch_dict["frame_id"][index]
            annos.append(out)

            if output_path is not None:
                cur_det_file = Path(output_path) / f"{out['frame_id']}.txt"
                with open(cur_det_file, "w") as f:
                    for i in range(len(out["bbox"])):
                        bbox, loc, dims = out["bbox"][i], out["location"][i], out["dimensions"][i]
                        print(
                            "%s -1 -1 %.4f %.4f %.4f %.4f %.4f %.4f %.4f %.4f "
                            "%.4f %.4f %.4f %.4f %.4f"
                            % (out["name"][i], out["alpha"][i], bbox[0], bbox[1],
                               bbox[2], bbox[3], dims[1], dims[2], dims[0],
                               loc[0], loc[1], loc[2], out["rotation_y"][i],
                               out["score"][i]),
                            file=f,
                        )
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        if "annos" not in self.kitti_infos[0]:
            return None, {}
        from .kitti_object_eval_python import eval as kitti_eval

        eval_det = copy.deepcopy(det_annos)
        eval_gt = [copy.deepcopy(info["annos"]) for info in self.kitti_infos]
        return kitti_eval.get_official_eval_result(eval_gt, eval_det, class_names)

    # -- info/db creation tooling (reference :126-246, create_kitti_infos) -- #
    def set_split(self, split):
        self.split = split
        self.root_split_path = self.root_path / ("training" if split != "test" else "testing")
        split_file = self.root_path / "ImageSets" / (split + ".txt")
        self.sample_id_list = (
            [x.strip() for x in split_file.read_text().splitlines()]
            if split_file.exists() else []
        )

    def get_image_shape(self, idx):
        img_file = self.root_split_path / "image_2" / f"{idx}.png"
        if img_file.exists():
            try:
                from PIL import Image

                with Image.open(img_file) as im:
                    return np.array([im.height, im.width], np.int32)
            except ImportError:
                pass
        return np.array([375, 1242], np.int32)

    def get_infos(self, num_workers=4, has_label=True, count_inside_pts=True,
                  sample_id_list=None):
        import concurrent.futures as futures

        def process_single_scene(sample_idx):
            info = {"point_cloud": {"num_features": 4, "lidar_idx": sample_idx}}
            info["image"] = {"image_idx": sample_idx,
                             "image_shape": self.get_image_shape(sample_idx)}
            calib = self.get_calib(sample_idx)
            P2 = np.concatenate([calib.P2, np.array([[0., 0., 0., 1.]])], axis=0)
            R0_4x4 = np.zeros([4, 4], dtype=calib.R0.dtype)
            R0_4x4[3, 3] = 1.0
            R0_4x4[:3, :3] = calib.R0
            V2C_4x4 = np.concatenate([calib.V2C, np.array([[0., 0., 0., 1.]])], axis=0)
            info["calib"] = {"P2": P2, "R0_rect": R0_4x4, "Tr_velo_to_cam": V2C_4x4}

            if has_label:
                obj_list = self.get_label(sample_idx)
                a = {
                    "name": np.array([o.cls_type for o in obj_list]),
                    "truncated": np.array([o.truncation for o in obj_list]),
                    "occluded": np.array([o.occlusion for o in obj_list]),
                    "alpha": np.array([o.alpha for o in obj_list]),
                    "bbox": np.stack([o.box2d for o in obj_list], 0),
                    "dimensions": np.array([[o.l, o.h, o.w] for o in obj_list]),
                    "location": np.stack([o.loc for o in obj_list], 0),
                    "rotation_y": np.array([o.ry for o in obj_list]),
                    "score": np.array([o.score for o in obj_list]),
                    "difficulty": np.array([o.level for o in obj_list], np.int32),
                }
                num_objects = len([o for o in obj_list if o.cls_type != "DontCare"])
                num_gt = len(a["name"])
                a["index"] = np.array(
                    list(range(num_objects)) + [-1] * (num_gt - num_objects),
                    np.int32)
                loc = a["location"][:num_objects]
                dims = a["dimensions"][:num_objects]
                rots = a["rotation_y"][:num_objects]
                loc_lidar = calib.rect_to_lidar(loc)
                l, h, w = dims[:, 0:1], dims[:, 1:2], dims[:, 2:3]
                loc_lidar[:, 2] += h[:, 0] / 2
                gt_boxes_lidar = np.concatenate(
                    [loc_lidar, l, w, h, -(np.pi / 2 + rots[..., None])], axis=1)
                a["gt_boxes_lidar"] = gt_boxes_lidar
                info["annos"] = a

                if count_inside_pts:
                    points = self.get_lidar(sample_idx)
                    pts_rect = calib.lidar_to_rect(points[:, 0:3])
                    fov = self.get_fov_flag(pts_rect, info["image"]["image_shape"], calib)
                    pts_fov = points[fov]
                    corners = box_utils.boxes_to_corners_3d(gt_boxes_lidar)
                    num_pts = -np.ones(num_gt, np.int32)
                    for k in range(num_objects):
                        num_pts[k] = box_utils.in_hull(
                            pts_fov[:, 0:3], corners[k]).sum()
                    a["num_points_in_gt"] = num_pts
            return info

        ids = sample_id_list if sample_id_list is not None else self.sample_id_list
        with futures.ThreadPoolExecutor(num_workers) as ex:
            return list(ex.map(process_single_scene, ids))

    def create_groundtruth_database(self, info_path, split="train"):
        """Extract per-object point clips + db infos for gt-sampling
        augmentation (reference :199-246)."""
        db_save_path = self.root_path / ("gt_database" if split == "train"
                                         else f"gt_database_{split}")
        db_info_path = self.root_path / f"kitti_dbinfos_{split}.pkl"
        db_save_path.mkdir(parents=True, exist_ok=True)
        with open(info_path, "rb") as f:
            infos = pickle.load(f)

        all_db_infos = {}
        for k, info in enumerate(infos):
            sample_idx = info["point_cloud"]["lidar_idx"]
            points = self.get_lidar(sample_idx)
            annos = info["annos"]
            gt_boxes = annos["gt_boxes_lidar"]
            corners = box_utils.boxes_to_corners_3d(gt_boxes)
            for i in range(len(gt_boxes)):
                inside = box_utils.in_hull(points[:, 0:3], corners[i])
                gt_points = points[inside]
                gt_points[:, :3] -= gt_boxes[i, :3]
                filename = f"{sample_idx}_{annos['name'][i]}_{i}.bin"
                (db_save_path / filename).write_bytes(
                    gt_points.astype(np.float32).tobytes())
                db_info = {
                    "name": annos["name"][i],
                    "path": str((db_save_path / filename).relative_to(self.root_path)),
                    "image_idx": sample_idx, "gt_idx": i,
                    "box3d_lidar": gt_boxes[i],
                    "num_points_in_gt": len(gt_points),
                    "difficulty": annos["difficulty"][i],
                    "bbox": annos["bbox"][i], "score": annos["score"][i],
                }
                all_db_infos.setdefault(str(annos["name"][i]), []).append(db_info)
        with open(db_info_path, "wb") as f:
            pickle.dump(all_db_infos, f)
        return db_info_path


def create_kitti_infos(dataset_cfg, class_names, data_path, save_path):
    """Reference create_kitti_infos (:345-380): build train/val/test info
    pickles + the gt database."""
    dataset = KittiDataset(dataset_cfg=dataset_cfg, class_names=class_names,
                           root_path=data_path, training=False)
    for split, has_label in (("train", True), ("val", True), ("test", False)):
        dataset.set_split(split)
        infos = dataset.get_infos(has_label=has_label,
                                  count_inside_pts=has_label)
        out = save_path / f"kitti_infos_{split}.pkl"
        with open(out, "wb") as f:
            pickle.dump(infos, f)
        print(f"Kitti info {split} saved to {out}")
    dataset.set_split("train")
    dataset.create_groundtruth_database(save_path / "kitti_infos_train.pkl")


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "create_kitti_infos":
        import yaml

        from ...config import EasyDict

        dataset_cfg = EasyDict(yaml.safe_load(open(sys.argv[2])))
        root = Path(__file__).resolve().parents[3]
        create_kitti_infos(
            dataset_cfg=dataset_cfg,
            class_names=["Car", "Pedestrian", "Cyclist"],
            data_path=root / "data" / "kitti",
            save_path=root / "data" / "kitti",
        )
