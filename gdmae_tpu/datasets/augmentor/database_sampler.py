"""Class-balanced GT paste-in sampler (host-side numpy).

Mirrors reference pcdet/datasets/augmentor/database_sampler.py: sample
objects per class from a pre-built gt database, reject samples colliding
(rotated BEV IoU > 0) with existing boxes or each other, optionally lift
onto the road plane, paste their points into the scene, and fade out after
``FADE_EPOCH``.  The CUDA/CPU IoU extension is replaced by the numpy
rotated-IoU (utils/rotated_iou_np.py).
"""
from __future__ import annotations

import copy
from pathlib import Path

import numpy as np

from ...utils import box_utils
from ...utils import file_client as file_client_mod
from ...utils.rotated_iou_np import boxes_bev_iou_cpu


class DataBaseSampler:
    def __init__(self, root_path, sampler_cfg, class_names, logger=None):
        self.root_path = Path(root_path)
        self.class_names = class_names
        self.sampler_cfg = sampler_cfg
        self.logger = logger
        self.db_infos = {name: [] for name in class_names}
        self.fade_epoch = sampler_cfg.get("FADE_EPOCH", 0)

        backend_cfg = sampler_cfg.get("BACKEND", {"NAME": "HardDiskBackend"})
        self.client = getattr(file_client_mod, backend_cfg["NAME"])(
            **backend_cfg.get("KWARGS", {})
        )

        for db_info_path in sampler_cfg.DB_INFO_PATH:
            path = self.root_path.resolve() / db_info_path
            infos = self.client.load_pickle(path)
            for name in class_names:
                self.db_infos[name].extend(infos.get(name, []))

        for func_name, val in sampler_cfg.get("PREPARE", {}).items():
            self.db_infos = getattr(self, func_name)(self.db_infos, val)

        self.sample_groups = {}
        self.sample_class_num = {}
        self.limit_whole_scene = sampler_cfg.get("LIMIT_WHOLE_SCENE", False)
        for x in sampler_cfg.SAMPLE_GROUPS:
            class_name, sample_num = x.split(":")
            if class_name not in class_names:
                continue
            self.sample_class_num[class_name] = sample_num
            self.sample_groups[class_name] = {
                "sample_num": sample_num,
                "pointer": len(self.db_infos[class_name]),
                "indices": np.arange(len(self.db_infos[class_name])),
            }

    def __getstate__(self):
        d = dict(self.__dict__)
        d.pop("logger", None)
        return d

    def __setstate__(self, d):
        self.__dict__.update(d)

    # -- db filters (reference :93-120) --------------------------------- #
    def filter_by_difficulty(self, db_infos, removed_difficulty):
        return {
            key: [info for info in infos if info["difficulty"] not in removed_difficulty]
            for key, infos in db_infos.items()
        }

    def filter_by_min_points(self, db_infos, min_gt_points_list):
        for name_num in min_gt_points_list:
            name, min_num = name_num.split(":")
            min_num = int(min_num)
            if min_num > 0 and name in db_infos:
                db_infos[name] = [
                    info for info in db_infos[name]
                    if info["num_points_in_gt"] >= min_num
                ]
        return db_infos

    # -- sampling (reference :122-139) ----------------------------------- #
    def sample_with_fixed_number(self, class_name, sample_group):
        sample_num = int(sample_group["sample_num"])
        pointer, indices = sample_group["pointer"], sample_group["indices"]
        if pointer >= len(self.db_infos[class_name]):
            indices = np.random.permutation(len(self.db_infos[class_name]))
            pointer = 0
        sampled = [self.db_infos[class_name][i] for i in indices[pointer:pointer + sample_num]]
        sample_group["pointer"] = pointer + sample_num
        sample_group["indices"] = indices
        return sampled

    @staticmethod
    def put_boxes_on_road_planes(gt_boxes, road_planes, calib):
        """Lift sampled boxes onto the scene's road plane (reference
        :141-159; KITTI only)."""
        a, b, c, d = road_planes
        center_cam = calib.lidar_to_rect(gt_boxes[:, 0:3])
        cur_height_cam = (-d - a * center_cam[:, 0] - c * center_cam[:, 2]) / b
        center_cam[:, 1] = cur_height_cam
        cur_lidar_height = calib.rect_to_lidar(center_cam)[:, 2]
        mv_height = gt_boxes[:, 2] - gt_boxes[:, 5] / 2 - cur_lidar_height
        gt_boxes[:, 2] -= mv_height
        return gt_boxes, mv_height

    def add_sampled_boxes_to_scene(self, data_dict, sampled_gt_boxes, sampled_infos):
        gt_boxes_mask = data_dict["gt_boxes_mask"]
        gt_boxes = data_dict["gt_boxes"][gt_boxes_mask]
        gt_names = data_dict["gt_names"][gt_boxes_mask]
        points = data_dict["points"]

        mv_height = None
        if self.sampler_cfg.get("USE_ROAD_PLANE", False) and "road_plane" in data_dict:
            sampled_gt_boxes, mv_height = self.put_boxes_on_road_planes(
                sampled_gt_boxes, data_dict["road_plane"], data_dict["calib"]
            )
            data_dict.pop("calib", None)

        obj_points_list = []
        for idx, info in enumerate(sampled_infos):
            file_path = self.root_path / info["path"]
            obj_points = self.client.load_to_numpy(file_path, dtype=np.float32).reshape(
                [-1, self.sampler_cfg.NUM_POINT_FEATURES])
            obj_points[:, :3] += info["box3d_lidar"][:3]
            if mv_height is not None:
                obj_points[:, 2] -= mv_height[idx]
            obj_points_list.append(obj_points)
        obj_points = np.concatenate(obj_points_list, axis=0)
        sampled_gt_names = np.array([x["name"] for x in sampled_infos])

        if self.sampler_cfg.get("REMOVE_POINTS", True):
            large = box_utils.enlarge_box3d(
                sampled_gt_boxes[:, 0:7],
                extra_width=self.sampler_cfg.get("REMOVE_EXTRA_WIDTH", [0, 0, 0]))
            points = box_utils.remove_points_in_boxes3d(points, large)

        data_dict["points"] = np.concatenate([obj_points, points], axis=0)
        data_dict["gt_names"] = np.concatenate([gt_names, sampled_gt_names], axis=0)
        data_dict["gt_boxes"] = np.concatenate([gt_boxes, sampled_gt_boxes], axis=0)
        return data_dict

    def __call__(self, data_dict):
        # fade scheduling (reference :223)
        if data_dict.get("total_epochs", 1) < self.fade_epoch + data_dict.get("cur_epoch", 0) + 1:
            return data_dict

        gt_boxes = data_dict["gt_boxes"]
        gt_names = data_dict["gt_names"].astype(str)
        existed_boxes = gt_boxes
        total_valid_sampled = []
        for class_name, sample_group in self.sample_groups.items():
            if self.limit_whole_scene:
                num_gt = int(np.sum(class_name == gt_names))
                sample_group["sample_num"] = str(
                    int(self.sample_class_num[class_name]) - num_gt)
            if int(sample_group["sample_num"]) <= 0:
                continue
            sampled = self.sample_with_fixed_number(class_name, sample_group)
            if len(sampled) == 0:
                continue
            sampled_boxes = np.stack(
                [x["box3d_lidar"] for x in sampled], axis=0).astype(np.float32)

            iou1 = boxes_bev_iou_cpu(sampled_boxes[:, 0:7], existed_boxes[:, 0:7])
            iou2 = boxes_bev_iou_cpu(sampled_boxes[:, 0:7], sampled_boxes[:, 0:7])
            np.fill_diagonal(iou2, 0)
            iou1 = iou1 if iou1.shape[1] > 0 else iou2
            valid = ((iou1.max(axis=1) + iou2.max(axis=1)) == 0).nonzero()[0]
            total_valid_sampled.extend(sampled[i] for i in valid)
            existed_boxes = np.concatenate(
                (existed_boxes, sampled_boxes[valid]), axis=0)

        sampled_gt_boxes = existed_boxes[gt_boxes.shape[0]:]
        if len(total_valid_sampled) > 0:
            data_dict = self.add_sampled_boxes_to_scene(
                data_dict, sampled_gt_boxes, total_valid_sampled)
        data_dict.pop("gt_boxes_mask", None)
        return data_dict
