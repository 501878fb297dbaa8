"""Host-side (numpy) data augmentation queue.

Mirrors reference pcdet/datasets/augmentor/data_augmentor.py: ops are
assembled from config (AUG_CONFIG_LIST minus DISABLE_AUG_LIST), 3D
transforms record their parameters into ``transformation_3d_list`` /
``transformation_3d_params`` so the image branch can replay/reverse them
(reference fusion_layers/point_sample.py).  Runs in dataloader workers —
plain numpy, nothing here touches the device.
"""
from __future__ import annotations

from functools import partial

import numpy as np

from ...utils import common_utils
from . import database_sampler


class DataAugmentor:
    def __init__(self, root_path, augmentor_configs, class_names, logger=None):
        self.root_path = root_path
        self.class_names = class_names
        self.logger = logger
        self.data_augmentor_queue = []
        disable = list(augmentor_configs.get("DISABLE_AUG_LIST", []))
        for cur_cfg in augmentor_configs.AUG_CONFIG_LIST:
            if cur_cfg["NAME"] in disable:
                continue
            self.data_augmentor_queue.append(
                getattr(self, cur_cfg["NAME"])(config=cur_cfg)
            )

    # -- ops ----------------------------------------------------------- #
    def gt_sampling(self, config=None):
        return database_sampler.DataBaseSampler(
            root_path=self.root_path, sampler_cfg=config,
            class_names=self.class_names, logger=self.logger,
        )

    @staticmethod
    def _enabled(prob):
        return np.random.rand() < prob

    def random_world_drop(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_drop, config=config)
        pts = data_dict["points"]
        ratio = config["DROP_RATIO"] if self._enabled(config["PROBABILITY"]) else 0.0
        if ratio > 0:
            keep = np.random.choice(
                len(pts), int((1 - ratio) * len(pts)), replace=False)
            data_dict["points"] = pts[keep]
        return data_dict

    def random_world_flip(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_flip, config=config)
        recorded = "random_world_flip" in data_dict["transformation_3d_list"]
        if recorded:
            axes = data_dict["transformation_3d_params"]["random_world_flip"]
        else:
            axes = [a for a in config["ALONG_AXIS_LIST"]
                    if self._enabled(config["PROBABILITY"])]
        pts = data_dict["points"]
        gt = data_dict.get("gt_boxes")
        for axis in axes:
            if axis == "x":  # flip across the x axis: negate y
                pts[:, 1] = -pts[:, 1]
                if gt is not None:
                    gt[:, 1] = -gt[:, 1]
                    gt[:, 6] = -gt[:, 6]
                    if gt.shape[1] > 7:
                        gt[:, 8] = -gt[:, 8]
            elif axis == "y":
                pts[:, 0] = -pts[:, 0]
                if gt is not None:
                    gt[:, 0] = -gt[:, 0]
                    gt[:, 6] = -(gt[:, 6] + np.pi)
                    if gt.shape[1] > 7:
                        gt[:, 7] = -gt[:, 7]
            else:
                raise NotImplementedError(axis)
        if not recorded:
            data_dict["transformation_3d_list"].append("random_world_flip")
            data_dict["transformation_3d_params"]["random_world_flip"] = axes
        return data_dict

    def random_world_rotation(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_rotation, config=config)
        recorded = "random_world_rotation" in data_dict["transformation_3d_list"]
        if recorded:
            rot = data_dict["transformation_3d_params"]["random_world_rotation"]
        else:
            lo, hi = (config["WORLD_ROT_ANGLE"]
                      if self._enabled(config["PROBABILITY"]) else (0.0, 0.0))
            rot = np.random.uniform(lo, hi)
        pts = data_dict["points"]
        data_dict["points"] = common_utils.rotate_points_along_z(
            pts[None], np.array([rot]))[0]
        gt = data_dict.get("gt_boxes")
        if gt is not None:
            gt[:, 0:3] = common_utils.rotate_points_along_z(
                gt[None, :, 0:3], np.array([rot]))[0]
            gt[:, 6] += rot
            if gt.shape[1] > 7:  # velocity channels
                vel = np.concatenate([gt[:, 7:9], np.zeros((len(gt), 1))], axis=1)
                gt[:, 7:9] = common_utils.rotate_points_along_z(
                    vel[None], np.array([rot]))[0][:, 0:2]
        if not recorded:
            data_dict["transformation_3d_list"].append("random_world_rotation")
            data_dict["transformation_3d_params"]["random_world_rotation"] = rot
        return data_dict

    def random_world_scaling(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_scaling, config=config)
        recorded = "random_world_scaling" in data_dict["transformation_3d_list"]
        if recorded:
            scale = data_dict["transformation_3d_params"]["random_world_scaling"]
        else:
            lo, hi = (config["WORLD_SCALE_RANGE"]
                      if self._enabled(config["PROBABILITY"]) else (1.0, 1.0))
            scale = np.random.uniform(lo, hi)
        data_dict["points"][:, :3] *= scale
        gt = data_dict.get("gt_boxes")
        if gt is not None:
            gt[:, :6] *= scale
        if not recorded:
            data_dict["transformation_3d_list"].append("random_world_scaling")
            data_dict["transformation_3d_params"]["random_world_scaling"] = scale
        return data_dict

    def random_world_translation(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_translation, config=config)
        recorded = "random_world_translation" in data_dict["transformation_3d_list"]
        if recorded:
            offset = data_dict["transformation_3d_params"]["random_world_translation"]
        else:
            std = (config["NOISE_TRANSLATE_STD"]
                   if self._enabled(config["PROBABILITY"]) else [0.0, 0.0, 0.0])
            if not isinstance(std, (list, tuple)):
                std = [std, std, std]
            offset = np.array([np.random.normal(0, s) for s in std])
        data_dict["points"][:, :3] += offset
        gt = data_dict.get("gt_boxes")
        if gt is not None:
            gt[:, :3] += offset
        if not recorded:
            data_dict["transformation_3d_list"].append("random_world_translation")
            data_dict["transformation_3d_params"]["random_world_translation"] = offset
        return data_dict

    def photo_metric_distortion(self, data_dict=None, config=None):
        """Random brightness/contrast/saturation/hue/channel-swap on the image
        branch (reference data_augmentor.py:173-227; cv2-free HSV round-trip)."""
        if data_dict is None:
            return partial(self.photo_metric_distortion, config=config)
        img = data_dict["image"].astype(np.float32)

        brightness_delta = config["BRIGHTNESS_DELTA"]
        contrast_lower, contrast_upper = config["CONTRAST_RANGE"]
        saturation_lower, saturation_upper = config["SATURATION_RANGE"]
        hue_delta = config["HUE_DELTA"]

        if np.random.randint(2):
            img = img + np.random.uniform(-brightness_delta, brightness_delta)
        mode = np.random.randint(2)
        if mode == 1 and np.random.randint(2):
            img = img * np.random.uniform(contrast_lower, contrast_upper)

        img = _bgr_to_hsv(img)
        if np.random.randint(2):
            img[..., 1] *= np.random.uniform(saturation_lower, saturation_upper)
        if np.random.randint(2):
            img[..., 0] += np.random.uniform(-hue_delta, hue_delta)
            img[..., 0][img[..., 0] > 360] -= 360
            img[..., 0][img[..., 0] < 0] += 360
        img = _hsv_to_bgr(img)

        if mode == 0 and np.random.randint(2):
            img = img * np.random.uniform(contrast_lower, contrast_upper)
        if np.random.randint(2):
            img = img[..., np.random.permutation(3)]
        data_dict["image"] = img
        return data_dict

    # -- pipeline ------------------------------------------------------- #
    def forward(self, data_dict):
        data_dict["transformation_3d_list"] = data_dict.get("transformation_3d_list", [])
        data_dict["transformation_3d_params"] = data_dict.get("transformation_3d_params", {})
        for aug in self.data_augmentor_queue:
            data_dict = aug(data_dict=data_dict)

        if "gt_boxes" in data_dict:
            data_dict["gt_boxes"][:, 6] = common_utils.limit_period(
                data_dict["gt_boxes"][:, 6], offset=0.5, period=2 * np.pi)
        data_dict.pop("calib", None)
        if "gt_boxes_mask" in data_dict:
            mask = data_dict.pop("gt_boxes_mask")
            data_dict["gt_boxes"] = data_dict["gt_boxes"][mask]
            data_dict["gt_names"] = data_dict["gt_names"][mask]
            if "gt_boxes2d" in data_dict:
                data_dict["gt_boxes2d"] = data_dict["gt_boxes2d"][mask]
        return data_dict


def _bgr_to_hsv(img):
    """cv2.COLOR_BGR2HSV float convention: H in degrees [0,360), S in [0,1],
    V on the input scale."""
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    v = np.maximum(np.maximum(b, g), r)
    mn = np.minimum(np.minimum(b, g), r)
    delta = v - mn
    s = np.where(v > 1e-12, delta / np.maximum(v, 1e-12), 0.0)
    safe = np.maximum(delta, 1e-12)
    h = np.where(v == r, 60.0 * (g - b) / safe,
                 np.where(v == g, 120.0 + 60.0 * (b - r) / safe,
                          240.0 + 60.0 * (r - g) / safe))
    h = np.where(delta <= 1e-12, 0.0, h)
    h = np.where(h < 0, h + 360.0, h)
    return np.stack([h, s, v], axis=-1)


def _hsv_to_bgr(img):
    h, s, v = img[..., 0], np.clip(img[..., 1], 0, 1), img[..., 2]
    h60 = (h % 360.0) / 60.0
    i = np.floor(h60).astype(np.int64) % 6
    f = h60 - np.floor(h60)
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    r = np.choose(i, [v, q, p, p, t, v])
    g = np.choose(i, [t, v, v, q, p, p])
    b = np.choose(i, [p, p, t, v, v, q])
    return np.stack([b, g, r], axis=-1)
