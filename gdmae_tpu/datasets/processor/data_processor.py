"""Host-side data processor queue (reference
pcdet/datasets/processor/data_processor.py).

The spconv/cumm CPU voxelizer is replaced by a pure-numpy hard voxelizer
(sort-based, deterministic first-come point order like the reference's
VoxelGeneratorV2).  ``calculate_grid_size`` is the dynamic-voxelization path
used by every GD-MAE config — it only fixes grid geometry; pillarization
itself happens on-device (ops/scatter.dynamic_pillarize).
"""
from __future__ import annotations

from functools import partial

import numpy as np

from ...utils import box_utils, common_utils


def numpy_hard_voxelize(points, voxel_size, pc_range, max_points_per_voxel,
                        max_voxels):
    """Hard voxelization: first-come points per voxel, capped counts.

    Returns voxels (V, P, C), coords (V, 3) [iz, iy, ix], num_points (V,).
    Deterministic given point order (like the reference generator).
    """
    vs = np.asarray(voxel_size, np.float64)
    pr = np.asarray(pc_range, np.float64)
    grid = np.round((pr[3:6] - pr[0:3]) / vs).astype(np.int64)  # (nx, ny, nz)

    idx3 = np.floor((points[:, :3] - pr[:3]) / vs).astype(np.int64)
    in_range = np.all((idx3 >= 0) & (idx3 < grid), axis=1)
    pts = points[in_range]
    idx3 = idx3[in_range]
    lin = (idx3[:, 2] * grid[1] + idx3[:, 1]) * grid[0] + idx3[:, 0]

    # stable sort keeps first-come order inside each voxel
    order = np.argsort(lin, kind="stable")
    lin_s = lin[order]
    uniq, starts, counts = np.unique(lin_s, return_index=True, return_counts=True)
    # first-come voxel ordering: order voxels by first point appearance
    first_seen = order[starts]
    voxel_order = np.argsort(first_seen, kind="stable")
    uniq, starts, counts = uniq[voxel_order], starts[voxel_order], counts[voxel_order]
    if len(uniq) > max_voxels:
        uniq, starts, counts = uniq[:max_voxels], starts[:max_voxels], counts[:max_voxels]

    v = len(uniq)
    c = points.shape[1]
    voxels = np.zeros((v, max_points_per_voxel, c), points.dtype)
    num_points = np.minimum(counts, max_points_per_voxel).astype(np.int32)
    for i in range(v):
        sel = order[starts[i]:starts[i] + num_points[i]]
        voxels[i, :num_points[i]] = pts[sel]
    ix = uniq % grid[0]
    iy = (uniq // grid[0]) % grid[1]
    iz = uniq // (grid[0] * grid[1])
    coords = np.stack([iz, iy, ix], axis=1).astype(np.int32)
    return voxels, coords, num_points


class DataProcessor:
    def __init__(self, processor_configs, point_cloud_range, training, num_point_features):
        self.point_cloud_range = np.asarray(point_cloud_range, np.float32)
        self.training = training
        self.num_point_features = num_point_features
        self.mode = "train" if training else "test"
        self.grid_size = None
        self.voxel_size = None
        self.data_processor_queue = []
        for cur_cfg in processor_configs:
            self.data_processor_queue.append(getattr(self, cur_cfg.NAME)(config=cur_cfg))

    def mask_points_and_boxes_outside_range(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.mask_points_and_boxes_outside_range, config=config)
        if data_dict.get("points", None) is not None:
            mask = common_utils.mask_points_by_range(
                data_dict["points"], self.point_cloud_range)
            data_dict["points"] = data_dict["points"][mask]
        if data_dict.get("gt_boxes", None) is not None and \
                config.REMOVE_OUTSIDE_BOXES and self.training:
            mask = box_utils.mask_boxes_outside_range_numpy(
                data_dict["gt_boxes"], self.point_cloud_range,
                min_num_corners=config.get("min_num_corners", 1))
            data_dict["gt_boxes"] = data_dict["gt_boxes"][mask]
        return data_dict

    def shuffle_points(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.shuffle_points, config=config)
        if config.SHUFFLE_ENABLED[self.mode]:
            pts = data_dict["points"]
            data_dict["points"] = pts[np.random.permutation(len(pts))]
        return data_dict

    def calculate_grid_size(self, data_dict=None, config=None):
        if data_dict is None:
            grid = (self.point_cloud_range[3:6] - self.point_cloud_range[0:3]) \
                / np.array(config.VOXEL_SIZE)
            self.grid_size = np.round(grid).astype(np.int64)
            self.voxel_size = config.VOXEL_SIZE
            return partial(self.calculate_grid_size, config=config)
        return data_dict

    def transform_points_to_voxels(self, data_dict=None, config=None):
        if data_dict is None:
            grid = (self.point_cloud_range[3:6] - self.point_cloud_range[0:3]) \
                / np.array(config.VOXEL_SIZE)
            self.grid_size = np.round(grid).astype(np.int64)
            self.voxel_size = config.VOXEL_SIZE
            return partial(self.transform_points_to_voxels, config=config)

        voxels, coords, num_points = numpy_hard_voxelize(
            data_dict["points"], config.VOXEL_SIZE, self.point_cloud_range,
            config.MAX_POINTS_PER_VOXEL, config.MAX_NUMBER_OF_VOXELS[self.mode])
        if not data_dict.get("use_lead_xyz", True):
            voxels = voxels[..., 3:]
        data_dict["voxels"] = voxels
        data_dict["voxel_coords"] = coords
        data_dict["voxel_num_points"] = num_points
        return data_dict

    def sample_points(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.sample_points, config=config)
        num_points = config.NUM_POINTS[self.mode]
        if num_points == -1:
            return data_dict
        points = data_dict["points"]
        if num_points < len(points):
            depth = np.linalg.norm(points[:, 0:3], axis=1)
            near = np.where(depth < 40.0)[0]
            far = np.where(depth >= 40.0)[0]
            if num_points > len(far):
                near_choice = np.random.choice(near, num_points - len(far), replace=False)
                choice = np.concatenate([near_choice, far]) if len(far) else near_choice
            else:
                choice = np.random.choice(len(points), num_points, replace=False)
            np.random.shuffle(choice)
        else:
            choice = np.arange(len(points), dtype=np.int32)
            if num_points > len(points):
                extra = np.random.choice(choice, num_points - len(points))
                choice = np.concatenate([choice, extra])
            np.random.shuffle(choice)
        data_dict["points"] = points[choice]
        return data_dict

    def forward(self, data_dict):
        for proc in self.data_processor_queue:
            data_dict = proc(data_dict=data_dict)
        return data_dict

    # -- image branch ops (reference data_processor.py:174-266) ----------- #
    def imrescale(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.imrescale, config=config)
        img = data_dict["image"]
        h, w = img.shape[:2]
        img_scales = config.IMAGE_SCALES[self.mode]
        if len(img_scales) > 1:
            longs = [max(s) for s in img_scales]
            shorts = [min(s) for s in img_scales]
            size = [np.random.randint(min(longs), max(longs) + 1),
                    np.random.randint(min(shorts), max(shorts) + 1)]
        else:
            size = img_scales[0]
        if config.get("KEEP_RATIO", True):
            sf = min(max(size) / max(h, w), min(size) / min(h, w))
            new_size = (int(w * sf + 0.5), int(h * sf + 0.5))
        else:
            new_size = size
        img = _resize_bilinear(img, new_size[1], new_size[0])
        w_scale, h_scale = new_size[0] / w, new_size[1] / h
        data_dict["image"] = img
        data_dict["image_rescale_shape"] = img.shape[:2]
        data_dict.setdefault("transformation_2d_list", []).append("imrescale")
        data_dict.setdefault("transformation_2d_params", {})["imrescale"] = (
            w_scale, h_scale)
        if data_dict.get("gt_boxes2d", None) is not None:
            g = data_dict["gt_boxes2d"]
            g[:, :4] *= np.array([w_scale, h_scale, w_scale, h_scale], np.float32)
            g[:, [0, 2]] = np.clip(g[:, [0, 2]], 0, img.shape[1] - 1)
            g[:, [1, 3]] = np.clip(g[:, [1, 3]], 0, img.shape[0] - 1)
        return data_dict

    def imflip(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.imflip, config=config)
        if np.random.rand() < config.FLIP_RATIO[self.mode]:
            img = np.flip(data_dict["image"], axis=1)
            data_dict["image"] = img
            data_dict.setdefault("transformation_2d_list", []).append("imflip")
            data_dict.setdefault("transformation_2d_params", {})["imflip"] = (
                True, img.shape[1])
            if data_dict.get("gt_boxes2d", None) is not None:
                g = data_dict["gt_boxes2d"]
                wdt = img.shape[1]
                flipped = g.copy()
                flipped[..., 0] = wdt - 1 - g[..., 2]
                flipped[..., 2] = wdt - 1 - g[..., 0]
                data_dict["gt_boxes2d"] = flipped
        return data_dict

    def imnormalize(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.imnormalize, config=config)
        img = data_dict["image"].astype(np.float32)
        if config.get("TO_RGB", False):
            img = img[..., ::-1].copy()
        mean = np.asarray(config.MEAN, np.float32).reshape(1, 1, -1)
        std = np.asarray(config.STD, np.float32).reshape(1, 1, -1)
        data_dict["image"] = (img - mean) / std
        return data_dict

    def impad(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.impad, config=config)
        img = data_dict["image"]
        div = int(config.SIZE_DIVISOR)
        ph = -(-img.shape[0] // div) * div
        pw = -(-img.shape[1] // div) * div
        out = np.zeros((ph, pw, *img.shape[2:]), img.dtype)
        out[:img.shape[0], :img.shape[1]] = img
        data_dict["image"] = out
        data_dict["image_pad_shape"] = out.shape[:2]
        return data_dict


def _resize_bilinear(img, out_h, out_w):
    """cv2-free bilinear resize (torch CPU interpolate under the hood)."""
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(np.ascontiguousarray(img, np.float32))
    if t.ndim == 2:
        t = t[None, None]
        squeeze = 2
    else:
        t = t.permute(2, 0, 1)[None]
        squeeze = 1
    out = F.interpolate(t, size=(out_h, out_w), mode="bilinear",
                        align_corners=False)
    if squeeze == 2:
        return out[0, 0].numpy()
    return out[0].permute(1, 2, 0).numpy()
