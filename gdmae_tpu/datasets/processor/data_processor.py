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
