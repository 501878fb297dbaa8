"""Hard-voxel VFEs: classic PointPillars PFN and mean-VFE.

TPU-native counterparts of reference
pcdet/models/backbones_3d/vfe/{pillar_vfe,mean_vfe}.py, operating on padded
(B, V, P, C) voxel tensors from the host hard-voxelizer
(datasets/processor/data_processor.numpy_hard_voxelize).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...config import as_easy
from ..model_utils.blocks import MaskedBatchNorm


class PillarVFE(nn.Module):
    """Reference pillar_vfe.py — per-point features + PFN max-pool."""

    model_cfg: Any
    num_point_features: int
    point_cloud_range: Tuple[float, ...]
    voxel_size: Tuple[float, ...]
    grid_size: Tuple[int, int]
    max_pillars: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_dict, train: bool = True):
        cfg = as_easy(self.model_cfg)
        voxels = batch_dict["voxels"]  # (B, V, P, C)
        num_points = batch_dict["voxel_num_points"]  # (B, V)
        coords = batch_dict["voxel_coords"]  # (B, V, 3) [iz, iy, ix]
        voxel_mask = batch_dict["voxel_mask"]  # (B, V)
        b, v, p, c = voxels.shape

        pt_mask = (jnp.arange(p)[None, None, :] < num_points[..., None]) \
            & voxel_mask[..., None]
        cnt = jnp.maximum(num_points, 1).astype(voxels.dtype)[..., None, None]
        mean_xyz = jnp.sum(voxels[..., :3] * pt_mask[..., None], axis=2,
                           keepdims=True) / cnt
        f_cluster = voxels[..., :3] - mean_xyz

        pc = jnp.asarray(self.point_cloud_range, voxels.dtype)
        vs = jnp.asarray(self.voxel_size, voxels.dtype)
        cxyz = jnp.stack([
            (coords[..., 2].astype(voxels.dtype) + 0.5) * vs[0] + pc[0],
            (coords[..., 1].astype(voxels.dtype) + 0.5) * vs[1] + pc[1],
            (coords[..., 0].astype(voxels.dtype) + 0.5) * vs[2] + pc[2],
        ], axis=-1)[:, :, None, :]
        f_center = voxels[..., :3] - cxyz

        feats = [voxels, f_cluster, f_center]
        if cfg.get("WITH_DISTANCE", False):
            feats.append(jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        x = x * pt_mask[..., None].astype(x.dtype)
        x = x.astype(self.dtype)

        filters = [int(f) for f in cfg.NUM_FILTERS]
        for i, nf in enumerate(filters):
            x = nn.Dense(nf, use_bias=False, dtype=self.dtype, name=f"pfn_{i}")(x)
            x = MaskedBatchNorm(dtype=self.dtype, name=f"pfn_bn_{i}")(
                x, mask=pt_mask, use_running_average=not train)
            x = nn.relu(x)
            x_max = jnp.max(
                jnp.where(pt_mask[..., None], x, -jnp.inf), axis=2)
            x_max = jnp.where(voxel_mask[..., None], x_max, 0.0)
            if i < len(filters) - 1:
                x = jnp.concatenate(
                    [x, jnp.broadcast_to(x_max[:, :, None], x.shape)], axis=-1)
        batch_dict["pillar_features"] = x_max
        batch_dict["voxel_features"] = x_max
        batch_dict["pillar_coords"] = coords[..., 1:3].astype(jnp.int32)  # (iy, ix)
        batch_dict["pillar_mask"] = voxel_mask
        return batch_dict

    @property
    def output_feature_dim(self):
        return int(as_easy(self.model_cfg).NUM_FILTERS[-1])


class MeanVFE(nn.Module):
    """Reference mean_vfe.py — mean of points per voxel."""

    model_cfg: Any
    num_point_features: int
    point_cloud_range: Tuple[float, ...]
    voxel_size: Tuple[float, ...]
    grid_size: Tuple[int, int]
    max_pillars: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_dict, train: bool = True):
        voxels = batch_dict["voxels"]
        num_points = batch_dict["voxel_num_points"]
        p = voxels.shape[2]
        pt_mask = jnp.arange(p)[None, None, :] < num_points[..., None]
        cnt = jnp.maximum(num_points, 1).astype(voxels.dtype)[..., None]
        mean = jnp.sum(voxels * pt_mask[..., None], axis=2) / cnt
        batch_dict["voxel_features"] = mean.astype(self.dtype)
        batch_dict["pillar_features"] = batch_dict["voxel_features"]
        return batch_dict

    @property
    def output_feature_dim(self):
        return self.num_point_features
