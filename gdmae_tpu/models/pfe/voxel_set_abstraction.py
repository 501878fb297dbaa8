"""Voxel Set Abstraction point-feature encoder (PV-RCNN style).

TPU-native counterpart of reference
pcdet/models/backbones_3d/pfe/voxel_set_abstraction.py +
pcdet/ops/pointnet2/pointnet2_stack (NeighborVoxelSAModuleMSG /
voxel_query): FPS keypoints from the raw cloud, then aggregate (a) raw
points, (b) each sparse-conv pyramid level's voxel features at their voxel
centers, and (c) bilinear BEV features — all with masked ball queries on
padded arrays (the voxel-hash query becomes a dense masked distance test).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import as_easy
from ...ops import pointnet as pn
from ...ops.deform_conv import bilinear_sample
from ..backbones_3d.pointnet2_backbone import SharedMLP


class VoxelSetAbstraction(nn.Module):
    model_cfg: Any
    voxel_size: Tuple[float, ...]
    point_cloud_range: Tuple[float, ...]
    num_bev_features: int = 0
    num_rawpoint_features: int = 4
    dtype: Any = jnp.float32

    def voxel_centers(self, coords, stride):
        """(V, 3) [iz, iy, ix] voxel coords -> xyz centers at a stride."""
        vs = jnp.asarray(self.voxel_size) * stride
        pc = jnp.asarray(self.point_cloud_range)
        x = (coords[:, 2].astype(jnp.float32) + 0.5) * vs[0] + pc[0]
        y = (coords[:, 1].astype(jnp.float32) + 0.5) * vs[1] + pc[1]
        z = (coords[:, 0].astype(jnp.float32) + 0.5) * vs[2] + pc[2]
        return jnp.stack([x, y, z], axis=-1)

    @nn.compact
    def __call__(self, batch_dict, train: bool = True):
        cfg = as_easy(self.model_cfg)
        points = batch_dict["points"]  # (B, N, C)
        point_mask = batch_dict["point_mask"]
        b = points.shape[0]
        nkp = int(cfg.NUM_KEYPOINTS)

        # keypoints: FPS over the raw cloud (reference get_sampled_points)
        kp_idx = jax.vmap(lambda p, m: pn.masked_fps(p[:, :3], m, nkp))(
            points, point_mask)
        keypoints = jnp.take_along_axis(
            points[..., :3], kp_idx[..., None], axis=1)  # (B, K, 3)
        kp_valid = jnp.take_along_axis(point_mask, kp_idx, axis=1)

        feats_list = []
        src_names = list(cfg.FEATURES_SOURCE)

        if "bev" in src_names and "spatial_features" in batch_dict:
            bev = batch_dict["spatial_features"]  # (B, Ny, Nx, C)
            stride = batch_dict.get("spatial_features_stride", 1)
            pc = jnp.asarray(self.point_cloud_range)
            vs = jnp.asarray(self.voxel_size)
            xs = (keypoints[..., 0] - pc[0]) / (vs[0] * stride)
            ys = (keypoints[..., 1] - pc[1]) / (vs[1] * stride)
            bev_feats = jax.vmap(bilinear_sample)(bev, ys, xs)
            feats_list.append(bev_feats)

        if "raw_points" in src_names:
            raw_cfg = cfg.SA_LAYER["raw_points"]
            feats_list.append(self._sa_group(
                "raw_points", raw_cfg, points[..., :3], points[..., 3:],
                point_mask, keypoints, kp_valid, train))

        for src in src_names:
            if src in ("bev", "raw_points"):
                continue
            feats, coords, mask, _ = batch_dict["multi_scale_3d_features"][src]
            stride = batch_dict["multi_scale_3d_strides"][src]
            centers = jax.vmap(lambda c: self.voxel_centers(c, stride))(coords)
            feats_list.append(self._sa_group(
                src, cfg.SA_LAYER[src], centers, feats, mask, keypoints,
                kp_valid, train))

        point_features = jnp.concatenate(feats_list, axis=-1)
        out_ch = int(cfg.NUM_OUTPUT_FEATURES)
        fused = nn.Dense(out_ch, use_bias=False, dtype=self.dtype,
                         name="vsa_point_feature_fusion")(point_features)
        from ..model_utils.blocks import MaskedBatchNorm

        fused = MaskedBatchNorm(dtype=self.dtype, name="fusion_bn")(
            fused, mask=kp_valid, use_running_average=not train)
        fused = nn.relu(fused)

        batch_dict["point_features_before_fusion"] = point_features
        batch_dict["point_features"] = fused
        batch_dict["point_coords"] = keypoints
        batch_dict["point_valid"] = kp_valid
        return batch_dict

    def _sa_group(self, name, layer_cfg, xyz, feats, valid, new_xyz,
                  new_valid, train):
        outs = []
        for gi, (radius, nsample, mlp) in enumerate(zip(
                layer_cfg.POOL_RADIUS, layer_cfg.NSAMPLE, layer_cfg.MLPS)):
            idx, cnt = jax.vmap(lambda x, v, q, qv: pn.ball_query(
                float(radius), int(nsample), x, v, q, qv))(
                xyz, valid, new_xyz, new_valid)
            grouped_xyz = jnp.take_along_axis(
                xyz[:, :, None, :], idx[..., None].repeat(3, axis=-1), axis=1)
            grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]
            parts = [grouped_xyz]
            if feats is not None and feats.shape[-1] > 0:
                grouped_f = jnp.take_along_axis(
                    feats[:, :, None, :],
                    idx[..., None].repeat(feats.shape[-1], axis=-1), axis=1)
                parts.append(grouped_f)
            g = jnp.concatenate(parts, axis=-1)
            tok_mask = (cnt > 0)[..., None] & jnp.ones_like(idx, bool)
            g = SharedMLP(tuple(int(c) for c in mlp), dtype=self.dtype,
                          name=f"{name}_mlp_{gi}")(g, mask=tok_mask, train=train)
            g = g * (cnt > 0)[..., None, None].astype(g.dtype)
            outs.append(jnp.max(g, axis=2))
        return jnp.concatenate(outs, axis=-1)
