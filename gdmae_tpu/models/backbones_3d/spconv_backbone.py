"""3D sparse-conv backbones (VoxelBackBone8x / VoxelResBackBone8x).

TPU-native counterpart of reference
pcdet/models/backbones_3d/spconv_backbone.py, built on
ops/sparse_conv3d (binary-search neighbor gather + one MXU matmul per
conv) with fixed voxel capacities per pyramid level.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import as_easy
from ...ops import sparse_conv3d as sc
from ..model_utils.blocks import MaskedBatchNorm


class SpConvLayer(nn.Module):
    """One sparse conv (subm or strided) + masked BN + ReLU (reference
    spconv_utils.post_act_block)."""

    out_channels: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (1, 1, 1)
    subm: bool = True
    use_norm: bool = True
    use_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, coords, mask, shape, out=None, train=True):
        """feats (B, V, C); out = (out_coords, out_mask, out_shape) for
        strided convs (precomputed once per stage)."""
        b, v, cin = feats.shape
        k = int(np.prod(self.kernel))
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (k, cin, self.out_channels), jnp.float32).astype(feats.dtype)

        if self.subm:
            y = jax.vmap(lambda f, c, m: sc.subm_conv3d(
                f, c, m, shape, w, self.kernel))(feats, coords, mask)
            oc, om, oshape = coords, mask, shape
        else:
            oc, om, oshape = out
            y = jax.vmap(lambda f, c, m, o_c, o_m: sc.sparse_conv3d(
                f, c, m, shape, w, o_c, o_m, oshape, self.kernel,
                self.stride, self.padding))(feats, coords, mask, oc, om)
        if self.use_norm:
            y = MaskedBatchNorm(dtype=self.dtype)(
                y, mask=om, use_running_average=not train)
        if self.use_relu:
            y = nn.relu(y)
        y = y * om[..., None].astype(y.dtype)
        return y, oc, om, oshape


class SparseBasicBlock(nn.Module):
    """Residual block of two subm convs (reference spconv_utils.py:60-94)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, coords, mask, shape, train=True):
        y, *_ = SpConvLayer(self.channels, dtype=self.dtype, name="conv1")(
            feats, coords, mask, shape, train=train)
        y2, *_ = SpConvLayer(self.channels, use_relu=False, dtype=self.dtype,
                             name="conv2")(y, coords, mask, shape, train=train)
        return nn.relu(feats + y2) * mask[..., None].astype(feats.dtype)


class VoxelBackBone8x(nn.Module):
    """Reference VoxelBackBone8x: 4-stage 8x sparse pyramid + z-compressing
    conv_out; emits a dense (B, Z=2, Ny/8, Nx/8, 128) volume for
    HeightCompression."""

    model_cfg: Any
    input_channels: int
    grid_size: Tuple[int, int, int]  # (nx, ny, nz)
    voxel_size: Tuple[float, ...]
    point_cloud_range: Tuple[float, ...]
    max_pillars: int  # reused as voxel capacity
    dtype: Any = jnp.float32
    residual: bool = False

    @nn.compact
    def __call__(self, batch_dict, train: bool = True):
        coords = batch_dict["voxel_coords"]  # (B, V, 3) [iz, iy, ix]
        feats = batch_dict["voxel_features"].astype(self.dtype)  # (B, V, C)
        mask = batch_dict["voxel_mask"]
        b, v, _ = feats.shape
        nx, ny = int(self.grid_size[0]), int(self.grid_size[1])
        nz = int(self.grid_size[2]) if len(self.grid_size) > 2 else 40
        shape = (nz + 1, ny, nx)  # sparse_shape z+1 (reference :15)

        def stage(x, c, m, s, out_ch, name, stride_pad=(1, 1, 1)):
            caps = c.shape[1]
            oc, om, _, oshape = jax.vmap(
                lambda cc, mm: sc.downsample_coords(
                    cc, mm, s, caps, stride=(2, 2, 2), padding=stride_pad),
                out_axes=(0, 0, 0, None))(c, m)
            y, *_ = SpConvLayer(
                out_ch, stride=(2, 2, 2), padding=stride_pad, subm=False,
                dtype=self.dtype, name=f"{name}_down")(
                x, c, m, s, out=(oc, om, oshape), train=train)
            if self.residual:
                y = SparseBasicBlock(out_ch, dtype=self.dtype, name=f"{name}_res1")(
                    y, oc, om, oshape, train=train)
                y = SparseBasicBlock(out_ch, dtype=self.dtype, name=f"{name}_res2")(
                    y, oc, om, oshape, train=train)
            else:
                y, *_ = SpConvLayer(out_ch, dtype=self.dtype, name=f"{name}_subm1")(
                    y, oc, om, oshape, train=train)
                y, *_ = SpConvLayer(out_ch, dtype=self.dtype, name=f"{name}_subm2")(
                    y, oc, om, oshape, train=train)
            return y, oc, om, oshape

        x, *_ = SpConvLayer(16, dtype=self.dtype, name="conv_input")(
            feats, coords, mask, shape, train=train)
        if self.residual:
            # reference VoxelResBackBone8x conv1 = TWO SparseBasicBlocks
            # (spconv_backbone.py:135-138)
            x1 = SparseBasicBlock(16, dtype=self.dtype, name="conv1_res1")(
                x, coords, mask, shape, train=train)
            x1 = SparseBasicBlock(16, dtype=self.dtype, name="conv1_res2")(
                x1, coords, mask, shape, train=train)
        else:
            x1, *_ = SpConvLayer(16, dtype=self.dtype, name="conv1")(
                x, coords, mask, shape, train=train)
        c1, m1, s1 = coords, mask, shape

        x2, c2, m2, s2 = stage(x1, c1, m1, s1, 32, "conv2")
        x3, c3, m3, s3 = stage(x2, c2, m2, s2, 64, "conv3")
        # the residual variant widens conv4 to 128ch (reference :157 vs :43)
        x4, c4, m4, s4 = stage(x3, c3, m3, s3, 128 if self.residual else 64,
                               "conv4", stride_pad=(0, 1, 1))

        # conv_out: kernel (3,1,1) stride (2,1,1) pad 0 -> z ~ 2
        caps = c4.shape[1]
        oc, om, _, oshape = jax.vmap(
            lambda cc, mm: sc.downsample_coords(
                cc, mm, s4, caps, kernel=(3, 1, 1), stride=(2, 1, 1),
                padding=(0, 0, 0)),
            out_axes=(0, 0, 0, None))(c4, m4)
        xo, *_ = SpConvLayer(
            128, kernel=(3, 1, 1), stride=(2, 1, 1), padding=(0, 0, 0),
            subm=False, dtype=self.dtype, name="conv_out")(
            x4, c4, m4, s4, out=(oc, om, oshape), train=train)

        dense = jax.vmap(lambda f, c, m: sc.to_dense(f, c, m, oshape))(xo, oc, om)
        batch_dict["encoded_voxel_features"] = dense  # (B, Z, Ny', Nx', 128)
        batch_dict["encoded_voxel_stride"] = 8
        batch_dict["multi_scale_3d_features"] = {
            "x_conv1": (x1, c1, m1, s1),
            "x_conv2": (x2, c2, m2, s2),
            "x_conv3": (x3, c3, m3, s3),
            "x_conv4": (x4, c4, m4, s4),
        }
        batch_dict["multi_scale_3d_strides"] = {
            "x_conv1": 1, "x_conv2": 2, "x_conv3": 4, "x_conv4": 8,
        }
        return batch_dict

    @property
    def num_point_features(self):
        return 128


class VoxelResBackBone8x(VoxelBackBone8x):
    """Reference VoxelResBackBone8x — residual variant."""

    residual: bool = True
