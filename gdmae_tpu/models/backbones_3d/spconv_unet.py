"""UNetV2 sparse 3D encoder-decoder (reference
pcdet/models/backbones_3d/spconv_unet.py — registered in the reference zoo;
unused by shipped GD-MAE configs).

Encoder = the VoxelBackBone8x pyramid; decoder = per-level inverse-conv
feature propagation back to full resolution with lateral skip fusion.  The
spconv inverse convolution (which scatters back onto the stored encoder
indices) is expressed here as a gather from the coarser level: for each
fine-level voxel, pool the features of coarse voxels whose stride-2 conv
footprint covers it — same sparsity pattern as the stored indice pairs.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import sparse_conv3d as sc
from .spconv_backbone import SpConvLayer, VoxelBackBone8x


class SparseInverseConv(nn.Module):
    """Upsample coarse features onto fine voxel coords (inverse of the
    stride-2 sparse conv)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coarse_feats, coarse_coords, coarse_mask, coarse_shape,
                 fine_coords, fine_mask, fine_shape, train=True):
        b, vf, _ = fine_coords.shape
        cin = coarse_feats.shape[-1]
        k = 27
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (k, cin, self.out_channels), jnp.float32).astype(coarse_feats.dtype)

        def one(cf, cc, cm, fc, fm):
            index = sc.build_index(cc, cm, coarse_shape)
            # fine voxel v maps to coarse candidates floor((v + 1 - tap)/2)
            offs = sc._kernel_offsets((3, 3, 3))
            num = fc[:, None, :] + 1 - offs[None, :, :]
            ok = jnp.all(num % 2 == 0, axis=-1)
            cand = num // 2
            inb = jnp.all((cand >= 0) & (cand < jnp.asarray(coarse_shape)), axis=-1)
            q = sc.linearize(cand.reshape(-1, 3), coarse_shape)
            idx = sc.lookup(index, q, (ok & inb & fm[:, None]).reshape(-1))
            safe = jnp.clip(idx, 0)
            g = cf[safe] * (idx >= 0)[:, None].astype(cf.dtype)
            g = g.reshape(vf, k * cin)
            return g @ w.reshape(k * cin, -1)

        y = jax.vmap(one)(coarse_feats, coarse_coords, coarse_mask,
                          fine_coords, fine_mask)
        return y * fine_mask[..., None].astype(y.dtype)


class UNetV2(VoxelBackBone8x):
    """Encoder from VoxelBackBone8x + decoder producing per-voxel features
    at the input resolution (point_features for segmentation-style heads)."""

    @nn.compact
    def __call__(self, batch_dict, train: bool = True):
        batch_dict = super().__call__(batch_dict, train=train)
        ms = batch_dict["multi_scale_3d_features"]
        x4, c4, m4, s4 = ms["x_conv4"]
        x3, c3, m3, s3 = ms["x_conv3"]
        x2, c2, m2, s2 = ms["x_conv2"]
        x1, c1, m1, s1 = ms["x_conv1"]

        def up(name, xc, cc, mc, sc_shape, xf, cf, mf, sf, ch):
            u = SparseInverseConv(ch, dtype=self.dtype, name=f"{name}_inv")(
                xc, cc, mc, sc_shape, cf, mf, sf, train=train)
            y = jnp.concatenate([u, xf], axis=-1)
            y, *_ = SpConvLayer(ch, dtype=self.dtype, name=f"{name}_fuse")(
                y, cf, mf, sf, train=train)
            return y

        d3 = up("up4", x4, c4, m4, s4, x3, c3, m3, s3, 64)
        d2 = up("up3", d3, c3, m3, s3, x2, c2, m2, s2, 32)
        d1 = up("up2", d2, c2, m2, s2, x1, c1, m1, s1, 16)

        batch_dict["point_features"] = d1  # (B, V, 16) at voxel resolution
        batch_dict["point_coords_voxel"] = c1
        batch_dict["point_valid"] = m1
        return batch_dict
