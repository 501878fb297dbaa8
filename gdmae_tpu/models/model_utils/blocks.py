"""Shared flax building blocks: masked batch-norm, conv/linear stacks.

The reference applies BatchNorm1d to sparse voxel-feature lists and
BatchNorm2d to dense maps (e.g. pcdet/utils/spconv_utils.py post_act_block,
pcdet/models/model_utils/network_utils.py make_fc_layers).  On the TPU side
sparse token lists live on padded arrays / dense canvases with validity
masks, so batch statistics must be computed over *valid* elements only —
``MaskedBatchNorm`` does exactly that, with an optional named-axis reduction
for cross-device SyncBN (reference tools/train.py:120 SYNC_BN).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Matches the reference's BN hyperparams (spt_backbone.py:204
# ``BatchNorm1d(eps=1e-3, momentum=0.01)``; torch momentum 0.01 ==
# running = 0.99 * running + 0.01 * batch).
BN_EPS = 1e-3
BN_MOM = 0.01


class MaskedBatchNorm(nn.Module):
    """Batch normalization over valid elements of a masked array.

    Works for any layout: ``x`` is (..., C) and ``mask`` broadcasts against
    x[..., 0].  Statistics reduce over every axis but the channel axis,
    weighted by the mask.  Running stats live in the ``batch_stats``
    collection like flax's own BatchNorm.
    """

    use_running_average: Optional[bool] = None
    axis_name: Optional[str] = None  # set for SyncBN across a mesh axis
    eps: float = BN_EPS
    momentum: float = BN_MOM
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: Optional[bool] = None,
                 count: Optional[float] = None):
        """``count``: optional explicit element count for the statistics
        divisor (per channel).  Use when ``x`` is a compact row list whose
        omitted rows are exact zeros of a larger conceptual array (e.g. a
        token list standing in for a dense canvas): sums over ``x`` equal
        sums over the full array, only the divisor differs."""
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(c, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            red = tuple(range(x.ndim - 1))
            if mask is None and count is not None:
                cnt = jnp.asarray(count, jnp.float32)
                s1 = jnp.sum(xf, axis=red)
                s2 = jnp.sum(jnp.square(xf), axis=red)
                if self.axis_name is not None:
                    cnt = jax.lax.psum(cnt, self.axis_name)
                    s1 = jax.lax.psum(s1, self.axis_name)
                    s2 = jax.lax.psum(s2, self.axis_name)
                cnt = jnp.maximum(cnt, 1.0)
                mean = s1 / cnt
                var = jnp.maximum(s2 / cnt - jnp.square(mean), 0.0)
            elif mask is None:
                mean = jnp.mean(xf, axis=red)
                var = jnp.mean(jnp.square(xf), axis=red) - jnp.square(mean)
                if self.axis_name is not None:
                    mean = jax.lax.pmean(mean, self.axis_name)
                    var = jax.lax.pmean(
                        jnp.mean(jnp.square(xf), axis=red), self.axis_name
                    ) - jnp.square(mean)
            else:
                m = mask.astype(jnp.float32)[..., None]
                cnt = jnp.sum(m)
                s1 = jnp.sum(xf * m, axis=red)
                s2 = jnp.sum(jnp.square(xf) * m, axis=red)
                if self.axis_name is not None:
                    cnt = jax.lax.psum(cnt, self.axis_name)
                    s1 = jax.lax.psum(s1, self.axis_name)
                    s2 = jax.lax.psum(s2, self.axis_name)
                cnt = jnp.maximum(cnt, 1.0)
                mean = s1 / cnt
                var = jnp.maximum(s2 / cnt - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                # torch uses the unbiased variance for the running estimate
                if mask is None and count is None:
                    n = 1.0
                    for a in red:
                        n = n * x.shape[a]
                    unbiased = var * n / jnp.maximum(n - 1, 1.0)
                else:
                    unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype)


def kaiming_conv_init():
    # torch Conv2d default: kaiming_uniform(a=sqrt(5)) == uniform variance
    # scaling; flax variance_scaling approximates it well enough
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class ConvBNReLU(nn.Module):
    """Conv2d(bias=False) + masked BN + ReLU on an NHWC canvas.

    ``occ_out`` (the occupancy of the *output* grid) masks both the BN
    statistics and the activations, reproducing sparse-conv semantics on a
    dense canvas (submanifold: occ_out == occ_in; strided sparse conv:
    occ_out == dilated occupancy; reference spconv_utils.post_act_block).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    transpose: bool = False
    use_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, occ_out=None, train: bool = True):
        kern = (self.kernel, self.kernel)
        if self.transpose:
            y = nn.ConvTranspose(
                self.features, kern, strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, kernel_init=kaiming_conv_init(),
            )(x)
        else:
            # torch-style symmetric padding (reference spconv post_act_block
            # uses padding=k//2): identical to SAME at stride 1, but SAME
            # pads (0, 1) for stride-2 on even sizes — one-cell misaligned
            # vs the reference's (1, 1)
            p = self.dilation * (self.kernel // 2)
            y = nn.Conv(
                self.features, kern, strides=(self.stride, self.stride),
                kernel_dilation=(self.dilation, self.dilation),
                padding=((p, p), (p, p)), use_bias=False, dtype=self.dtype,
                kernel_init=kaiming_conv_init(),
            )(x)
        y = MaskedBatchNorm(dtype=self.dtype)(y, mask=occ_out, use_running_average=not train)
        if self.use_relu:
            y = nn.relu(y)
        if occ_out is not None:
            y = y * occ_out.astype(y.dtype)[..., None]
        return y


class LinearBNReLU(nn.Module):
    """FC(bias=False) + masked BN + ReLU over token lists (reference
    network_utils.make_fc_layers, pcdet/models/model_utils/network_utils.py).

    ``bn_eps``/``bn_momentum`` default to the (1e-3, 0.01) most reference
    modules pass as ``norm_fn``; call sites mirroring a reference
    ``make_fc_layers`` WITHOUT norm_fn must pass torch's BatchNorm1d
    defaults (1e-5, 0.1) — e.g. DynVFE's aggregation MLP
    (reference dyn_vfe.py:40 vs network_utils.py:13)."""

    features: int
    use_norm: bool = True
    use_relu: bool = True
    bn_eps: float = BN_EPS
    bn_momentum: float = BN_MOM
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        y = nn.Dense(self.features, use_bias=not self.use_norm, dtype=self.dtype,
                     kernel_init=kaiming_conv_init())(x)
        if self.use_norm:
            y = MaskedBatchNorm(
                eps=self.bn_eps, momentum=self.bn_momentum, dtype=self.dtype
            )(y, mask=mask, use_running_average=not train)
        if self.use_relu:
            y = nn.relu(y)
        if mask is not None:
            y = y * mask.astype(y.dtype)[..., None]
        return y


class MLP(nn.Module):
    """Stack of LinearBNReLU layers."""

    channels: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        for c in self.channels:
            x = LinearBNReLU(c, dtype=self.dtype)(x, mask=mask, train=train)
        return x


class TokenConvBNReLU(nn.Module):
    """Gather-based sparse Conv2d(bias=False) + masked BN + ReLU over a
    compact token list (ops.token_conv.gather_conv2d).

    Numerically equivalent to :class:`ConvBNReLU` on the scattered canvas
    (XLA SAME padding, zeros at inactive cells), but FLOPs and HBM traffic
    scale with the number of ACTIVE sites instead of the grid area — the
    TPU analogue of spconv's submanifold/strided sparse conv
    (reference pcdet/utils/spconv_utils.py post_act_block).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    use_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, cell2tok_in, grid_in_hw, coords_out, mask_out,
                 coords_in=None, mask_in=None, train: bool = True):
        from ...ops.token_conv import gather_conv2d

        cin = tokens.shape[-1]
        w = self.param(
            "kernel", kaiming_conv_init(),
            (self.kernel, self.kernel, cin, self.features), jnp.float32)
        y = gather_conv2d(
            tokens, cell2tok_in, grid_in_hw, coords_out, mask_out,
            w.astype(self.dtype), stride=self.stride,
            coords_in=coords_in, mask_in=mask_in)
        y = MaskedBatchNorm(dtype=self.dtype)(
            y, mask=mask_out, use_running_average=not train)
        if self.use_relu:
            y = nn.relu(y)
        return y * mask_out[..., None].astype(y.dtype)


def dilate_occupancy(occ, kernel: int = 3, stride: int = 1):
    """Occupancy of a strided sparse-conv output: any input voxel under the
    kernel footprint activates the output site (spconv SparseConv2d
    semantics).  occ: (B, H, W) bool."""
    p = kernel // 2
    y = nn.max_pool(
        occ[..., None].astype(jnp.float32),
        window_shape=(kernel, kernel),
        strides=(stride, stride),
        padding=((p, p), (p, p)),  # torch padding=k//2 (see ConvBNReLU)
    )[..., 0]
    return y > 0.5
