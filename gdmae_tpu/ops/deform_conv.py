"""Deformable convolution (v1/v2) as bilinear-gather + matmul.

TPU-native equivalent of the reference ``deform_conv_cuda`` extension
(pcdet/ops/dcn/src/deform_conv_cuda.cpp + kernels; python wrappers
pcdet/ops/dcn/deform_conv.py) used by the DLA image backbone.  The CUDA
im2col-with-offsets becomes a vectorized bilinear interpolation at
``p + p_k + Δp_k`` for every kernel tap, followed by one MXU matmul —
autodiff gives the backward pass for free.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def bilinear_sample(img, y, x):
    """img: (H, W, C); y, x: (...,) float coords.  Zero padding outside."""
    h, w, c = img.shape
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = y - y0
    wx = x - x0

    def tap(yy, xx):
        inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        yi = jnp.clip(yy.astype(jnp.int32), 0, h - 1)
        xi = jnp.clip(xx.astype(jnp.int32), 0, w - 1)
        v = img[yi, xi]
        return v * inb[..., None].astype(img.dtype)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    wy = wy[..., None].astype(img.dtype)
    wx = wx[..., None].astype(img.dtype)
    return ((1 - wy) * (1 - wx) * v00 + (1 - wy) * wx * v01
            + wy * (1 - wx) * v10 + wy * wx * v11)


def modulated_deform_conv2d(x, offset, mask, weight, bias=None, stride=1,
                            padding=1, dilation=1):
    """Modulated deformable conv (DCNv2; v1 when ``mask`` is None).

    Args:
        x: (B, H, W, Cin); offset: (B, Ho, Wo, 2*K) as (dy, dx) pairs in the
            reference's channel order; mask: (B, Ho, Wo, K) sigmoid weights
            or None; weight: (kh, kw, Cin, Cout).
    Returns:
        (B, Ho, Wo, Cout)
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    ho, wo = offset.shape[1:3]

    base_y = jnp.arange(ho) * stride - padding
    base_x = jnp.arange(wo) * stride - padding
    ky, kx = np.meshgrid(np.arange(kh), np.arange(kw), indexing="ij")
    ky = jnp.asarray(ky.reshape(-1) * dilation)  # (K,)
    kx = jnp.asarray(kx.reshape(-1) * dilation)

    off = offset.reshape(b, ho, wo, k, 2)
    y = base_y[None, :, None, None] + ky[None, None, None, :] \
        + off[..., 0]  # (B, Ho, Wo, K)
    xq = base_x[None, None, :, None] + kx[None, None, None, :] + off[..., 1]

    sampled = jax.vmap(bilinear_sample)(x, y, xq)  # (B, Ho, Wo, K, Cin)
    if mask is not None:
        sampled = sampled * mask[..., None].astype(sampled.dtype)
    out = jnp.einsum(
        "bhwkc,kcd->bhwd", sampled, weight.reshape(k, cin, cout),
        preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out
