"""Gather-based sparse 2D convolution over compact token lists.

TPU-native equivalent of spconv's 2D submanifold / strided sparse conv
(reference pcdet/utils/spconv_utils.py post_act_block, consumed by
pcdet/models/backbones_3d/spt_backbone.py:206,217).  Instead of materializing
a dense (B, Ny, Nx, C) canvas and convolving it (which costs
O(Ny*Nx*C^2*k^2) FLOPs and full-canvas HBM traffic regardless of sparsity),
each output site gathers its k*k input taps from a compact (B, M, C) token
list through the int32 cell->token index and reduces them with one big
matmul — O(M*k^2*C^2) FLOPs, proportional to the number of ACTIVE sites.

All indexing is per-sample ``take_along_axis`` (no cross-batch indices), so
a data-parallel mesh shards it with zero collectives.

Padding follows the torch convention (symmetric pad = kernel//2, like the
reference's spconv post_act_block padding=1) so results are bit-identical to
:class:`models.model_utils.blocks.ConvBNReLU` on the equivalently scattered
canvas; missing neighbors contribute zeros, exactly like sparse conv.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def same_pad_lo(in_dim: int, kernel: int, stride: int) -> int:
    """Low-side padding: torch symmetric kernel//2 (see module docstring).
    XLA SAME pads (0, 1) for stride-2/kernel-3 on even sizes — one cell
    misaligned vs the reference."""
    del in_dim, stride
    return kernel // 2


def gather_conv_taps(
    tokens: jnp.ndarray,
    cell2tok_in: jnp.ndarray,
    grid_in_hw: Tuple[int, int],
    coords_out: jnp.ndarray,
    mask_out: jnp.ndarray,
    kernel: int = 3,
    stride: int = 1,
) -> jnp.ndarray:
    """Gather the k*k input taps of every output site.

    Args:
        tokens: (B, M_in, C) input token features.
        cell2tok_in: (B, Ny*Nx) int32 flat input cell -> per-sample token
            row, or ``M_in`` when empty (ops.window.build_cell2tok).
        grid_in_hw: (Ny, Nx) static input grid.
        coords_out: (B, M_out, 2) int32 output cell coords on the strided
            output grid.
        mask_out: (B, M_out) bool.
        kernel, stride: static conv geometry.
    Returns:
        (B, M_out, kernel*kernel, C); zeros where a tap has no input token.
    """
    b, m_in, c = tokens.shape
    ny, nx = grid_in_hw
    pl_y = same_pad_lo(ny, kernel, stride)
    pl_x = same_pad_lo(nx, kernel, stride)

    rows = jnp.concatenate(
        [tokens, jnp.zeros((b, 1, c), tokens.dtype)], axis=1)
    c2t = jnp.concatenate(
        [cell2tok_in, jnp.full((b, 1), m_in, jnp.int32)], axis=1)

    taps = []
    for ty in range(kernel):
        for tx in range(kernel):
            iy = coords_out[..., 0] * stride + ty - pl_y
            ix = coords_out[..., 1] * stride + tx - pl_x
            inb = (iy >= 0) & (iy < ny) & (ix >= 0) & (ix < nx) & mask_out
            cell = jnp.where(inb, iy * nx + ix, ny * nx)
            row = jnp.take_along_axis(c2t, cell, axis=1)  # (B, M_out)
            taps.append(jnp.take_along_axis(rows, row[..., None], axis=1))
    return jnp.stack(taps, axis=-2)


def _conv_impl(tokens, cell2tok_in, grid_in_hw, coords_out, mask_out,
               weight, stride):
    """Matmul-THEN-gather form: y = sum_t gather_t(tokens @ W_t).

    The im2col form (gather k*k taps, one (M_out, k*k*Cin) matmul) writes a
    (B, M_out, k*k, C) tap stack to HBM and reads it back — measured ~73 ms
    of a 313 ms MAE step across the 5 token convs at batch 16.  Running the
    k*k per-tap matmuls on the COMPACT input first and then gathering the
    (B, M_in+1, Cout) results into an f32 accumulator keeps every
    intermediate Cout-row-wide, never materializes the tap stack, and for
    strided convs also shifts the matmul to the smaller input site list."""
    k = weight.shape[0]
    b, m_in, cin = tokens.shape
    m_out = coords_out.shape[1]
    cout = weight.shape[-1]
    ny, nx = grid_in_hw
    pl_y = same_pad_lo(ny, k, stride)
    pl_x = same_pad_lo(nx, k, stride)
    c2t = jnp.concatenate(
        [cell2tok_in, jnp.full((b, 1), m_in, jnp.int32)], axis=1)

    # ONE (Cin, k*k*Cout) matmul for all taps (kernel count matters as much
    # as FLOPs here), then k*k channel-slice gathers + f32 accumulate
    w_all = jnp.moveaxis(weight, (0, 1), (1, 2)).reshape(
        cin, k * k * cout).astype(tokens.dtype)
    tw = jax.lax.dot_general(
        tokens, w_all, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(tokens.dtype)
    tw = jnp.concatenate(
        [tw, jnp.zeros((b, 1, k * k * cout), tw.dtype)], axis=1)
    rows = []
    for ty in range(k):
        for tx in range(k):
            iy = coords_out[..., 0] * stride + ty - pl_y
            ix = coords_out[..., 1] * stride + tx - pl_x
            inb = (iy >= 0) & (iy < ny) & (ix >= 0) & (ix < nx) & mask_out
            cell = jnp.where(inb, iy * nx + ix, ny * nx)
            rows.append(jnp.take_along_axis(c2t, cell, axis=1))  # (B, M_out)
    import os
    if os.environ.get("GDMAE_TOKCONV_ONEGATHER"):
        # A/B variant: ONE combined gather over a (B, (M_in+1)*k*k, Cout)
        # view (row r's tap-t slice at flat r*k*k + t) + one tap reduction.
        # Measured 45.5 vs 50.0 scans/s on the MAE bench — the (B,
        # M_out*k*k, Cout) gather result materializes in HBM, losing to
        # the in-place f32 accumulator chain below.
        idx = jnp.stack(
            [r * (k * k) + t for t, r in enumerate(rows)], axis=-1
        ).reshape(b, m_out * k * k)
        tw_flat = tw.reshape(b, (m_in + 1) * k * k, cout)
        taps = jnp.take_along_axis(tw_flat, idx[..., None], axis=1)
        y = taps.reshape(b, m_out, k * k, cout).astype(jnp.float32).sum(
            axis=2).astype(tokens.dtype)
        return y * mask_out[..., None].astype(y.dtype)
    acc = jnp.zeros((b, m_out, cout), jnp.float32)
    for t, row in enumerate(rows):
        acc = acc + jnp.take_along_axis(
            tw[:, :, t * cout:(t + 1) * cout], row[..., None], axis=1)
    y = acc.astype(tokens.dtype)
    return y * mask_out[..., None].astype(y.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 8))
def _gather_conv2d_p(tokens, cell2tok_in, coords_in, grid_in_hw, mask_in,
                     coords_out, mask_out, weight, stride):
    return _conv_impl(
        tokens, cell2tok_in, grid_in_hw, coords_out, mask_out, weight, stride)


def _gc_fwd(tokens, cell2tok_in, coords_in, grid_in_hw, mask_in,
            coords_out, mask_out, weight, stride):
    y = _conv_impl(
        tokens, cell2tok_in, grid_in_hw, coords_out, mask_out, weight, stride)
    return y, (tokens, cell2tok_in, coords_in, mask_in, coords_out,
               mask_out, weight)


def _gc_bwd(grid_in_hw, stride, res, g):
    """Both cotangents are pure gathers: the transpose of a sparse conv is
    a sparse conv with mirrored taps (each input token feeds at most one
    output site per tap), so no scatter-adds appear in the backward pass
    (JAX's auto-transpose of take_along_axis is a serializing scatter)."""
    tokens, cell2tok_in, coords_in, mask_in, coords_out, mask_out, weight = res
    k = weight.shape[0]
    b, m_in, cin = tokens.shape
    m_out = coords_out.shape[1]
    cout = weight.shape[-1]
    ny, nx = grid_in_hw
    out_y = -(-ny // stride)
    out_x = -(-nx // stride)
    pl_y = same_pad_lo(ny, k, stride)
    pl_x = same_pad_lo(nx, k, stride)

    g = g * mask_out[..., None].astype(g.dtype)

    # MIRRORED per-tap gathers of g onto the input sites: each input token
    # feeds at most one output site per tap, so mg_t[i] = sum over output
    # sites whose tap (ty, tx) reads input i — which serves BOTH cotangents
    # with no scatter-add and no (B, M, k*k, C) tap stack:
    #   d tokens[i] = sum_t mg_t[i] @ W_t^T
    #   d W_t       = (tokens * mask_in)^T @ mg_t
    from gdmae_tpu.ops import window as window_ops

    c2t_out = window_ops.build_cell2tok(
        coords_out, mask_out, (out_y, out_x))
    g_pad = jnp.concatenate(
        [g, jnp.zeros((b, 1, cout), g.dtype)], axis=1)
    c2o = jnp.concatenate(
        [c2t_out, jnp.full((b, 1), m_out, jnp.int32)], axis=1)
    tok_m = tokens * mask_in[..., None].astype(tokens.dtype)
    mrows = []
    for ty in range(k):
        for tx in range(k):
            ny_num = coords_in[..., 0] - ty + pl_y
            nx_num = coords_in[..., 1] - tx + pl_x
            oy = ny_num // stride
            ox = nx_num // stride
            ok = (
                (ny_num == oy * stride) & (nx_num == ox * stride)
                & (oy >= 0) & (oy < out_y) & (ox >= 0) & (ox < out_x)
                & mask_in
            )
            cell = jnp.where(ok, oy * out_x + ox, out_y * out_x)
            mrows.append(jnp.take_along_axis(c2o, cell, axis=1))
    import os
    if os.environ.get("GDMAE_TOKCONV_ONEGATHER"):
        # A/B variant matching the forward (see _conv_impl)
        midx = jnp.stack(mrows, axis=-1).reshape(b, m_in * k * k)
        mg_all = jnp.take_along_axis(g_pad, midx[..., None], axis=1).reshape(
            b, m_in, k * k * cout)  # (B, M_in, k*k*Cout)
    else:
        mg_all = jnp.concatenate(
            [jnp.take_along_axis(g_pad, r[..., None], axis=1)
             for r in mrows], axis=-1)  # (B, M_in, k*k*Cout)
    # ONE contraction each for the weight and token grads
    wg = jnp.einsum("bmc,bmt->ct", tok_m.astype(jnp.float32),
                    mg_all.astype(jnp.float32))  # (Cin, k*k*Cout)
    wg = jnp.moveaxis(wg.reshape(cin, k, k, cout), 0, 2).astype(weight.dtype)
    w_all = jnp.moveaxis(weight, (0, 1), (1, 2)).reshape(
        cin, k * k * cout).astype(mg_all.dtype)
    gtok = jax.lax.dot_general(
        mg_all, w_all, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(tokens.dtype)
    gtok = gtok * mask_in[..., None].astype(gtok.dtype)

    return (gtok, None, None, None, None, None, wg)


_gather_conv2d_p.defvjp(_gc_fwd, _gc_bwd)


def gather_conv2d(
    tokens: jnp.ndarray,
    cell2tok_in: jnp.ndarray,
    grid_in_hw: Tuple[int, int],
    coords_out: jnp.ndarray,
    mask_out: jnp.ndarray,
    weight: jnp.ndarray,
    stride: int = 1,
    coords_in: jnp.ndarray = None,
    mask_in: jnp.ndarray = None,
) -> jnp.ndarray:
    """Sparse conv: taps gather + one (M_out, k*k*Cin) x (k*k*Cin, Cout)
    matmul.  ``weight`` is HWIO (k, k, Cin, Cout), the nn.Conv layout.

    Pass ``coords_in``/``mask_in`` to enable the gather-only custom VJP
    (recommended under jit on TPU); without them JAX derives the transpose
    automatically (scatter-add — fine on CPU, slow on TPU)."""
    if coords_in is None:
        return _conv_impl(tokens, cell2tok_in, grid_in_hw, coords_out,
                          mask_out, weight, stride)
    return _gather_conv2d_p(
        tokens, cell2tok_in, coords_in, tuple(grid_in_hw), mask_in,
        coords_out, mask_out, weight, stride)
