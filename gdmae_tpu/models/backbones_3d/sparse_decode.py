"""Sparse MAE generative decoder: fused features at pillar sites only.

TPU-native re-design of the reference MAE decoder path
(pcdet/models/backbones_3d/spt_backbone_mae.py:115-131: ``.dense()`` +
deconv FPN fusion + per-voxel prediction).  The reference densifies the
pyramid to a full-resolution BEV canvas and reads back the masked voxels;
on TPU the dense fuse's conv/BN backward over the (B, Ny, Nx, 384) canvas
dominates the decode cost while the loss only ever consumes the ~M_dec
masked pillar rows.  This module computes EXACTLY the same function
(deblock 1x1 convs -> BN -> relu -> depth-to-space -> 3x3 conv -> BN ->
relu, evaluated at the pillar sites) without materializing any
full-resolution tensor:

  * each source's deblock matmul runs on the compact stage TOKEN list
    (the dense canvas is the scatter of those tokens, zero elsewhere, so
    zero rows contribute nothing to the matmul);
  * deblock BN statistics are EXACT canvas statistics: empty cells are
    zeros through the bias-free 1x1 conv, so sums over tokens equal sums
    over the canvas, and the divisor is the static canvas cell count;
  * a zero token row is appended BEFORE the BN so its normalized/relu'd
    blocks materialize the per-channel "empty cell" constant
    relu(beta - gamma*mean/sigma) -- tap lookups that miss land on it;
  * the 3x3 fuse conv becomes 9 subpixel-aware tap gathers per source at
    the decode sites + one (9*384 -> 128) matmul;
  * the final BN normalizes over the decode sites (MaskedBatchNorm) --
    the one deliberate semantic difference from the dense path, which
    averages over every canvas cell including the constant empty ones.

Backward is gather-only (no scatter-adds): each real token block row
(token x subpixel == one full-res cell) is read by at most ONE decode
site per tap, so the gather transpose is a mirrored tap gather (same
argument as ops.token_conv._gc_bwd); the shared const rows' cotangent is
a tap-mask segment sum.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...config import as_easy
from ...ops import window as window_ops
from ..model_utils.blocks import MaskedBatchNorm


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _decode_gather_p(u_all, idx, idx_mirror, s2, n_taps):
    """u_all (B, R, nf) -> (B, K, nf) rows at ``idx``.

    Row layout of ``u_all``: M*s2 real block rows, then s2 const rows
    (relu(BN(0)) per subpixel -- all identical), then one zero row.
    ``idx_mirror`` (B, (M*s2)*n_taps): for real block row r and tap t, the
    slot of the decode site reading it (or K for none)."""
    return jnp.take_along_axis(u_all, idx[..., None], axis=1)


def _dg_fwd(u_all, idx, idx_mirror, s2, n_taps):
    return (_decode_gather_p(u_all, idx, idx_mirror, s2, n_taps),
            (idx, idx_mirror, u_all.shape))


def _dg_bwd(s2, n_taps, res, g):
    idx, idx_mirror, (b, r_total, nf) = res
    k = idx.shape[1]
    m_s2 = r_total - s2 - 1  # real block rows
    g_pad = jnp.concatenate([g, jnp.zeros((b, 1, nf), g.dtype)], axis=1)
    # real rows: <=1 reader per tap -> accumulate n_taps mirrored gathers
    acc = jnp.zeros((b, m_s2, nf), jnp.float32)
    mi = idx_mirror.reshape(b, m_s2, n_taps)
    for t in range(n_taps):
        acc = acc + jnp.take_along_axis(g_pad, mi[:, :, t][..., None], axis=1)
    # const rows: shared by every missing tap with the same subpixel ->
    # segment-sum g over the s2 miss classes (one small einsum)
    is_const = (idx >= m_s2) & (idx < m_s2 + s2)
    sb = jnp.where(is_const, idx - m_s2, 0)
    onehot = (sb[..., None] == jnp.arange(s2, dtype=idx.dtype)) & \
        is_const[..., None]  # (B, K, s2)
    d_const = jnp.einsum(
        "bks,bkc->bsc", onehot.astype(jnp.float32), g.astype(jnp.float32))
    du = jnp.concatenate(
        [acc, d_const, jnp.zeros((b, 1, nf), jnp.float32)], axis=1)
    return du.astype(g.dtype), None, None


_decode_gather_p.defvjp(_dg_fwd, _dg_bwd)


class _TapConv(nn.Module):
    """(B, P, k*k*Cin) tap stack -> (B, P, Cout) with an nn.Conv-shaped
    HWIO (k, k, Cin, Cout) kernel, so params swap 1:1 with the dense
    ``nn.Conv(features, (k, k))`` it replaces."""

    features: int
    kernel: int
    cin: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, self.cin, self.features), jnp.float32)
        w_flat = w.reshape(
            self.kernel * self.kernel * self.cin, self.features
        ).astype(self.dtype)
        return jax.lax.dot_general(
            x, w_flat, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(self.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _tap_gather_sorted(flat, idx, mask, slot_map, ny, nx):
    """Canvas rows ``flat`` (B, ny*nx, C) gathered per 3x3 tap: ``idx``
    (B, 9, P) clipped-to-range cell ids; ``mask`` (B, 9, P) kills
    out-of-bounds/padding reads; ``slot_map`` (B, ny*nx) int32 cell ->
    decode-slot (P for none).  Returns (B, 9, P, C).

    Custom VJP — gather-only backward: the default ``take_along_axis``
    transpose is a scatter-add of B*9*P update rows, and TPU scatters
    serialize per update even with sorted/unique hints (measured +45..+90
    ms/step on the MAE bench at ~886k rows).  But each canvas cell has at
    most ONE reader per tap, and that reader's slot is just the decode
    slot map SHIFTED by the tap offset — so the canvas cotangent is nine
    shifted-map gathers from the small (B, P, C) cotangent, summed.  Same
    argument as ``_decode_gather_p`` above, but the mirror index needs no
    precomputation at all."""
    out = jnp.take_along_axis(
        flat, idx.reshape(idx.shape[0], -1)[..., None], axis=1)
    out = out.reshape(idx.shape + (flat.shape[-1],))
    return out * mask[..., None].astype(out.dtype)


def _tgs_fwd(flat, idx, mask, slot_map, ny, nx):
    return (_tap_gather_sorted(flat, idx, mask, slot_map, ny, nx),
            (mask, slot_map))


def _tgs_bwd(ny, nx, res, g):
    mask, slot_map = res
    b, t, p, c = g.shape
    g = g * mask[..., None].astype(g.dtype)
    # (B, ny+2, nx+2) slot map with a one-cell "no reader" border: tap
    # (ty, tx)'s reader map is a static slice of it
    pad = jnp.pad(slot_map.reshape(b, ny, nx), ((0, 0), (1, 1), (1, 1)),
                  constant_values=p)
    acc = jnp.zeros((b, ny * nx, c), jnp.float32)
    for ti in range(t):
        ty, tx = divmod(ti, 3)
        # site at (y, x) reads tap (ty, tx) from (y+ty-1, x+tx-1): cell
        # (cy, cx) is read by the site at (cy-(ty-1), cx-(tx-1))
        reader = jax.lax.dynamic_slice(
            pad, (0, 2 - ty, 2 - tx), (b, ny, nx)).reshape(b, ny * nx)
        g_pad = jnp.concatenate(
            [g[:, ti], jnp.zeros((b, 1, c), g.dtype)], axis=1)
        acc = acc + jnp.take_along_axis(
            g_pad, reader[..., None], axis=1).astype(jnp.float32)
    return acc.astype(g.dtype), None, None, None


_tap_gather_sorted.defvjp(_tgs_fwd, _tgs_bwd)


class HybridDecodeFuse(nn.Module):
    """DeconvFuse with the 3x3 ``conv_out`` evaluated at DECODE SITES only.

    The middle ground between the dense :class:`spt_backbone.DeconvFuse`
    and the all-sparse :class:`SparseDecodeFuse`: the deblock upsample
    stays dense (1x1 matmuls + depth-to-space are cheap and their backward
    is matmul-shaped), but the full-resolution 3x3 fuse conv — the
    dominant cost of the dense fuse (~25 of its ~40 ms/step at MAE-bench
    batch 16, 2.3 TFLOP over an 857k-cell canvas of which the MAE loss
    reads ~2%) — becomes 9 row-wide tap gathers at the decode sites plus
    one (9*C_in -> C_out) matmul.  Backward through the tap gathers is
    XLA's scatter-add of ~P*9 384-wide rows into the canvas cotangent —
    raster-sorted site order keeps it on the fast sorted-scatter path.

    Param tree (deblock_i / deblock_bn_i / conv_out / conv_out_bn) is
    IDENTICAL to DeconvFuse, so dense checkpoints load unchanged.  The one
    semantic difference from the dense path: ``conv_out_bn`` batch
    statistics are computed over the decode sites (masked) instead of
    every canvas cell — same deliberate trade as SparseDecodeFuse (module
    docstring above); the pretrained ENCODER weights, which are what
    transfer to detection fine-tuning, see identical math.

    Reference behavior covered: spt_backbone_mae.py:115-131 (dense fuse +
    masked-voxel readback).
    """

    fuse_cfg: Any
    sources: Sequence[str]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_maps: Dict[str, jnp.ndarray], dec_coords,
                 dec_valid, train: bool = True):
        """feature_maps[src]: dense (B, h, w, C) stage canvases;
        dec_coords (B, P, 2) int32 [iy, ix] full-res cells (raster-sorted);
        dec_valid (B, P).  Returns (B, P, C_out)."""
        fuse_cfg = as_easy(self.fuse_cfg)
        ups = []
        total = 0
        for i, src in enumerate(self.sources):
            cfg = fuse_cfg[src]
            stride = int(cfg.UPSAMPLE_STRIDE)
            nf = int(cfg.NUM_UPSAMPLE_FILTER)
            x = feature_maps[src]
            b, h, w, _ = x.shape
            x = nn.Conv(
                stride * stride * nf, (1, 1), use_bias=False,
                dtype=self.dtype, name=f"deblock_{i}",
            )(x)
            x = x.reshape(b, h, w, stride * stride, nf)
            x = MaskedBatchNorm(dtype=self.dtype, name=f"deblock_bn_{i}")(
                x, use_running_average=not train
            )
            x = nn.relu(x)
            x = x.reshape(b, h, w, stride, stride, nf)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, h * stride, w * stride, nf)
            ups.append(x)
            total += nf
        canvas = jnp.concatenate(ups, axis=-1)  # (B, NY, NX, total)
        b, ny, nx, _ = canvas.shape
        p = dec_coords.shape[1]

        flat = canvas.reshape(b, ny * nx, total)
        slot_map = window_ops.build_cell2tok(dec_coords, dec_valid, (ny, nx))
        idx_taps, mask_taps = [], []
        for ty in range(3):
            for tx in range(3):
                fy = dec_coords[..., 0] + ty - 1
                fx = dec_coords[..., 1] + tx - 1
                inb = ((fy >= 0) & (fy < ny) & (fx >= 0) & (fx < nx)
                       & dec_valid)
                # clip misses in-range; they read garbage that the mask
                # zeroes, and the mirrored backward never routes them
                idx_taps.append(jnp.clip(fy * nx + fx, 0, ny * nx - 1))
                mask_taps.append(inb)
        v = _tap_gather_sorted(
            flat, jnp.stack(idx_taps, axis=1),
            jnp.stack(mask_taps, axis=1), slot_map, ny, nx)
        stack = v.transpose(0, 2, 1, 3).reshape(b, p, 9 * total)
        y = _TapConv(
            features=total // len(self.sources), kernel=3, cin=total,
            dtype=self.dtype, name="conv_out",
        )(stack)
        y = MaskedBatchNorm(dtype=self.dtype, name="conv_out_bn")(
            y, mask=dec_valid, use_running_average=not train)
        y = nn.relu(y)
        return y * dec_valid[..., None].astype(y.dtype)


class SparseDecodeFuse(nn.Module):
    """Drop-in replacement for :class:`spt_backbone.DeconvFuse` + the
    decode-site canvas gather, evaluated at decode sites only.  Parameter
    tree (deblock_i / deblock_bn_i / conv_out / conv_out_bn) matches
    DeconvFuse exactly, so dense checkpoints load unchanged."""

    fuse_cfg: Any
    sources: Sequence[str]
    full_hw: Tuple[int, int]  # stride-1 (NY, NX)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, stage_tokens: Dict[str, tuple], dec_coords,
                 dec_valid, train: bool = True):
        """stage_tokens[src] = (tokens (B,M,C), coords (B,M,2), mask (B,M),
        cell2tok (B,h*w), (h, w)); dec_coords (B, P, 2) raster-sorted
        full-res cells; dec_valid (B, P).  Returns (B, P, C_out)."""
        fuse_cfg = as_easy(self.fuse_cfg)
        ny, nx = self.full_hw
        b, p, _ = dec_coords.shape
        n_taps = 9

        # decode-site cell->slot map for the gather-only backward
        c2t_dec = window_ops.build_cell2tok(dec_coords, dec_valid, (ny, nx))
        c2t_dec = jnp.concatenate(
            [c2t_dec, jnp.full((b, 1), p, jnp.int32)], axis=1)

        taps_per_source = []
        total_nf = 0
        for i, src in enumerate(self.sources):
            cfg = fuse_cfg[src]
            s = int(cfg.UPSAMPLE_STRIDE)
            nf = int(cfg.NUM_UPSAMPLE_FILTER)
            total_nf += nf
            tokens, coords, mask, c2t, (h, w) = stage_tokens[src]
            assert h * s >= ny and w * s >= nx, (src, h, w, s, ny, nx)
            m_s = tokens.shape[1]
            s2 = s * s

            # deblock 1x1 on tokens + zero row (== empty canvas cell)
            tok_pad = jnp.concatenate(
                [tokens * mask[..., None].astype(tokens.dtype),
                 jnp.zeros((b, 1, tokens.shape[-1]), tokens.dtype)], axis=1)
            x = nn.Conv(
                s2 * nf, (1, 1), use_bias=False, dtype=self.dtype,
                name=f"deblock_{i}",
            )(tok_pad[:, :, None, :])[:, :, 0]  # (B, M+1, s2*nf)
            # EXACT canvas BN: zeros contribute nothing to the sums; the
            # divisor is the full canvas block count b*h*w*s2
            x = x.reshape(b, (m_s + 1) * s2, nf)
            x = MaskedBatchNorm(dtype=self.dtype, name=f"deblock_bn_{i}")(
                x, use_running_average=not train,
                count=float(b * h * w * s2))
            u = nn.relu(x)  # pad token rows == relu(BN(0)) const
            u_all = jnp.concatenate(
                [u, jnp.zeros((b, 1, nf), u.dtype)], axis=1)
            zero_row = (m_s + 1) * s2

            # tap indices: full-res tap cell -> (source token, subpixel)
            c2t_pad = jnp.concatenate(
                [c2t, jnp.full((b, 1), m_s, jnp.int32)], axis=1)
            idx_taps = []
            for ty in range(3):
                for tx in range(3):
                    fy = dec_coords[..., 0] + ty - 1
                    fx = dec_coords[..., 1] + tx - 1
                    inb = ((fy >= 0) & (fy < ny) & (fx >= 0) & (fx < nx)
                           & dec_valid)
                    cell = jnp.where(inb, (fy // s) * w + fx // s, h * w)
                    j = jnp.take_along_axis(c2t_pad, cell, axis=1)
                    sb = (fy % s) * s + fx % s
                    # j == m_s (empty cell) lands on a const row for free
                    idx_taps.append(
                        jnp.where(inb, j * s2 + sb, zero_row))
            idx = jnp.stack(idx_taps, axis=-1).reshape(b, p * n_taps)

            # mirrored indices: block row (token jj, subpixel sb) is the
            # full-res cell coords[jj]*s + sb; its tap-t reader sits at
            # cell - (ty-1, tx-1)
            jj = jnp.arange(m_s * s2, dtype=jnp.int32) // s2
            sbr = jnp.arange(m_s * s2, dtype=jnp.int32) % s2
            cy = (jnp.take_along_axis(
                coords[..., 0], jnp.broadcast_to(jj[None], (b, m_s * s2)),
                axis=1) * s + (sbr // s)[None])
            cx = (jnp.take_along_axis(
                coords[..., 1], jnp.broadcast_to(jj[None], (b, m_s * s2)),
                axis=1) * s + (sbr % s)[None])
            rmask = jnp.take_along_axis(
                mask, jnp.broadcast_to(jj[None], (b, m_s * s2)), axis=1)
            mirror = []
            for ty in range(3):
                for tx in range(3):
                    ry = cy - (ty - 1)
                    rx = cx - (tx - 1)
                    ok = ((ry >= 0) & (ry < ny) & (rx >= 0) & (rx < nx)
                          & rmask)
                    cell = jnp.where(ok, ry * nx + rx, ny * nx)
                    slot = jnp.take_along_axis(c2t_dec, cell, axis=1)
                    t = ty * 3 + tx
                    mirror.append(jnp.where(
                        slot < p, slot * n_taps + t, p * n_taps))
            idx_mirror = jnp.stack(mirror, axis=-1).reshape(
                b, m_s * s2 * n_taps)

            v = _decode_gather_p(u_all, idx, idx_mirror, s2, n_taps)
            taps_per_source.append(v.reshape(b, p, n_taps, nf))

        stack = jnp.concatenate(taps_per_source, axis=-1)  # (B,P,9,total)
        y = _TapConv(
            features=total_nf // len(self.sources), kernel=3, cin=total_nf,
            dtype=self.dtype, name="conv_out",
        )(stack.reshape(b, p, n_taps * total_nf))
        y = MaskedBatchNorm(dtype=self.dtype, name="conv_out_bn")(
            y, mask=dec_valid, use_running_average=not train)
        y = nn.relu(y)
        return y * dec_valid[..., None].astype(y.dtype)
