"""Fused masked window attention (Pallas TPU kernel).

The SST encoder runs thousands of tiny attentions — one per BEV window —
with T in {16, 32, 64} tokens and head_dim 16/32 (reference
pcdet/models/model_utils/sst_basic_block.py WindowAttention loops drop-level
buckets through torch MHA).  Two problems for the TPU:

* the XLA einsum path materializes the ``(W, H, T, T)`` logits tensor in HBM
  twice (softmax in, probs out) — >100 MB of pure bandwidth per layer;
* T×T matmuls (16×16 .. 64×64) are far below the 128×128 MXU tile, so both
  XLA's batched dot and a naive per-window kernel waste >90% of the MXU.

This kernel solves both: each grid step packs G = 128//T windows of one head
into a single (128, D) tile and computes ONE 128×128 block-diagonal
attention — off-diagonal window pairs are masked to -inf, so softmax rows
only span their own window's keys.  The MXU runs fully-shaped matmuls, and
logits/probabilities never leave VMEM.  The key-padding mask enters as a
pre-flattened additive f32 bias (Mosaic cannot reshape packed bool vectors).

Cosine attention (L2-normalized q/k, learnable tau) folds into this shape by
normalizing+scaling q beforehand — elementwise work XLA fuses into the
projection matmul.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _block_diag_bias(s, t):
    rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0) // t
    cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1) // t
    return jnp.where(rows == cols, 0.0, -1e9).astype(jnp.float32)


def _softmax_rows(logits):
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _attn_kernel(t, q_ref, k_ref, v_ref, bias_ref, o_ref):
    g = q_ref.shape[0]
    s = g * t
    d = q_ref.shape[-1]
    qf = q_ref[:, 0].reshape(s, d)
    kf = k_ref[:, 0].reshape(s, d)
    vf = v_ref[:, 0].reshape(s, d)

    logits = jax.lax.dot_general(
        qf, kf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    logits = logits + bias_ref[0] + _block_diag_bias(s, t)
    p = _softmax_rows(logits)
    out = jax.lax.dot_general(
        p.astype(vf.dtype), vf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:, 0] = out.reshape(g, t, d).astype(o_ref.dtype)


def _attn_bwd_kernel(t, q_ref, k_ref, v_ref, bias_ref, g_ref,
                     dq_ref, dk_ref, dv_ref):
    """Recompute the probabilities in VMEM, then
    dv = p^T g;  ds = p * (g v^T - rowsum(g v^T * p));  dq = ds k;  dk = ds^T q.
    """
    g = q_ref.shape[0]
    s = g * t
    d = q_ref.shape[-1]
    qf = q_ref[:, 0].reshape(s, d).astype(jnp.float32)
    kf = k_ref[:, 0].reshape(s, d).astype(jnp.float32)
    vf = v_ref[:, 0].reshape(s, d).astype(jnp.float32)
    gf = g_ref[:, 0].reshape(s, d).astype(jnp.float32)

    logits = jax.lax.dot_general(
        qf, kf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    logits = logits + bias_ref[0] + _block_diag_bias(s, t)
    p = _softmax_rows(logits)

    dv = jax.lax.dot_general(  # p^T @ g
        p, gf, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(  # g @ v^T
        gf, vf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(
        ds, kf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(  # ds^T @ q
        ds, qf, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    dq_ref[:, 0] = dq.reshape(g, t, d).astype(dq_ref.dtype)
    dk_ref[:, 0] = dk.reshape(g, t, d).astype(dk_ref.dtype)
    dv_ref[:, 0] = dv.reshape(g, t, d).astype(dv_ref.dtype)


def _pick_group(w, t):
    """Windows per block: fill a 128-row tile, fall back to a divisor of W."""
    g = max(1, min(w, 128 // t))
    while w % g:
        g -= 1
    return g


def _specs(t, d, g):
    blk = pl.BlockSpec((g, 1, t, d), lambda wi, hi: (wi, hi, 0, 0))
    # bias rides as (W//g, 1, g*t): the block (1, 1, g*t) then matches the
    # trailing array dims exactly, satisfying Mosaic's tiling constraints
    # (1-D f32 inputs get an incompatible T(1024) XLA tiling)
    bias_blk = pl.BlockSpec((1, 1, g * t), lambda wi, hi: (wi, 0, 0))
    return blk, bias_blk


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_attention(q, k, v, bias_flat, interpret):
    w, h, t, d = q.shape
    g = _pick_group(w, t)
    blk, bias_blk = _specs(t, d, g)
    return pl.pallas_call(
        functools.partial(_attn_kernel, t),
        out_shape=jax.ShapeDtypeStruct((w, h, t, d), q.dtype),
        grid=(w // g, h),
        in_specs=[blk, blk, blk, bias_blk],
        out_specs=blk,
        interpret=interpret,
    )(q, k, v, bias_flat)


def _fused_attention_fwd(q, k, v, bias_flat, interpret):
    return _fused_attention(q, k, v, bias_flat, interpret), (q, k, v, bias_flat)


def _fused_attention_bwd(interpret, res, g_out):
    q, k, v, bias_flat = res
    w, h, t, d = q.shape
    g = _pick_group(w, t)
    blk, bias_blk = _specs(t, d, g)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, t),
        out_shape=[jax.ShapeDtypeStruct((w, h, t, d), q.dtype)] * 3,
        grid=(w // g, h),
        in_specs=[blk, blk, blk, bias_blk, blk],
        out_specs=[blk, blk, blk],
        interpret=interpret,
    )(q, k, v, bias_flat, g_out)
    return dq, dk, dv, None


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_window_attention(q, k, v, valid, interpret: bool = False):
    """softmax(q @ k^T + key_padding_mask) @ v per (window, head), fused.

    Args:
        q, k, v: (W, H, T, D) — any scaling (1/sqrt(d) or cosine tau) must
            already be folded into q.
        valid: (W, T) bool key-padding mask (shared across heads).
    Returns:
        (W, H, T, D) attention output (invalid queries produce garbage rows —
        callers mask, as they already do for the einsum path).
    """
    w, h, t, d = q.shape
    g = _pick_group(w, t)
    bias2d = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)\
        .reshape(w // g, 1, g * t)
    return _fused_attention(q, k, v, bias2d, interpret)


def reference_window_attention(q, k, v, valid):
    """Pure-XLA fallback (identical math; used on CPU and as the test oracle).

    q/k/v: (..., H, T, hd); valid: (..., T) — any number of leading window/
    batch dims (keeping the batch dim explicit keeps data-parallel sharding
    collective-free)."""
    logits = jnp.einsum("...htd,...hsd->...hts", q, k,
                        preferred_element_type=jnp.float32)
    logits = jnp.where(valid[..., None, None, :], logits, -1e9)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("...hts,...hsd->...htd", attn.astype(v.dtype), v)


def _headmask_ch(c, h, dtype):
    """(C, H, 1) mask: 1 where channel c belongs to head h."""
    hd = c // h
    hh = jax.lax.broadcasted_iota(jnp.int32, (c, h, 1), 1)
    cc = jax.lax.broadcasted_iota(jnp.int32, (c, h, 1), 0) // hd
    return (hh == cc).astype(dtype)


def _headmask_hc(c, h, dtype):
    """(H, 1, C) mask: 1 where channel c belongs to head h."""
    hd = c // h
    hh = jax.lax.broadcasted_iota(jnp.int32, (h, 1, c), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (h, 1, c), 2) // hd
    return (hh == cc).astype(dtype)


def _subwin_penalty(s, h, t):
    rw = jax.lax.broadcasted_iota(jnp.int32, (s, 1, s), 0) // t
    cw = jax.lax.broadcasted_iota(jnp.int32, (s, 1, s), 2) // t
    return jnp.where(rw == cw, 0.0, -1e9).astype(jnp.float32)


def _pmha_probs(q, k, kb, h, t):
    """Shared fwd math: (S, C) tiles -> (S, H*S) f32 probabilities.

    Per-head logits via ONE (S, C) x (C, H*S) MXU matmul: K is expanded to
    a head-block-diagonal (C, H*S) matrix in VMEM (channels outside head h
    zeroed), so no lane-sliced per-head matmuls and no hd-minor tensors
    (hd=16 pads 8x in (8,128) HBM tiles) ever exist."""
    s, c = q.shape
    kT = jnp.swapaxes(k, 0, 1)  # (C, S)
    k_bd = (kT[:, None, :] * _headmask_ch(c, h, k.dtype)).reshape(c, h * s)
    logits = jax.lax.dot_general(
        q, k_bd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    l3 = logits.reshape(s, h, s) + _subwin_penalty(s, h, t) \
        + kb.reshape(1, 1, s)
    m = jnp.max(l3, axis=-1, keepdims=True)
    e = jnp.exp(l3 - m)
    p3 = e / jnp.sum(e, axis=-1, keepdims=True)
    return p3.reshape(s, h * s)


def _pmha_kernel(h, t, q_ref, k_ref, v_ref, kb_ref, o_ref):
    g, s, c = q_ref.shape
    for gi in range(g):
        q, k, v = q_ref[gi], k_ref[gi], v_ref[gi]
        p = _pmha_probs(q, k, kb_ref[gi], h, t)
        v_bd = (v[None] * _headmask_hc(c, h, v.dtype)).reshape(h * s, c)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v_bd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[gi] = o.astype(o_ref.dtype)


def _pmha_bwd_kernel(h, t, q_ref, k_ref, v_ref, kb_ref, g_ref,
                     dq_ref, dk_ref, dv_ref):
    g, s, c = q_ref.shape
    for gi in range(g):
        q, k, v = q_ref[gi], k_ref[gi], v_ref[gi]
        go = g_ref[gi]
        p = _pmha_probs(q, k, kb_ref[gi], h, t)  # (S, H*S) f32
        pc = p.astype(v.dtype)
        mask_hc = _headmask_hc(c, h, v.dtype)

        # dV[s', c] = sum_t P[t, h(c)*S+s'] g[t, c]
        mv = jax.lax.dot_general(  # P^T @ g -> (H*S, C)
            pc, go, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dv = jnp.sum(mv.reshape(h, s, c) * mask_hc.astype(jnp.float32),
                     axis=0)

        # dP = g @ V_bd^T: V_bd^T[c, h*S+s'] = V[s', c] * mask
        vT = jnp.swapaxes(v, 0, 1)
        v_bdT = (vT[:, None, :] * _headmask_ch(c, h, v.dtype)).reshape(c, h * s)
        dp = jax.lax.dot_general(
            go, v_bdT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (S, H*S)
        p3 = p.reshape(s, h, s)
        dp3 = dp.reshape(s, h, s)
        ds3 = p3 * (dp3 - jnp.sum(dp3 * p3, axis=-1, keepdims=True))
        ds = ds3.reshape(s, h * s).astype(v.dtype)

        # dQ = ds @ K_bd^T: K_bd^T[h*S+s', c] = K[s', c] * mask
        k_bdT = (k[None] * mask_hc).reshape(h * s, c)
        dq = jax.lax.dot_general(
            ds, k_bdT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        # dK[s', c] = sum_t ds[t, h(c)*S+s'] q[t, c]
        mk = jax.lax.dot_general(  # ds^T @ q -> (H*S, C)
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk = jnp.sum(mk.reshape(h, s, c) * mask_hc.astype(jnp.float32),
                     axis=0)

        dq_ref[gi] = dq.astype(dq_ref.dtype)
        dk_ref[gi] = dk.astype(dk_ref.dtype)
        dv_ref[gi] = dv.astype(dv_ref.dtype)


def _pmha_pick_group(n):
    for g in (8, 4, 2):
        if n % g == 0:
            return g
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _packed_mha_level(q, k, v, kb, h, t, interpret):
    """q/k/v: (N, S, C) packed blocks; kb: (N, 1, S) f32 key-padding bias."""
    n, s, c = q.shape
    g = _pmha_pick_group(n)
    blk = pl.BlockSpec((g, s, c), lambda i: (i, 0, 0))
    kbb = pl.BlockSpec((g, 1, s), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_pmha_kernel, h, t),
        out_shape=jax.ShapeDtypeStruct((n, s, c), q.dtype),
        grid=(n // g,),
        in_specs=[blk, blk, blk, kbb],
        out_specs=blk,
        interpret=interpret,
    )(q, k, v, kb)


def _pmha_fwd(q, k, v, kb, h, t, interpret):
    return _packed_mha_level(q, k, v, kb, h, t, interpret), (q, k, v, kb)


def _pmha_bwd(h, t, interpret, res, go):
    q, k, v, kb = res
    n, s, c = q.shape
    g = _pmha_pick_group(n)
    blk = pl.BlockSpec((g, s, c), lambda i: (i, 0, 0))
    kbb = pl.BlockSpec((g, 1, s), lambda i: (i, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_pmha_bwd_kernel, h, t),
        out_shape=[jax.ShapeDtypeStruct((n, s, c), q.dtype)] * 3,
        grid=(n // g,),
        in_specs=[blk, blk, blk, kbb, blk],
        out_specs=[blk, blk, blk],
        interpret=interpret,
    )(q, k, v, kb, go)
    return dq, dk, dv, None


_packed_mha_level.defvjp(_pmha_fwd, _pmha_bwd)


def packed_window_mha(q, k, v, valid, ts, nhead, interpret: bool = False):
    """Multi-head attention over the packed 128-token block stream, fused
    per level (Pallas TPU kernel; logits/probabilities never leave VMEM).

    Blocks of equal sub-window size are contiguous in the packed stream
    (one run per drop level), so each run gets its own pallas_call with a
    STATIC sub-window size.

    Args:
        q, k, v: (B, S_tot, C) projected tokens (cosine scaling already
            folded into q); C == nhead * head_dim.
        valid: (B, S_tot) bool key mask.
        ts: static tuple, sub-window size per 128-token block.
        nhead: static head count.
    Returns:
        (B, S_tot, C) attention output (rows with invalid queries are
        garbage — callers mask, as with the other paths).
    """
    b, s_tot, c = q.shape
    blk = 128
    kb_full = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)
    outs = []
    start = 0
    i = 0
    while i < len(ts):
        j = i
        while j < len(ts) and ts[j] == ts[i]:
            j += 1
        nblk = j - i
        sl = slice(start, start + nblk * blk)

        def shape(x):
            return x[:, sl].reshape(b * nblk, blk, c)

        kb = kb_full[:, sl].reshape(b * nblk, 1, blk)
        o = _packed_mha_level(
            shape(q), shape(k), shape(v), kb, nhead, int(ts[i]), interpret)
        outs.append(o.reshape(b, nblk * blk, c))
        start += nblk * blk
        i = j
    return jnp.concatenate(outs, axis=1)


def biased_window_attention(q, k, v, valid, bias, cosine=True):
    """Attention over packed 128-token blocks with an additive per-block
    bias carrying the sub-window block-diagonal structure.

    The (B, NB, H, 128, 128) logits are the bandwidth hot spot (~80x off
    the MXU roofline otherwise): under cosine attention they are kept in
    the INPUT dtype (bf16 on TPU; cosine logits are bounded by 1/tau_min so
    bf16's ~3 significant digits cover them), with the softmax still
    reduced in f32.  Measured 6.6 vs 8.1 ms per encoder layer fwd+bwd at
    MAE-bench shapes.  With ``cosine=False`` raw qk logits are unbounded,
    so f32 logits are forced regardless of input dtype.

    Args:
        q, k, v: (B, NB, H, T, D) packed blocks (T = 128).
        valid: (B, NB, T) key-padding mask.
        bias: (NB, T, T) f32 additive bias (0 inside each sub-window,
            -1e9 across sub-windows; :func:`ops.window.packed_block_bias`).
        cosine: static; True when q/k are L2-normalized cosine-attention
            projections (bounded logits — bf16 is safe).
    Returns:
        (B, NB, H, T, D).
    """
    ldt = q.dtype if (cosine and q.dtype == jnp.bfloat16) else jnp.float32
    logits = jnp.einsum("bnhtd,bnhsd->bnhts", q, k,
                        preferred_element_type=ldt)
    logits = logits + bias[None, :, None].astype(ldt)
    logits = jnp.where(valid[:, :, None, None, :], logits,
                       jnp.asarray(-1e9, ldt))
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bnhts,bnhsd->bnhtd", attn.astype(v.dtype), v)


def wid_window_attention(q, k, v, valid, wid, cosine=True):
    """Attention over packed 128-token blocks masked by a per-slot WINDOW
    ID instead of a static per-block sub-window size (the joint-budget
    packing path, ops.window.JointPlan): query t attends key s iff
    ``wid[t] == wid[s]`` and the key is valid.

    Args:
        q, k, v: (B, NB, H, T, D) packed blocks (T = 128).
        valid: (B, NB, T) key mask; wid: (B, NB, T) int32 (-1 on padding —
            padding slots are also valid=False, so -1 == -1 matches are
            masked by ``valid``; their query rows are garbage, dropped by
            the inverse-index scatter like every other path).
        cosine: static; bf16 logits when inputs are bf16 (bounded logits).
    Returns:
        (B, NB, H, T, D).
    """
    ldt = q.dtype if (cosine and q.dtype == jnp.bfloat16) else jnp.float32
    logits = jnp.einsum("bnhtd,bnhsd->bnhts", q, k,
                        preferred_element_type=ldt)
    ok = (wid[:, :, None, :, None] == wid[:, :, None, None, :]) \
        & valid[:, :, None, None, :]
    logits = jnp.where(ok, logits, jnp.asarray(-1e9, ldt))
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bnhts,bnhsd->bnhtd", attn.astype(v.dtype), v)


def biased_window_attention_tokmajor(q, k, v, valid, bias, cosine, nhead):
    """Same math as :func:`biased_window_attention` but on token-major
    channel-flat blocks — no head-major (B, NB, H, T, hd) tensors are ever
    materialized.  With hd = 16/32 the head-split minor dim pads 8x/4x in
    (8, 128) HBM tiles, and the explicit ``moveaxis`` copies into/out of
    head-major layout were pure wasted bandwidth: einsum lets XLA fold the
    head split into the dot's contraction dims instead.

    Args:
        q, k, v: (B, NB, T, C) packed blocks (T = 128, C = nhead * hd).
        valid: (B, NB, T); bias: (NB, T, T) f32; cosine: static (see
            :func:`biased_window_attention`); nhead: static head count.
    Returns:
        (B, NB, T, C).
    """
    b, nb, t, c = q.shape
    h = nhead
    hd = c // h
    ldt = q.dtype if (cosine and q.dtype == jnp.bfloat16) else jnp.float32

    def split(x):  # free reshape — no transpose
        return x.reshape(b, nb, t, h, hd)

    logits = jnp.einsum("bnthd,bnshd->bnhts", split(q), split(k),
                        preferred_element_type=ldt)
    logits = logits + bias[None, :, None].astype(ldt)
    logits = jnp.where(valid[:, :, None, None, :], logits,
                       jnp.asarray(-1e9, ldt))
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bnhts,bnshd->bnthd", attn.astype(v.dtype), split(v))
    return out.reshape(b, nb, t, c)


def blocked_window_attention(q, k, v, valid):
    """Same math as :func:`reference_window_attention`, but G = 128//T
    windows are packed into ONE (G*T, G*T) block-diagonal attention so the
    logits/probability tensors tile HBM as full (8, 128) blocks.

    With T in {16, 32, 64} the naive (..., T, T) logits pad 8x/4x/2x on the
    TPU's (8, 128) tiles — attention here is bandwidth-bound, so that
    padding is the dominant cost.  Off-diagonal window pairs get a -1e9
    additive bias, making the packed form exactly equivalent.

    Args:
        q, k, v: (B, W, H, T, D); valid: (B, W, T) bool.
    Returns:
        (B, W, H, T, D).
    """
    b, w, h, t, d = q.shape
    g = max(1, 128 // t)
    wpad = (-w) % g
    if wpad:
        padw = ((0, 0), (0, wpad), (0, 0), (0, 0), (0, 0))
        q = jnp.pad(q, padw)
        k = jnp.pad(k, padw)
        v = jnp.pad(v, padw)
        valid = jnp.pad(valid, ((0, 0), (0, wpad), (0, 0)))
    wg = (w + wpad) // g
    s = g * t

    def regroup(x):
        x = x.reshape(b, wg, g, h, t, d)
        return jnp.moveaxis(x, 2, 3).reshape(b, wg, h, s, d)

    qg, kg, vg = regroup(q), regroup(k), regroup(v)
    vmask = valid.reshape(b, wg, s)
    blk = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0) // t \
        == jax.lax.broadcasted_iota(jnp.int32, (s, s), 1) // t
    key_ok = blk[None, None, None] & vmask[:, :, None, None, :]
    logits = jnp.einsum("bwhtd,bwhsd->bwhts", qg, kg,
                        preferred_element_type=jnp.float32)
    logits = jnp.where(key_ok, logits, -1e9)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bwhts,bwhsd->bwhtd", attn.astype(vg.dtype), vg)
    out = jnp.moveaxis(out.reshape(b, wg, h, g, t, d), 3, 2).reshape(
        b, wg * g, h, t, d)[:, :w]
    return out
