"""Fully-fused SST encoder layer (Pallas TPU kernel).

One post-norm transformer encoder layer — QKV projection, cosine per-head
normalization, block-diagonal window attention, output projection, residual
add + LayerNorm, FFN, residual add + LayerNorm — over the packed 128-token
block stream, in ONE kernel per layer (fwd) and one per layer (bwd).

Why: the XLA lowering of the same layer is ~25 separate HBM passes over the
(B, S, C) token stream plus a (B, NB, H, 128, 128) logits tensor that rides
HBM twice per pass; on the MAE bench the encoder stack costs ~160 ms of a
374 ms step while its FLOPs are <2 ms at peak.  Here every intermediate
(q/k/v, logits, probabilities, FFN hidden) lives in VMEM only; HBM traffic
per layer collapses to reading x/pos and writing the output.

The backward pass is flash-style: nothing is saved from the forward — the
backward kernel recomputes the whole layer per block (via jax.vjp *inside*
the kernel, so Mosaic sees one fused program) and accumulates the weight
gradients across grid steps in VMEM (TPU grids execute sequentially).

Per-head math avoids (S, H, hd) reshapes entirely (hd = 16/32 minor dims
tile terribly): cosine norms use segment-matmul reductions against a static
(C, H) head-membership matrix, and attention uses the head-block-diagonal
(C, H*S) expansion from window_attention._pmha_probs.

Reference semantics: pcdet/models/model_utils/sst_basic_block.py
``EncoderLayer`` (post-norm, :57-84) with cosine_msa.py cosine attention.
Numerics match gdmae_tpu.models.model_utils.sst_layers.BucketEncoderLayer
(packed path) — see tests/test_fused_encoder.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# number of f32 parameter arrays threaded through the kernels
_N_PARAMS = 13


def _seg_ch(c, h, dtype):
    """(C, H) head-membership matrix: 1 where channel c belongs to head h."""
    hd = c // h
    cc = jax.lax.broadcasted_iota(jnp.int32, (c, h), 0) // hd
    hh = jax.lax.broadcasted_iota(jnp.int32, (c, h), 1)
    return (cc == hh).astype(dtype)


def _seg_hc(c, h, dtype):
    """(H, C) transpose of :func:`_seg_ch` (built directly — no transpose)."""
    hd = c // h
    cc = jax.lax.broadcasted_iota(jnp.int32, (h, c), 1) // hd
    hh = jax.lax.broadcasted_iota(jnp.int32, (h, c), 0)
    return (cc == hh).astype(dtype)


def _headmask_ch(c, h, dtype):
    hd = c // h
    hh = jax.lax.broadcasted_iota(jnp.int32, (c, h, 1), 1)
    cc = jax.lax.broadcasted_iota(jnp.int32, (c, h, 1), 0) // hd
    return (hh == cc).astype(dtype)


def _headmask_hc(c, h, dtype):
    hd = c // h
    hh = jax.lax.broadcasted_iota(jnp.int32, (h, 1, c), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (h, 1, c), 2) // hd
    return (hh == cc).astype(dtype)


def _layernorm(a, scale, bias, eps=1e-5):
    """LayerNorm over the last dim, f32 statistics (matches
    fused_layernorm.reference_add_layernorm)."""
    s = a.astype(jnp.float32)
    mu = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.var(s, axis=-1, keepdims=True)
    return (s - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _layer_block(x, pos, kb, bias, params, h):
    """One (S, C) token block through the full encoder layer.

    Pure jnp — traced both inside the Pallas kernels (incl. via jax.vjp in
    the backward kernel) and directly as the XLA/CPU fallback (vmapped).

    Args:
        x, pos: (S, C) compute-dtype tokens / position embeds.
        kb: (1, S) f32 key-padding bias (0 valid / -1e9 invalid).
        bias: (S, S) f32 sub-window block-diagonal bias.
        params: 13-tuple of f32 arrays — qkv_w (C, 3C), qkv_b (1, 3C),
            inv_tau (1, H), out_w (C, C), out_b (1, C), ln1_s/ln1_b (1, C),
            w1 (C, F), b1 (1, F), w2 (F, C), b2 (1, C), ln2_s/ln2_b (1, C).
    Returns:
        (S, C) layer output in x.dtype (invalid token rows carry garbage —
        callers mask or rely on inverse-index scatter to drop them).
    """
    (qkv_w, qkv_b, inv_tau, out_w, out_b, ln1_s, ln1_b,
     w1, b1, w2, b2, ln2_s, ln2_b) = params
    s, c = x.shape
    cdt = x.dtype

    def w(p):  # compute-dtype weight view (nn.Dense(dtype=...) semantics)
        return p.astype(cdt)

    qk_in = x + pos
    qk2 = jax.lax.dot_general(
        qk_in, w(qkv_w[:, : 2 * c]), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt) + w(qkv_b[0, : 2 * c])
    q, k = qk2[:, :c], qk2[:, c:]
    v = jax.lax.dot_general(
        x, w(qkv_w[:, 2 * c:]), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt) + w(qkv_b[0, 2 * c:])

    # cosine per-head L2 norm via segment matmuls (f32 accumulation)
    seg = _seg_ch(c, h, cdt)      # (C, H)
    seg_t = _seg_hc(c, h, jnp.float32)  # (H, C)
    qs = jax.lax.dot_general(q * q, seg, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (S, H)
    rq = jax.lax.rsqrt(qs + 1e-12) * inv_tau  # (S, H) * (1, H)
    q = q * jax.lax.dot_general(
        rq, seg_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt)
    ks = jax.lax.dot_general(k * k, seg, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    rk = jax.lax.rsqrt(ks + 1e-12)
    k = k * jax.lax.dot_general(
        rk, seg_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt)

    # attention via head-block-diagonal expansion: logits/probs stay local
    k_t = jnp.swapaxes(k, 0, 1)  # (C, S)
    k_bd = (k_t[:, None, :] * _headmask_ch(c, h, cdt)).reshape(c, h * s)
    logits = jax.lax.dot_general(
        q, k_bd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (S, H*S)
    l3 = logits.reshape(s, h, s) + bias[:, None, :] + kb.reshape(1, 1, s)
    m = jnp.max(l3, axis=-1, keepdims=True)
    e = jnp.exp(l3 - m)
    p3 = e / jnp.sum(e, axis=-1, keepdims=True)
    p = p3.reshape(s, h * s).astype(cdt)
    v_bd = (v[None] * _headmask_hc(c, h, cdt)).reshape(h * s, c)
    att = jax.lax.dot_general(
        p, v_bd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt)

    so = jax.lax.dot_general(
        att, w(out_w), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt) + w(out_b[0])

    src = _layernorm(x + so, ln1_s[0], ln1_b[0]).astype(cdt)
    hmid = jax.lax.dot_general(
        src, w(w1), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt) + w(b1[0])
    # gelu form matches BucketEncoderLayer: tanh fast path by default,
    # exact erf under GDMAE_EXACT_GELU=1 (torch F.gelu parity flag)
    import os
    hmid = jax.nn.gelu(
        hmid, approximate=not os.environ.get("GDMAE_EXACT_GELU"))
    ffn = jax.lax.dot_general(
        hmid, w(w2), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt) + w(b2[0])
    out = _layernorm(src + ffn, ln2_s[0], ln2_b[0])
    return out.astype(cdt)


def _fwd_kernel(h, g, x_ref, pos_ref, kb_ref, bias_ref, *rest):
    param_refs, (o_ref,) = rest[:_N_PARAMS], rest[_N_PARAMS:]
    params = tuple(r[:] for r in param_refs)
    for gi in range(g):
        o_ref[gi] = _layer_block(
            x_ref[gi], pos_ref[gi], kb_ref[gi], bias_ref[gi], params, h)


def _bwd_kernel(h, g, x_ref, pos_ref, kb_ref, bias_ref, *rest):
    param_refs = rest[:_N_PARAMS]
    g_ref = rest[_N_PARAMS]
    dx_ref, dpos_ref = rest[_N_PARAMS + 1], rest[_N_PARAMS + 2]
    dparam_refs = rest[_N_PARAMS + 3:]
    params = tuple(r[:] for r in param_refs)

    dps_acc = None
    for gi in range(g):
        def f(x, pos, *ps):
            return _layer_block(x, pos, kb_ref[gi], bias_ref[gi], ps, h)

        _, vjp = jax.vjp(f, x_ref[gi], pos_ref[gi], *params)
        grads = vjp(g_ref[gi])
        dx_ref[gi] = grads[0]
        dpos_ref[gi] = grads[1]
        dps = grads[2:]
        dps_acc = dps if dps_acc is None else tuple(
            a + b for a, b in zip(dps_acc, dps))

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for r, dp in zip(dparam_refs, dps_acc):
            r[:] = dp

    @pl.when(step > 0)
    def _acc():
        for r, dp in zip(dparam_refs, dps_acc):
            r[:] = r[:] + dp


def _pick_group(n, nb):
    """Blocks per grid step: must divide n (grid) AND nb (so each step's
    bias window is g consecutive rows of the (NB, S, S) tiled bias)."""
    for g in (8, 4, 2):
        if n % g == 0 and nb % g == 0:
            return g
    return 1


def _param_specs(params):
    return [pl.BlockSpec(p.shape, (lambda i, nd=p.ndim: (0,) * nd))
            for p in params]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused_layer(h, nb_bias, interpret, x, pos, kb, bias, params):
    """x/pos (N, S, C); kb (N, 1, S) f32; bias (nb_bias, S, S) f32 tiled
    across N via ``i % nb_bias``; params: 13-tuple (see _layer_block)."""
    n, s, c = x.shape
    g = _pick_group(n, nb_bias)
    blk = pl.BlockSpec((g, s, c), lambda i: (i, 0, 0))
    kbb = pl.BlockSpec((g, 1, s), lambda i: (i, 0, 0))
    # g consecutive stream blocks i*g .. i*g+g-1 have per-sample block ids
    # (i*g+j) % nb; with g | nb that run is contiguous and g-aligned in the
    # tiled bias, so its BLOCK index is ((i*g) % nb) / g
    bb = pl.BlockSpec((g, s, s), lambda i: ((i * g) % nb_bias // g, 0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, h, g),
        out_shape=jax.ShapeDtypeStruct((n, s, c), x.dtype),
        grid=(n // g,),
        in_specs=[blk, blk, kbb, bb] + _param_specs(params),
        out_specs=blk,
        interpret=interpret,
    )(x, pos, kb, bias, *params)


def _fused_layer_fwd(h, nb_bias, interpret, x, pos, kb, bias, params):
    out = _fused_layer(h, nb_bias, interpret, x, pos, kb, bias, params)
    return out, (x, pos, kb, bias, params)


def _fused_layer_bwd(h, nb_bias, interpret, res, g_out):
    x, pos, kb, bias, params = res
    n, s, c = x.shape
    g = _pick_group(n, nb_bias)
    blk = pl.BlockSpec((g, s, c), lambda i: (i, 0, 0))
    kbb = pl.BlockSpec((g, 1, s), lambda i: (i, 0, 0))
    bb = pl.BlockSpec((g, s, s), lambda i: ((i * g) % nb_bias // g, 0, 0))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, h, g),
        out_shape=[jax.ShapeDtypeStruct((n, s, c), x.dtype)] * 2
        + [jax.ShapeDtypeStruct(p.shape, p.dtype) for p in params],
        grid=(n // g,),
        in_specs=[blk, blk, kbb, bb] + _param_specs(params) + [blk],
        out_specs=[blk, blk] + _param_specs(params),
        interpret=interpret,
    )(x, pos, kb, bias, *params, g_out)
    dx, dpos = outs[0], outs[1]
    dparams = tuple(outs[2:])
    return dx, dpos, None, None, dparams


_fused_layer.defvjp(_fused_layer_fwd, _fused_layer_bwd)


def fused_encoder_layer(x, pos, valid, bias_nb, params, nhead,
                        interpret: bool = False):
    """Full encoder layer over packed 128-token blocks, one fused kernel.

    Args:
        x, pos: (B, NB, S, C) packed token blocks / position embeds.
        valid: (B, NB, S) bool key-padding mask.
        bias_nb: (NB, S, S) f32 per-block sub-window bias
            (ops.window.packed_block_bias).
        params: 13-tuple of f32 parameter arrays (see ``_layer_block``);
            1-D vectors must be passed shaped (1, X).
        nhead: static head count.
    Returns:
        (B, NB, S, C) layer output; invalid token rows are garbage —
        callers mask (the packed scatter drops them regardless).
    """
    b, nb, s, c = x.shape
    kb = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)
    n = b * nb
    # pre-tile the per-block bias across the batch: +5 MB -> ~80 MB of
    # extra streaming per pass (~0.1 ms), but the grid group is no longer
    # pinned to divisors of NB (78 -> g=2 meant 4x more grid steps, and
    # per-step overhead dominated this backend's first fused-layer run)
    bias_t = jnp.tile(bias_nb, (b, 1, 1))
    out = _fused_layer(
        nhead, n, interpret,
        x.reshape(n, s, c), pos.reshape(n, s, c),
        kb.reshape(n, 1, s), bias_t, tuple(params))
    return out.reshape(b, nb, s, c)


def reference_encoder_layer(x, pos, valid, bias_nb, params, nhead):
    """Pure-XLA oracle: same math per block, vmapped (tests/CPU)."""
    b, nb, s, c = x.shape
    kb = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)

    def one(xb, pb, kbb, bb):
        return _layer_block(xb, pb, kbb[None], bb, tuple(params), nhead)

    return jax.vmap(
        lambda xs, ps, ks: jax.vmap(one)(xs, ps, ks, bias_nb)
    )(x, pos, kb)


# ---------------------------------------------------------------------------
# wid variant: per-slot window-id mask (JointPlan packing) instead of a
# static per-block sub-window bias.  The (S, S) bias never exists in HBM —
# each grid step rebuilds it in VMEM from the block's (1, S) int32 wid row.
# ---------------------------------------------------------------------------

def _wid_bias(wrow):
    """(1, S) int32 window ids -> (S, S) f32 additive bias (0 where
    wid[t] == wid[s], -1e9 across windows)."""
    s = wrow.shape[-1]
    return jnp.where(wrow.reshape(s, 1) == wrow.reshape(1, s),
                     jnp.float32(0.0), jnp.float32(-1e9))


def _fwd_kernel_wid(h, g, x_ref, pos_ref, kb_ref, wid_ref, *rest):
    param_refs, (o_ref,) = rest[:_N_PARAMS], rest[_N_PARAMS:]
    params = tuple(r[:] for r in param_refs)
    for gi in range(g):
        o_ref[gi] = _layer_block(
            x_ref[gi], pos_ref[gi], kb_ref[gi], _wid_bias(wid_ref[gi]),
            params, h)


def _bwd_kernel_wid(h, g, x_ref, pos_ref, kb_ref, wid_ref, *rest):
    param_refs = rest[:_N_PARAMS]
    g_ref = rest[_N_PARAMS]
    dx_ref, dpos_ref = rest[_N_PARAMS + 1], rest[_N_PARAMS + 2]
    dparam_refs = rest[_N_PARAMS + 3:]
    params = tuple(r[:] for r in param_refs)

    dps_acc = None
    for gi in range(g):
        def f(x, pos, *ps):
            return _layer_block(
                x, pos, kb_ref[gi], _wid_bias(wid_ref[gi]), ps, h)

        _, vjp = jax.vjp(f, x_ref[gi], pos_ref[gi], *params)
        grads = vjp(g_ref[gi])
        dx_ref[gi] = grads[0]
        dpos_ref[gi] = grads[1]
        dps = grads[2:]
        dps_acc = dps if dps_acc is None else tuple(
            a + b for a, b in zip(dps_acc, dps))

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for r, dp in zip(dparam_refs, dps_acc):
            r[:] = dp

    @pl.when(step > 0)
    def _acc():
        for r, dp in zip(dparam_refs, dps_acc):
            r[:] = r[:] + dp


def _pick_group_n(n, s=128, c=128, h=8, f=256):
    """Blocks per grid step: must divide n, and the unrolled per-block
    jax.vjp residuals of the backward kernel plus the f32 params and their
    grad accumulators must fit scoped VMEM (~16 MiB; measured 26.6 MiB at
    c=256, h=8, f=512, g=8 — 10.6 MiB over the limit).  Per-block residual
    estimate: 3 f32 (S, H·S) logit-sized arrays + ~20 bf16 (S, C) token
    arrays + 4 bf16 (S, F) FFN-hidden arrays, calibrated ×0.85 against the
    measured overflow."""
    per_block = int(0.85 * (3 * s * h * s * 4 + 20 * s * c * 2
                            + 4 * s * f * 2))
    param_f32 = c * 3 * c + 3 * c + h + c * c + c * f + f + f * c + 5 * c
    budget = 14 * 2 ** 20 - 2 * 4 * param_f32  # params + grad accumulators
    for g in (8, 4, 2):
        if n % g == 0 and g * per_block <= budget:
            return g
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_layer_wid(h, interpret, x, pos, kb, wid, params):
    """x/pos (N, S, C); kb (N, 1, S) f32; wid (N, 1, S) int32; params:
    13-tuple (see _layer_block)."""
    n, s, c = x.shape
    g = _pick_group_n(n, s=s, c=c, h=h, f=params[7].shape[1])
    blk = pl.BlockSpec((g, s, c), lambda i: (i, 0, 0))
    row = pl.BlockSpec((g, 1, s), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel_wid, h, g),
        out_shape=jax.ShapeDtypeStruct((n, s, c), x.dtype),
        grid=(n // g,),
        in_specs=[blk, blk, row, row] + _param_specs(params),
        out_specs=blk,
        interpret=interpret,
    )(x, pos, kb, wid, *params)


def _fused_layer_wid_fwd(h, interpret, x, pos, kb, wid, params):
    out = _fused_layer_wid(h, interpret, x, pos, kb, wid, params)
    return out, (x, pos, kb, wid, params)


def _fused_layer_wid_bwd(h, interpret, res, g_out):
    x, pos, kb, wid, params = res
    n, s, c = x.shape
    g = _pick_group_n(n, s=s, c=c, h=h, f=params[7].shape[1])
    blk = pl.BlockSpec((g, s, c), lambda i: (i, 0, 0))
    row = pl.BlockSpec((g, 1, s), lambda i: (i, 0, 0))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel_wid, h, g),
        out_shape=[jax.ShapeDtypeStruct((n, s, c), x.dtype)] * 2
        + [jax.ShapeDtypeStruct(p.shape, p.dtype) for p in params],
        grid=(n // g,),
        in_specs=[blk, blk, row, row] + _param_specs(params) + [blk],
        out_specs=[blk, blk] + _param_specs(params),
        interpret=interpret,
    )(x, pos, kb, wid, *params, g_out)
    dx, dpos = outs[0], outs[1]
    dparams = tuple(outs[2:])
    return dx, dpos, None, None, dparams


_fused_layer_wid.defvjp(_fused_layer_wid_fwd, _fused_layer_wid_bwd)


def fused_encoder_layer_wid(x, pos, valid, wid, params, nhead,
                            interpret: bool = False):
    """Full encoder layer over JointPlan-packed 128-token blocks, one fused
    kernel; attention is masked by per-slot window id (query t attends key
    s iff ``wid[t] == wid[s]`` and the key is valid) instead of the static
    per-block bias of :func:`fused_encoder_layer`.

    Args:
        x, pos: (B, NB, S, C) packed token blocks / position embeds.
        valid: (B, NB, S) bool key-padding mask.
        wid: (B, NB, S) int32 per-slot window ids (-1 on padding; padding
            slots are also valid=False so -1 == -1 matches are masked).
        params: 13-tuple of f32 parameter arrays (see ``_layer_block``).
        nhead: static head count.
    Returns:
        (B, NB, S, C); invalid token rows are garbage (callers mask, or the
        inverse-index scatter drops them).
    """
    b, nb, s, c = x.shape
    kb = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)
    n = b * nb
    out = _fused_layer_wid(
        nhead, interpret,
        x.reshape(n, s, c), pos.reshape(n, s, c),
        kb.reshape(n, 1, s), wid.reshape(n, 1, s), tuple(params))
    return out.reshape(b, nb, s, c)


def reference_encoder_layer_wid(x, pos, valid, wid, params, nhead):
    """Pure-XLA oracle for :func:`fused_encoder_layer_wid` (tests/CPU)."""
    b, nb, s, c = x.shape
    kb = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)

    def one(xb, pb, kbb, wb):
        return _layer_block(xb, pb, kbb[None], _wid_bias(wb[None]),
                            tuple(params), nhead)

    return jax.vmap(jax.vmap(one))(x, pos, kb, wid)


# ---------------------------------------------------------------------------
# Attention-core flash kernel (joint/wid packing): ONLY the masked softmax
# attention — QK^T, wid mask, softmax, PV — fused per 128-token block, with
# projections / FFN / LayerNorms left to XLA (which stores their activations,
# so the backward recompute here re-pays only two small matmuls, not the
# whole layer the way fused_encoder_layer_wid's backward does).
#
# Wins over the XLA einsum path (sst_layers wid route):
#   * logits and probabilities never exist in HBM (fwd OR bwd);
#   * no (B, NB, H, T, hd) head-major tensors — hd = 16/32 minor dims pad
#     8x/4x in (8, 128) HBM tiles; inputs stay token-major (N, S, C);
#   * the (B, NB, T, T) wid-equality mask is rebuilt in VMEM per block.
# ---------------------------------------------------------------------------


def _attn_block(q, k, v, kb, bias, h):
    """Masked multi-head attention core for one (S, C) token block.

    q is expected pre-scaled (cosine 1/tau or 1/sqrt(hd) folded in by the
    caller).  Per-head split uses the head-block-diagonal expansion — no
    (S, H, hd) reshapes (see module docstring of this section).

    Args:
        q, k, v: (S, C) compute-dtype; kb: (1, S) f32 key-padding bias;
        bias: (S, S) f32 window mask bias; h: static head count.
    Returns:
        (S, C) attention output (pre out-projection), q.dtype.
    """
    s, c = q.shape
    cdt = q.dtype
    k_t = jnp.swapaxes(k, 0, 1)  # (C, S)
    k_bd = (k_t[:, None, :] * _headmask_ch(c, h, cdt)).reshape(c, h * s)
    logits = jax.lax.dot_general(
        q, k_bd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (S, H*S)
    l3 = logits.reshape(s, h, s) + bias[:, None, :] + kb.reshape(1, 1, s)
    m = jnp.max(l3, axis=-1, keepdims=True)
    e = jnp.exp(l3 - m)
    p3 = e / jnp.sum(e, axis=-1, keepdims=True)
    p = p3.reshape(s, h * s).astype(cdt)
    v_bd = (v[None] * _headmask_hc(c, h, cdt)).reshape(h * s, c)
    return jax.lax.dot_general(
        p, v_bd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt)


def _flash_fwd_kernel(h, g, q_ref, k_ref, v_ref, kb_ref, wid_ref, o_ref):
    for gi in range(g):
        o_ref[gi] = _attn_block(
            q_ref[gi], k_ref[gi], v_ref[gi], kb_ref[gi],
            _wid_bias(wid_ref[gi]), h)


def _flash_bwd_kernel(h, g, q_ref, k_ref, v_ref, kb_ref, wid_ref, g_ref,
                      dq_ref, dk_ref, dv_ref):
    for gi in range(g):
        def f(q, k, v):
            return _attn_block(q, k, v, kb_ref[gi], _wid_bias(wid_ref[gi]), h)

        _, vjp = jax.vjp(f, q_ref[gi], k_ref[gi], v_ref[gi])
        dq, dk, dv = vjp(g_ref[gi])
        dq_ref[gi] = dq
        dk_ref[gi] = dk
        dv_ref[gi] = dv


def _flash_group(n, s, c, h):
    """Blocks per grid step: divide n; keep the unrolled per-block working
    set (f32 logit-sized arrays + token blocks) inside scoped VMEM."""
    per_block = 4 * s * h * s * 4 + 10 * s * c * 2
    for g in (8, 4, 2):
        if n % g == 0 and g * per_block <= 12 * 2 ** 20:
            return g
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _flash_attn(h, interpret, q, k, v, kb, wid):
    n, s, c = q.shape
    g = _flash_group(n, s, c, h)
    blk = pl.BlockSpec((g, s, c), lambda i: (i, 0, 0))
    row = pl.BlockSpec((g, 1, s), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_flash_fwd_kernel, h, g),
        out_shape=jax.ShapeDtypeStruct((n, s, c), q.dtype),
        grid=(n // g,),
        in_specs=[blk, blk, blk, row, row],
        out_specs=blk,
        interpret=interpret,
    )(q, k, v, kb, wid)


def _flash_attn_fwd(h, interpret, q, k, v, kb, wid):
    return _flash_attn(h, interpret, q, k, v, kb, wid), (q, k, v, kb, wid)


def _flash_attn_bwd(h, interpret, res, g_out):
    q, k, v, kb, wid = res
    n, s, c = q.shape
    g = _flash_group(n, s, c, h)
    blk = pl.BlockSpec((g, s, c), lambda i: (i, 0, 0))
    row = pl.BlockSpec((g, 1, s), lambda i: (i, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_kernel, h, g),
        out_shape=[jax.ShapeDtypeStruct((n, s, c), q.dtype)] * 3,
        grid=(n // g,),
        in_specs=[blk, blk, blk, row, row, blk],
        out_specs=[blk, blk, blk],
        interpret=interpret,
    )(q, k, v, kb, wid, g_out)
    return dq, dk, dv, None, None


_flash_attn.defvjp(_flash_attn_fwd, _flash_attn_bwd)


def wid_flash_attention(q, k, v, valid, wid, nhead, interpret: bool = False):
    """Masked window attention over JointPlan-packed 128-token blocks as one
    flash-style Pallas kernel: query t attends key s iff ``wid[t] == wid[s]``
    and the key is valid.  Numerics match
    ``window_attention.wid_window_attention`` modulo its bf16-logits option
    (logits here are always f32, in VMEM — the bandwidth motivation for
    bf16 logits does not apply).

    Args:
        q, k, v: (B, NB, S, C) token-major packed blocks; q pre-scaled
            (cosine 1/tau or 1/sqrt(hd) folded in).
        valid: (B, NB, S) bool key mask; wid: (B, NB, S) int32 window ids
            (-1 on padding; padding is also valid=False).
        nhead: static head count.
    Returns:
        (B, NB, S, C) attention output (pre out-projection); invalid token
        rows are garbage (callers mask, or the packed scatter drops them).
    """
    b, nb, s, c = q.shape
    n = b * nb
    kb = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)
    out = _flash_attn(
        nhead, interpret,
        q.reshape(n, s, c), k.reshape(n, s, c), v.reshape(n, s, c),
        kb.reshape(n, 1, s), wid.reshape(n, 1, s))
    return out.reshape(b, nb, s, c)


def reference_wid_flash_attention(q, k, v, valid, wid, nhead):
    """Pure-XLA oracle for :func:`wid_flash_attention` (tests/CPU)."""
    b, nb, s, c = q.shape
    kb = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)

    def one(qb, kbk, vb, kbb, wb):
        return _attn_block(qb, kbk, vb, kbb[None], _wid_bias(wb[None]), nhead)

    return jax.vmap(jax.vmap(one))(q, k, v, kb, wid)
