"""SST window-transformer layers on bucketed tokens.

TPU-native re-design of the reference transformer stack
(pcdet/models/model_utils/sst_basic_block.py ``WindowAttention`` /
``EncoderLayer`` / ``BasicShiftBlockV2`` and
pcdet/models/model_utils/cosine_msa.py ``CosineMultiheadAttention``).

The reference keeps a ragged token list and converts it to a dict of padded
``[num_windows, max_tokens, C]`` tensors per drop level for attention, then
back for the FFN.  Here tokens live on a dense BEV canvas; an entire encoder
layer (attention + FFN, post-norm) runs in the compact bucket layout and the
result is scattered back, so matmuls stay large and batched for the MXU and
no per-level Python raggedness survives tracing.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import window as window_ops


def gelu(x, exact: Optional[bool] = None):
    """GELU with a fast-by-default TPU form.

    torch ``F.gelu``'s default is the exact erf form (reference
    sst_basic_block.py:117-121).  On this chip the erf lowering measurably
    slows the packed encoder FFNs versus the tanh approximation; the
    gradient deviation of the tanh form through the full detection graph is
    pinned by tests/test_train_trajectory.py::
    test_gelu_fast_path_gradient_deviation — so tanh is the default.

    ``exact`` — the model-config choice (``LAYER_CFG.exact_gelu`` in the
    yaml, recorded with the run).  ``None`` falls back to the
    ``GDMAE_EXACT_GELU=1`` process flag (set by the torch-parity tests)."""
    if exact is None:
        import os
        exact = bool(os.environ.get("GDMAE_EXACT_GELU"))
    return nn.gelu(x, approximate=not exact)


class CosineMultiheadAttention(nn.Module):
    """Multi-head self-attention with optional cosine (scaled-cosine)
    similarity and a learnable temperature ``tau`` clamped at ``tau_min``
    (reference cosine_msa.py:114-178, :441-458; enabled by config
    LAYER_CFG {cosine: True, tau_min: 0.01}).

    Operates on (..., T, C) window buckets with a (..., T) validity mask —
    typically (B, W, T, C) per-sample buckets, which keeps data-parallel
    sharding collective-free.
    """

    d_model: int
    nhead: int
    cosine: bool = True
    tau_min: float = 0.01
    non_shared_tau: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, qk: jnp.ndarray, v: jnp.ndarray, valid: jnp.ndarray,
                 block_ts: Optional[Tuple[int, ...]] = None,
                 wid: Optional[jnp.ndarray] = None,
                 pos_incell: Optional[jnp.ndarray] = None,
                 pos_table: Optional[jnp.ndarray] = None):
        """qk/v: (..., T, C); valid: (..., T).  ``block_ts`` (static tuple,
        one sub-window size per 128-token block) marks the packed-block
        layout and routes to the fused Pallas kernel (XLA biased-einsum
        fallback elsewhere).  ``wid`` ((..., T) int32 window ids) marks the
        JOINT-packed layout (ops.window.JointPlan): the attention mask is
        wid equality instead of a static per-block structure.

        ``pos_incell``/``pos_table``: position-projection FOLD.  The
        sinusoidal window pos-embed takes only ``wy*wx`` distinct values, so
        instead of the caller materializing pos and paying a separate
        ``(feats+pos) @ W_qk`` dot next to the ``feats @ W_v`` dot, pass
        ``qk = v = feats`` plus the (W_cells, C) table and the per-slot
        in-window cell: q/k/v come from ONE ``feats @ W`` (C, 3C) dot and
        the pos contribution is added post-projection through the
        constant-folded ``table @ W_qk`` (W_cells, 2C) lookup (exact in
        real arithmetic — matmul distributivity)."""
        *lead, t, c = qk.shape
        h = self.nhead
        hd = c // h
        # torch MHA packs q/k/v projections into one in_proj (with bias)
        qkv_w = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (c, 3 * c), jnp.float32
        )
        qkv_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * c,), jnp.float32)
        if pos_incell is not None:
            # one (C, 3C) dot on feats; pos added after projection via the
            # tiny table product (one-hot matmul keeps the backward on the
            # MXU — a take() would transpose to a 64-row scatter-add)
            qkv = qk @ qkv_w.astype(self.dtype) + qkv_b.astype(self.dtype)
            tbl_qk = (pos_table.astype(jnp.float32)
                      @ qkv_w[:, : 2 * c]).astype(self.dtype)
            oh = (pos_incell[..., None]
                  == jnp.arange(pos_table.shape[0],
                                dtype=pos_incell.dtype)).astype(self.dtype)
            qk2 = qkv[..., : 2 * c] + oh @ tbl_qk
            q, k = qk2[..., :c], qk2[..., c:]
            vv = qkv[..., 2 * c:]
        else:
            # q and k share the same input: ONE (C, 2C) matmul instead of
            # two
            qk2 = qk @ qkv_w[:, : 2 * c].astype(self.dtype) \
                + qkv_b[: 2 * c].astype(self.dtype)
            q, k = qk2[..., :c], qk2[..., c:]
            vv = v @ qkv_w[:, 2 * c :].astype(self.dtype) \
                + qkv_b[2 * c :].astype(self.dtype)

        # per-head scaling applied on the FLAT (..., T, C) layout — no
        # (..., H, T, hd) tensor is materialized (hd=16 minor dims pad 8x
        # in (8,128) HBM tiles)
        if self.cosine:
            tau_shape = (h, 1, 1) if self.non_shared_tau else (1, 1, 1)
            tau = self.param("tau", nn.initializers.ones, tau_shape, jnp.float32)
            # (H, 1) or (1, 1): broadcasts against the (..., T, H, 1) norms
            inv_tau = (1.0 / jnp.maximum(tau, self.tau_min)) \
                .astype(self.dtype).reshape(-1, 1)

            def norm_flat(x, scale=None):
                x4 = x.reshape(*x.shape[:-1], h, hd)
                r = jax.lax.rsqrt(
                    jnp.sum(jnp.square(x4), -1, keepdims=True) + 1e-12)
                if scale is not None:
                    r = r * scale
                return (x4 * r).reshape(*x.shape)

            q = norm_flat(q, inv_tau)
            k = norm_flat(k)
        else:
            q = q / jnp.sqrt(float(hd)).astype(q.dtype)

        import os

        from ...ops.pallas.window_attention import (
            biased_window_attention, biased_window_attention_tokmajor,
            blocked_window_attention, fused_window_attention,
            packed_window_mha, reference_window_attention,
            wid_window_attention)

        if wid is not None:
            b, nb = lead
            if os.environ.get("GDMAE_ABLATE_MHA"):  # profiling-only knob
                out = vv * valid[..., None].astype(vv.dtype) \
                    + q.sum() * 1e-30 + k.sum() * 1e-30
            elif jax.devices()[0].platform != "cpu" and t == 128 and \
                    os.environ.get("GDMAE_WID_FLASH", "0") != "0":
                # flash attention core (ops.pallas.fused_encoder): logits /
                # probs / wid mask live only in VMEM, inputs stay
                # token-major (no head-major (B, NB, H, T, hd) HBM tensors).
                # OPT-IN: measured 341.6 vs 312.7 ms full step at MAE-bench
                # batch 16 — the per-grid-step overhead + H-fold logit
                # expansion loses to XLA's einsum here (PERFORMANCE.md)
                from ...ops.pallas.fused_encoder import wid_flash_attention
                out = wid_flash_attention(q, k, vv, valid, wid, h)
            else:
                def heads(x):
                    return jnp.moveaxis(x.reshape(b, nb, t, h, hd), -2, -3)

                out = jax.checkpoint(
                    wid_window_attention, static_argnums=(5,))(
                    heads(q), heads(k), heads(vv), valid, wid, self.cosine)
                out = jnp.moveaxis(out, -3, -2).reshape(b, nb, t, c)
            out = out.astype(self.dtype)
            out = nn.Dense(c, dtype=self.dtype, name="out_proj")(out)
            return out * valid[..., None].astype(out.dtype)

        if block_ts is not None:
            b, nb = lead
            if os.environ.get("GDMAE_ABLATE_MHA"):  # profiling-only knob:
                # projections + mask kept, attention mixing skipped
                out = vv * valid[..., None].astype(vv.dtype) \
                    + q.sum() * 1e-30 + k.sum() * 1e-30
                out = nn.Dense(c, dtype=self.dtype, name="out_proj")(out)
                return out * valid[..., None].astype(out.dtype)
            # the Pallas kernel measured ~par with (not yet faster than)
            # the XLA biased-einsum path on v5e, so it stays opt-in
            if jax.devices()[0].platform != "cpu" and t == 128 and \
                    os.environ.get("GDMAE_PALLAS_PACKED"):
                out = packed_window_mha(
                    q.reshape(b, nb * t, c), k.reshape(b, nb * t, c),
                    vv.reshape(b, nb * t, c), valid.reshape(b, nb * t),
                    block_ts, h).reshape(b, nb, t, c)
            elif os.environ.get("GDMAE_TOKMAJOR_ATTN"):
                # A/B: head split inside the einsum contraction instead of
                # explicit moveaxis — measured NEUTRAL on v5e (384 vs 374 ms
                # full step; XLA already folds the transposes into the dots)
                bias = window_ops.packed_block_bias(block_ts)
                out = jax.checkpoint(
                    biased_window_attention_tokmajor, static_argnums=(5, 6))(
                    q, k, vv, valid, bias, self.cosine, h)
            else:
                bias = window_ops.packed_block_bias(block_ts)

                def heads(x):
                    return jnp.moveaxis(x.reshape(b, nb, t, h, hd), -2, -3)

                out = jax.checkpoint(
                    biased_window_attention, static_argnums=(5,))(
                    heads(q), heads(k), heads(vv), valid, bias, self.cosine)
                out = jnp.moveaxis(out, -3, -2).reshape(b, nb, t, c)
            out = out.astype(self.dtype)
            out = nn.Dense(c, dtype=self.dtype, name="out_proj")(out)
            return out * valid[..., None].astype(out.dtype)

        def heads(x):  # (..., T, C) -> (..., H, T, hd)
            x = x.reshape(*lead, t, h, hd)
            return jnp.moveaxis(x, -2, -3)

        q, k, vv = heads(q), heads(k), heads(vv)

        # measured on v5e: XLA's batched einsum beats the per-window Pallas
        # kernel at these T/D sizes (grid-step overhead dominates); the
        # fused kernel stays available for larger-window configs
        if jax.devices()[0].platform != "cpu" and \
                os.environ.get("GDMAE_ENABLE_PALLAS_ATTN"):
            # rows belonging to invalid queries may be garbage; zeroed below
            wtot = int(np.prod(lead)) if lead else 1
            out = fused_window_attention(
                q.reshape(wtot, h, t, hd), k.reshape(wtot, h, t, hd),
                vv.reshape(wtot, h, t, hd), valid.reshape(wtot, t))
            out = out.reshape(*lead, h, t, hd)
        elif len(lead) == 2 and t < 128 and \
                not os.environ.get("GDMAE_NO_BLOCKED_ATTN"):
            # block-diagonal packing fills full (8, 128) HBM tiles (2-8x
            # less logits traffic than per-window (T, T)); checkpoint makes
            # it flash-style in memory (probs recomputed in the bwd pass)
            out = jax.checkpoint(blocked_window_attention)(q, k, vv, valid)
        else:
            # flash-style memory behavior for the einsum path: recompute
            # logits+softmax in the backward pass instead of storing the
            # f32 (..., H, T, T) probabilities (they pad 2-4x in HBM tiles
            # and were the last obstacle to batch-32 no-remat on 16G chips)
            out = jax.checkpoint(reference_window_attention)(q, k, vv, valid)
        out = out.astype(self.dtype)
        out = jnp.moveaxis(out, -3, -2).reshape(*lead, t, c)
        out = nn.Dense(c, dtype=self.dtype, name="out_proj")(out)
        return out * valid[..., None].astype(out.dtype)


class FusedAddLayerNorm(nn.Module):
    """``LayerNorm(x + res)`` — one fused HBM pass on TPU (Pallas), XLA
    fallback elsewhere.  Parameter names match ``nn.LayerNorm`` (scale/bias)
    so checkpoints are interchangeable with the unfused layer."""

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, res):
        import os

        from ...ops.pallas.fused_layernorm import (
            fused_add_layernorm, reference_add_layernorm)

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        # measured on v5e: XLA fuses add+LN well (2.6 ms fwd+bwd at 163k x 128)
        # while Mosaic kernels pay heavy per-grid-step overhead through this
        # backend — the Pallas path stays opt-in
        if jax.devices()[0].platform != "cpu" and \
                os.environ.get("GDMAE_ENABLE_PALLAS_LN"):
            return fused_add_layernorm(x, res, scale, bias, eps=self.epsilon)
        return reference_add_layernorm(x, res, scale, bias, self.epsilon)


class BucketEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer applied per drop-level bucket
    (reference sst_basic_block.py:57-84 EncoderLayer).  Same parameters are
    shared across drop levels (the reference loops levels through one MHA)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    activation: str = "gelu"
    cosine: bool = True
    tau_min: float = 0.01
    exact_gelu: Optional[bool] = None  # LAYER_CFG.exact_gelu; None -> env
    dtype: Any = jnp.float32

    def setup(self):
        self.win_attn = CosineMultiheadAttention(
            self.d_model, self.nhead, cosine=self.cosine, tau_min=self.tau_min,
            dtype=self.dtype,
        )
        self.linear1 = nn.Dense(self.dim_feedforward, dtype=self.dtype)
        self.linear2 = nn.Dense(self.d_model, dtype=self.dtype)
        self.norm1 = FusedAddLayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm2 = FusedAddLayerNorm(epsilon=1e-5, dtype=self.dtype)

    def _act(self, x):
        if self.activation == "gelu":
            return gelu(x, self.exact_gelu)
        if self.activation == "relu":
            return nn.relu(x)
        raise NotImplementedError(self.activation)

    def __call__(self, feats, pos, valid, block_ts=None, wid=None,
                 pos_incell=None, pos_table=None):
        """feats/pos: (..., T, C); valid: (..., T).  With
        ``pos_incell``/``pos_table`` the caller passes ``pos=None`` and the
        position embed folds into the attention projections (see
        CosineMultiheadAttention)."""
        import os
        if pos_incell is not None:
            src2 = self.win_attn(feats, feats, valid, block_ts=block_ts,
                                 wid=wid, pos_incell=pos_incell,
                                 pos_table=pos_table)
        else:
            src2 = self.win_attn(feats + pos, feats, valid, block_ts=block_ts,
                                 wid=wid)
        src = self.norm1(feats, src2)
        if not os.environ.get("GDMAE_ABLATE_FFN"):  # profiling-only knob
            src2 = self.linear2(self._act(self.linear1(src)))
            src = self.norm2(src, src2)
        return src * valid[..., None].astype(src.dtype)


class _DenseParams(nn.Module):
    """Parameter-holder matching ``nn.Dense``'s tree (kernel/bias) so the
    fused encoder layer shares checkpoints with the unfused one."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return k, b


class _MHAParams(nn.Module):
    """Parameter-holder matching :class:`CosineMultiheadAttention`'s tree."""

    d_model: int
    nhead: int
    non_shared_tau: bool = False

    @nn.compact
    def __call__(self):
        c = self.d_model
        w = self.param("in_proj_weight", nn.initializers.xavier_uniform(),
                       (c, 3 * c), jnp.float32)
        bi = self.param("in_proj_bias", nn.initializers.zeros,
                        (3 * c,), jnp.float32)
        tau_shape = (self.nhead, 1, 1) if self.non_shared_tau else (1, 1, 1)
        tau = self.param("tau", nn.initializers.ones, tau_shape, jnp.float32)
        ko, bo = _DenseParams(c, c, name="out_proj")()
        return w, bi, tau, ko, bo


class _LNParams(nn.Module):
    """Parameter-holder matching ``nn.LayerNorm``/:class:`FusedAddLayerNorm`."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return s, b


class FusedBucketEncoderLayer(nn.Module):
    """Drop-in replacement for :class:`BucketEncoderLayer` on the packed
    128-token block path, computing the ENTIRE post-norm encoder layer in
    one Pallas kernel per direction (ops.pallas.fused_encoder) — logits,
    probabilities, FFN hidden and every residual stay in VMEM.

    The parameter tree is identical to :class:`BucketEncoderLayer`
    (win_attn/{in_proj_weight,in_proj_bias,tau,out_proj}, norm1/2,
    linear1/2), so checkpoints are interchangeable and the torch importer
    needs no changes.  Requires cosine attention, gelu, and the packed
    block layout (callers fall back to the unfused layer otherwise)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    activation: str = "gelu"
    cosine: bool = True
    tau_min: float = 0.01
    # accepted for constructor uniformity with BucketEncoderLayer; the
    # Pallas kernel only implements the env-var gelu form, so callers route
    # explicit config choices to the unfused layer (see CanvasShiftBlock)
    exact_gelu: Optional[bool] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, pos, valid, block_ts=None, wid=None):
        from ...ops.pallas.fused_encoder import (
            fused_encoder_layer, fused_encoder_layer_wid,
            reference_encoder_layer, reference_encoder_layer_wid)

        assert (block_ts is not None or wid is not None) and self.cosine \
            and self.activation == "gelu", (
                "FusedBucketEncoderLayer requires the packed block layout "
                "(block_ts or wid) with cosine attention and gelu")
        c, h, f = self.d_model, self.nhead, self.dim_feedforward
        w, bi, tau, ko, bo = _MHAParams(c, h, name="win_attn")()
        ln1s, ln1b = _LNParams(c, name="norm1")()
        w1, b1 = _DenseParams(c, f, name="linear1")()
        w2, b2 = _DenseParams(f, c, name="linear2")()
        ln2s, ln2b = _LNParams(c, name="norm2")()

        inv_tau = (1.0 / jnp.maximum(tau, self.tau_min)).reshape(1, -1)
        if inv_tau.shape[1] != h:  # shared tau -> broadcast per head
            inv_tau = jnp.broadcast_to(inv_tau, (1, h))
        row = lambda x: x.reshape(1, -1)
        params = (w, row(bi), inv_tau, ko, row(bo), row(ln1s), row(ln1b),
                  w1, row(b1), w2, row(b2), row(ln2s), row(ln2b))
        x = feats.astype(self.dtype)
        p = pos.astype(self.dtype)
        on_cpu = jax.devices()[0].platform == "cpu"
        if wid is not None:
            if on_cpu:
                out = reference_encoder_layer_wid(x, p, valid, wid, params, h)
            else:
                out = fused_encoder_layer_wid(x, p, valid, wid, params, h)
        else:
            bias = window_ops.packed_block_bias(block_ts)
            if on_cpu:
                out = reference_encoder_layer(x, p, valid, bias, params, h)
            else:
                out = fused_encoder_layer(x, p, valid, bias, params, h)
        return out * valid[..., None].astype(out.dtype)


class DenseWindowShiftBlock(nn.Module):
    """Two encoder layers alternating shift0/shift1 over DENSE canvas
    windows — opt-in via ``TPU_WINDOW_MODE: dense`` (SPTBackbone defaults
    to ``bucket``).

    TPU-first re-design of the reference's drop-level bucketing
    (pcdet/models/backbones_3d/spt_backbone.py:32-104 ``drop_voxel`` +
    sst_utils.py:68-104 ``get_flat2win_inds``): with the shipped 8x8
    windows, ``max_tokens`` (64) equals the window cell count, so the
    reference's buckets exist purely to reduce *GPU padding* — they never
    drop tokens.  On TPU the padded form IS the dense canvas, so window
    partition becomes two reshapes, the in-window position embedding is a
    trace-time constant shared by every window, and the entire plan/
    compaction machinery (measured ~600 ms/step at KITTI scale) vanishes.
    Attention masks by cell occupancy; empty cells stay zero.

    Parameter tree matches :class:`CanvasShiftBlock` (``encoder_0``/
    ``encoder_1`` with shared :class:`BucketEncoderLayer` weights), so
    checkpoints are interchangeable between window modes.
    """

    d_model: int
    nhead: int
    dim_feedforward: int
    window: Tuple[int, int]
    pos_temperature: float = 1000.0
    normalize_pos: bool = False
    activation: str = "gelu"
    cosine: bool = True
    tau_min: float = 0.01
    exact_gelu: Optional[bool] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, canvas, occ):
        """canvas: (B, Ny, Nx, C); occ: (B, Ny, Nx) bool."""
        wy, wx = self.window
        b, ny, nx, c = canvas.shape

        # in-window coords are identical for every window: the position
        # embedding is ONE (wy*wx, C) constant, broadcast across windows
        yx = np.stack(
            np.meshgrid(np.arange(wy), np.arange(wx), indexing="ij"),
            axis=-1).reshape(wy * wx, 2)
        pos = window_ops.sinusoidal_pos_embed(
            jnp.asarray(yx, jnp.int32), self.window, self.d_model,
            pos_temperature=self.pos_temperature,
            normalize_pos=self.normalize_pos, dtype=jnp.float32,
        ).astype(canvas.dtype)  # (wy*wx, C)

        for i in range(2):
            sy, sx = (0, 0) if i % 2 == 0 else (wy // 2, wx // 2)
            layer = BucketEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward,
                activation=self.activation, cosine=self.cosine,
                tau_min=self.tau_min, exact_gelu=self.exact_gelu,
                dtype=self.dtype, name=f"encoder_{i}",
            )
            nwy = -(-(ny + sy) // wy)
            nwx = -(-(nx + sx) // wx)
            py = nwy * wy - ny - sy
            px = nwx * wx - nx - sx
            xp = jnp.pad(canvas, ((0, 0), (sy, py), (sx, px), (0, 0)))
            vp = jnp.pad(occ, ((0, 0), (sy, py), (sx, px)))
            xw = xp.reshape(b, nwy, wy, nwx, wx, c)
            xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(b, nwy * nwx, wy * wx, c)
            vw = vp.reshape(b, nwy, wy, nwx, wx)
            vw = vw.transpose(0, 1, 3, 2, 4).reshape(b, nwy * nwx, wy * wx)
            out = layer(xw, pos, vw)  # (B, G, wy*wx, C); invalid rows zeroed
            out = out.reshape(b, nwy, nwx, wy, wx, c)
            out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, nwy * wy, nwx * wx, c)
            canvas = out[:, sy:sy + ny, sx:sx + nx]
        return canvas


class CanvasShiftBlock(nn.Module):
    """Two encoder layers alternating shift0/shift1 window layouts over a
    compact token-row tensor (reference sst_basic_block.py:87-114
    BasicShiftBlockV2).

    Each layer: gather token rows into per-level buckets for its shift, run
    the bucket encoder layer on every level (shared weights), write the
    updated tokens back (a pure gather through the plan's inverse index).
    ``rows`` is (B, M, C) — either a compact token list with token-space
    plans (ops.window.plan_to_tokens), or a flattened canvas (B, Ny*Nx, C)
    with canvas-space plans; the layers only see bucket tensors either way.
    All indexing stays within each sample, so a data-parallel mesh shards
    this with zero collectives.
    """

    d_model: int
    nhead: int
    dim_feedforward: int
    window: Tuple[int, int]
    pos_temperature: float = 1000.0
    normalize_pos: bool = False
    activation: str = "gelu"
    cosine: bool = True
    tau_min: float = 0.01
    exact_gelu: Optional[bool] = None
    fused_layer: bool = False  # TPU_FUSED_LAYER: one Pallas kernel per layer
    # TPU_POS_FOLD: fold the window pos-embed into the attention
    # projections (one (C, 3C) qkv dot + a (wy*wx, 2C) table add) instead
    # of materializing packed (B, S, C) embeds and paying a separate
    # (feats+pos) @ W_qk dot per layer.  Joint mode only.
    pos_fold: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rows, plans, pos_flats=None):
        """rows: (B, M, C); plans: [shift0_plan, shift1_plan];
        ``pos_flats`` — optional per-plan packed (B, S, C) position embeds
        (hoisted by the caller so they are built once per stage, not once
        per encoder layer)."""
        num_shifts = len(plans)
        for i in range(2):
            plan = plans[i % num_shifts]
            if isinstance(plan, window_ops.JointPlan):
                # joint-budget packing: one (B, S) stream per shift, window
                # identity carried per slot (wid) instead of a static
                # per-block sub-window size.  The fused Pallas kernel only
                # knows the env-var gelu form, so an explicit config choice
                # routes to the unfused layer.
                use_fused = (self.fused_layer and self.cosine and
                             self.activation == "gelu" and
                             self.exact_gelu is None)
                layer_cls = FusedBucketEncoderLayer if use_fused \
                    else BucketEncoderLayer
                layer = layer_cls(
                    self.d_model, self.nhead, self.dim_feedforward,
                    activation=self.activation, cosine=self.cosine,
                    tau_min=self.tau_min, exact_gelu=self.exact_gelu,
                    dtype=self.dtype,
                    name=f"encoder_{i}",
                )
                flat = window_ops.joint_gather_rows(rows, plan)
                b, s, c = flat.shape
                nb = s // 128
                if self.pos_fold and not use_fused:
                    table = window_ops.incell_pos_table(
                        self.window, self.d_model,
                        pos_temperature=self.pos_temperature,
                        normalize_pos=self.normalize_pos, dtype=jnp.float32,
                    ).astype(rows.dtype)
                    out = layer(
                        flat.reshape(b, nb, 128, c), None,
                        plan.tok_valid.reshape(b, nb, 128),
                        wid=plan.wid.reshape(b, nb, 128),
                        pos_incell=plan.tok_incell.reshape(b, nb, 128),
                        pos_table=table,
                    )
                    rows = window_ops.joint_scatter_rows(
                        rows, plan, out.reshape(b, s, c))
                    continue
                if pos_flats is not None:
                    pos = pos_flats[i % num_shifts]
                else:
                    pos = window_ops.joint_pos_embed_flat(
                        plan, self.window, self.d_model,
                        pos_temperature=self.pos_temperature,
                        normalize_pos=self.normalize_pos, dtype=jnp.float32,
                    ).astype(rows.dtype)
                out = layer(
                    flat.reshape(b, nb, 128, c),
                    pos.reshape(b, nb, 128, c),
                    plan.tok_valid.reshape(b, nb, 128),
                    wid=plan.wid.reshape(b, nb, 128),
                )
                rows = window_ops.joint_scatter_rows(
                    rows, plan, out.reshape(b, s, c))
                continue
            ts = window_ops.plan_block_ts(plan)
            use_fused = (self.fused_layer and ts is not None and
                         self.cosine and self.activation == "gelu" and
                         self.exact_gelu is None)
            layer_cls = FusedBucketEncoderLayer if use_fused \
                else BucketEncoderLayer
            layer = layer_cls(
                self.d_model, self.nhead, self.dim_feedforward,
                activation=self.activation, cosine=self.cosine,
                tau_min=self.tau_min, exact_gelu=self.exact_gelu,
                dtype=self.dtype, name=f"encoder_{i}",
            )
            if ts is not None:
                # packed path: ONE attention/FFN/LN pass over the level-
                # concatenated token stream, viewed as 128-token blocks
                # with a per-block sub-window block-diagonal bias — 3x
                # fewer kernels than per-level, and logits tile HBM as
                # full (8, 128) blocks
                flat = window_ops.gather_bucket_rows_flat(rows, plan)
                b, s, c = flat.shape
                nb = s // 128
                if pos_flats is not None:
                    pos = pos_flats[i % num_shifts]
                else:
                    pos = window_ops.sinusoidal_pos_embed(
                        window_ops.plan_yx_flat(plan), self.window,
                        self.d_model, pos_temperature=self.pos_temperature,
                        normalize_pos=self.normalize_pos, dtype=jnp.float32,
                    ).astype(rows.dtype)
                valid = window_ops.plan_valid_flat(plan)
                out = layer(
                    flat.reshape(b, nb, 128, c),
                    pos.reshape(b, nb, 128, c),
                    valid.reshape(b, nb, 128),
                    block_ts=ts,
                )
                rows = window_ops.scatter_bucket_rows_flat(
                    rows, plan, out.reshape(b, s, c))
                continue
            buckets = window_ops.gather_bucket_rows(rows, plan)
            out_buckets = []
            for feats, yx, valid in zip(buckets, plan.tok_yx, plan.tok_valid):
                pos = window_ops.sinusoidal_pos_embed(
                    yx, self.window, self.d_model,
                    pos_temperature=self.pos_temperature,
                    normalize_pos=self.normalize_pos, dtype=jnp.float32,
                ).astype(rows.dtype)
                out_buckets.append(layer(feats, pos, valid))
            rows = window_ops.scatter_bucket_rows(rows, plan, out_buckets)
        return rows
