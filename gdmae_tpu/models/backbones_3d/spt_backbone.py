"""Sparse Pyramid Transformer backbone on a dense BEV canvas.

TPU-native re-design of the reference SPT backbone
(pcdet/models/backbones_3d/spt_backbone.py ``SSTBlockV1`` / ``SPTBackbone``
and pcdet/models/backbones_3d/spt_backbone_mae.py ``SPTBackboneMAE``).

Key mapping (reference -> here):
  * spconv.SparseConvTensor            -> dense (B, Ny, Nx, C) canvas + occupancy
  * spconv2D stride-2 conv_down        -> masked dense conv + dilated occupancy
  * submanifold conv_out               -> masked dense conv (occ unchanged)
  * SSTInputLayer window partition     -> ops.window.build_bucket_plan
  * BasicShiftBlockV2 transformer      -> model_utils.sst_layers.CanvasShiftBlock
  * .dense() + deconv FPN fusion       -> dense ConvTranspose stack (unmasked,
                                          exactly like the reference's dense path)
  * MAE random pillar masking          -> ops.scatter.random_masking on the
                                          pillar list before canvas scatter
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import as_easy
from ...ops import scatter as scatter_ops
from ...ops import window as window_ops
from ...utils import common_utils
from ..model_utils.blocks import (
    ConvBNReLU, MaskedBatchNorm, TokenConvBNReLU, dilate_occupancy)
from ..model_utils.sst_layers import CanvasShiftBlock, DenseWindowShiftBlock


import functools


def _place_impl(pillar_features, inv, tok_flat_idx=None, sorted_cells=True):
    """Tokens -> flat canvas.  Two bit-equivalent forms:

    * scatter (default when ``tok_flat_idx`` given): zeros + ONE
      row-scatter of only the M token rows (raster-sorted into the flat
      canvas).  The token list is always (much) smaller than the canvas —
      ~2% of the cells under MAE masking — and the C-wide rows fill whole
      128-lane tiles, so the sorted row-scatter beats the canvas-wide
      gather: 167.6 -> 152.3 ms full MAE step (r4; opt out
      ``GDMAE_CANVAS_GATHER=1``).
    * gather: one take_along_axis over ALL Ny*Nx cells through the
      cell->token map — touches every canvas row.

    ``sorted_cells`` must reflect the ACTUAL raster order of
    ``tok_flat_idx``: the sortedness hint on an unsorted scatter is
    undefined behaviour on XLA (PointPillarScatter passes first-come,
    non-raster pillar coords — map_to_bev.py sets ``sorted_cells=False``).
    """
    import os

    b, m, c = pillar_features.shape
    if tok_flat_idx is not None and \
            not os.environ.get("GDMAE_CANVAS_GATHER"):
        n_cells = inv.shape[1]
        canvas = jnp.zeros((b, n_cells + 1, c), pillar_features.dtype)
        bi = jnp.arange(b, dtype=jnp.int32)[:, None]
        # NOT unique_indices: every invalid row aliases the trash cell
        canvas = canvas.at[bi, tok_flat_idx].set(
            pillar_features, mode="drop", indices_are_sorted=sorted_cells)
        return canvas[:, :-1]
    feats_pad = jnp.concatenate(
        [pillar_features, jnp.zeros((b, 1, c), pillar_features.dtype)], axis=1)
    return jnp.take_along_axis(feats_pad, inv[..., None], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _canvas_gather_p(canvas_flat, coords, mask, inv, grid_hw):
    ny, nx = grid_hw
    idx = (coords[..., 0] * nx + coords[..., 1]).clip(0, ny * nx - 1)
    out = jnp.take_along_axis(canvas_flat, idx[..., None], axis=1)
    return out * mask[..., None].astype(out.dtype)


def _cg_fwd(canvas_flat, coords, mask, inv, grid_hw):
    ny, nx = grid_hw
    idx = (coords[..., 0] * nx + coords[..., 1]).clip(0, ny * nx - 1)
    tok_flat = jnp.where(mask, idx, ny * nx).astype(jnp.int32)
    return (_canvas_gather_p(canvas_flat, coords, mask, inv, grid_hw),
            (mask, inv, tok_flat))


def _cg_bwd(grid_hw, res, g):
    # token coords are unique per sample, so the transpose of the canvas
    # gather is canvas PLACEMENT of the token grads through the saved
    # cell->token map (row-scatter by default; the canvas-wide gather form
    # is the GDMAE_CANVAS_GATHER=1 opt-out).  Coords here are raster-sorted
    # by contract (gather_canvas_at requires it when mask is given).
    mask, inv, tok_flat = res
    g = g * mask[..., None].astype(g.dtype)
    gcanvas = _place_impl(g, inv, tok_flat)
    return (gcanvas, None, None, None)


_canvas_gather_p.defvjp(_cg_fwd, _cg_bwd)


def gather_canvas_at(canvas, coords, grid_hw, mask=None, cell2tok=None):
    """canvas (B, Ny, Nx, C) sampled at per-sample (M, 2) [iy, ix] coords.

    With ``mask`` (raster-sorted coords required) both VJP directions are
    pure gathers; without it JAX derives a scatter-add transpose.
    ``cell2tok`` — optional precomputed map from
    :func:`ops.window.build_cell2tok` (rebuilt otherwise; each build is a
    canvas-wide int scatter, so callers thread one per stage)."""
    ny, nx = grid_hw
    b, m, _ = coords.shape
    flat = canvas.reshape(b, ny * nx, -1)
    if mask is not None:
        if cell2tok is None:
            cell2tok = window_ops.build_cell2tok(coords, mask, (ny, nx))
        return _canvas_gather_p(flat, coords, mask, cell2tok, (ny, nx))
    idx = (coords[..., 0] * nx + coords[..., 1]).clip(0, ny * nx - 1)
    return jnp.take_along_axis(flat, idx[..., None], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _canvas_place_p(pillar_features, inv, tok_flat_idx, grid_hw,
                    sorted_cells=True):
    return _place_impl(pillar_features, inv, tok_flat_idx, sorted_cells)


def _cp_fwd(pillar_features, inv, tok_flat_idx, grid_hw, sorted_cells):
    return (_place_impl(pillar_features, inv, tok_flat_idx, sorted_cells),
            (inv, tok_flat_idx, pillar_features.shape))


def _cp_bwd(grid_hw, sorted_cells, res, g):
    # g: (B, Ny*Nx, C).  Each token owns exactly one cell -> cotangent is
    # a gather of g at the token's flat cell (trash cell Ny*Nx -> zero).
    inv, tok_flat_idx, (b, m, c) = res
    ny, nx = grid_hw
    g_pad = jnp.concatenate(
        [g, jnp.zeros((b, 1, g.shape[-1]), g.dtype)], axis=1)
    idx = jnp.minimum(tok_flat_idx, ny * nx)
    gfeats = jnp.take_along_axis(g_pad, idx[..., None], axis=1)
    return (gfeats.astype(jnp.float32).astype(g.dtype), None, None)


_canvas_place_p.defvjp(_cp_fwd, _cp_bwd)


def scatter_pillars_to_canvas(pillar_features, pillar_coords, pillar_mask,
                              grid_hw, sorted_cells: bool = True,
                              cell2tok=None, tok_cell=None):
    """(B, M, C) pillar list -> (B, Ny, Nx, C) canvas + (B, Ny, Nx) occupancy.

    The C-wide feature placement is a pure gather through the cell->token
    index, and the VJP is a gather at the token coords (TPU scatters of
    wide rows serialize).  Pass ``sorted_cells=False`` for arbitrary
    coordinate order; thread precomputed ``cell2tok``/``tok_cell`` maps to
    avoid rebuilding them (one canvas-wide int scatter each)."""
    b, m, c = pillar_features.shape
    ny, nx = grid_hw
    inv = cell2tok if cell2tok is not None else window_ops.build_cell2tok(
        pillar_coords, pillar_mask, (ny, nx), sorted_cells=sorted_cells)
    occ = (inv < m).reshape(b, ny, nx)
    tok_flat = tok_cell if tok_cell is not None else \
        window_ops.token_cell_index(pillar_coords, pillar_mask, (ny, nx))
    canvas = _canvas_place_p(pillar_features, inv, tok_flat, (ny, nx),
                             sorted_cells)
    return canvas.reshape(b, ny, nx, c), occ


class SSTBlock(nn.Module):
    """One pyramid stage: optional stride-2 down conv, window-transformer
    encoder, residual, submanifold out conv (reference SSTBlockV1,
    spt_backbone.py:197-264).

    Token-resident: features live in a compact per-sample ``(B, M, C)``
    token list; the dense canvas is materialized at most once per stage
    (for the dense conv path and the stage's output feature map), instead
    of round-tripping the full ``(B, Ny, Nx, C)`` canvas through every
    encoder layer.  With ``sparse_conv`` the convs themselves are
    gather-based (ops.token_conv) and the canvas is only written once as
    the stage output.
    """

    block_cfg: Any
    grid_hw: Tuple[int, int]  # input grid (Ny, Nx)
    win_caps: Tuple[int, ...]
    token_cap_out: int = 0  # token capacity after stride (0 = keep input M)
    sparse_conv: bool = False
    remat: bool = True
    # 'bucket' (compact per-drop-level rows), 'joint' (single shared token
    # budget per shift, ops.window.JointPlan — ~1.5-2x fewer padded tokens
    # than per-level caps), or 'dense' (full-canvas windows)
    window_mode: str = "bucket"
    joint_budget: int = 0  # per-sample token budget for 'joint' (mult of 128)
    # refine drop levels into pow2 packing sub-levels (TPU_PACK_POW2);
    # win_caps must then have one entry per refined level
    pack_pow2: bool = False
    pack_min_t: int = 1  # smallest pow2 packing sub-level (TPU_PACK_MIN_T)
    # TPU_JOINT_PACK == 'dense': next-fit-decreasing joint packing with
    # exact window sizes (no pow2 padding) — ~18% smaller budgets
    dense_pack: bool = False
    # TPU_FUSED_LAYER: run each encoder layer as ONE fused Pallas kernel
    # (ops.pallas.fused_encoder) instead of ~25 XLA passes
    fused_layer: bool = False
    # TPU_POS_FOLD: fold the window pos-embed into the attention qkv
    # projections (joint mode; see sst_layers.CosineMultiheadAttention)
    pos_fold: bool = False
    # profiling-only ablations (TPU_ABLATE): 'attn' keeps the bucket plans
    # but skips the transformer math; 'plans' skips plan building too
    ablate: Tuple[str, ...] = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, coords, mask, occ, canvas_in=None,
                 cell2tok_in=None, host_win=None, train: bool = True):
        """tokens (B, M, C); coords (B, M, 2) on the input grid; mask (B, M);
        occ (B, Ny, Nx).  Returns (tokens, coords, mask, occ, canvas_out,
        cell2tok) on the stage's output grid — the cell->token map is built
        ONCE per stage and threaded through every canvas scatter/gather and
        the window plans (each rebuild is a canvas-wide int scatter).  In
        ``dense`` window mode the stage is canvas-resident: tokens/coords/
        mask may be ``None`` when ``canvas_in`` is given, and ``None`` is
        returned for them.

        ``host_win``: optional loader-precomputed window work for this
        stage (ops.window_host.host_joint_plans — joint mode only): keys
        'plans' (token-space JointPlan per shift) and, for strided stages,
        'coords'/'cmask'/'occ' (the dilated+compacted output token list) —
        replaces ~32 ms/step of in-graph plan building (r4 sweep)."""
        blk = as_easy(self.block_cfg)
        enc = blk.ENCODER
        pre = blk.PREPROCESS
        d_model = int(enc.D_MODEL)
        stride = int(enc.STRIDE)
        ny, nx = self.grid_hw
        if self.window_mode == "dense":
            return self._call_dense(
                blk, tokens, coords, mask, occ, canvas_in, train) + (None,)
        b, m, _ = tokens.shape

        if stride > 1:
            if host_win is not None and "occ" in host_win:
                occ_out = host_win["occ"]
                ny2, nx2 = occ_out.shape[1], occ_out.shape[2]
                coords_out, mask_out = host_win["coords"], host_win["cmask"]
            else:
                occ_out = dilate_occupancy(occ, kernel=3, stride=stride)
                ny2, nx2 = occ_out.shape[1], occ_out.shape[2]
                cap = self.token_cap_out or min(ny2 * nx2, 4 * m)
                coords_out, mask_out = window_ops.compact_occupancy(
                    occ_out, cap)
            c2t_out = window_ops.build_cell2tok(
                coords_out, mask_out, (ny2, nx2))
            if self.sparse_conv:
                c2t_in = cell2tok_in if cell2tok_in is not None else \
                    window_ops.build_cell2tok(coords, mask, (ny, nx))
                tokens = TokenConvBNReLU(
                    d_model, kernel=3, stride=stride, dtype=self.dtype,
                    name="conv_down",
                )(tokens, c2t_in, (ny, nx), coords_out, mask_out,
                  coords_in=coords, mask_in=mask, train=train)
            else:
                if canvas_in is None:
                    canvas_in, _ = scatter_pillars_to_canvas(
                        tokens, coords, mask, (ny, nx), cell2tok=cell2tok_in)
                canvas = ConvBNReLU(
                    d_model, kernel=3, stride=stride, dtype=self.dtype,
                    name="conv_down",
                )(canvas_in, occ_out=occ_out, train=train)
                tokens = gather_canvas_at(
                    canvas, coords_out, (ny2, nx2), mask=mask_out,
                    cell2tok=c2t_out)
            coords, mask, occ = coords_out, mask_out, occ_out
            cell2tok_in = c2t_out
            ny, nx = ny2, nx2
            m = tokens.shape[1]

        window = (int(pre.WINDOW_SHAPE[1]), int(pre.WINDOW_SHAPE[0]))  # (wy, wx)
        drop_specs = window_ops.drop_specs_from_cfg(
            pre.DROP_INFO["train" if train else "test"]
        )
        if self.pack_pow2:
            drop_specs = window_ops.packing_specs(
                drop_specs, window[0] * window[1], min_t=self.pack_min_t)
        assert self.window_mode == "joint" or \
            len(self.win_caps) == len(drop_specs), (
            f"win_caps has {len(self.win_caps)} entries but the "
            f"{'pow2-refined ' if self.pack_pow2 else ''}drop spec has "
            f"{len(drop_specs)} levels — with TPU_PACK_POW2, "
            f"TPU_WINDOW_CAPS must list one capacity per refined level")
        c2t = cell2tok_in if cell2tok_in is not None else \
            window_ops.build_cell2tok(coords, mask, (ny, nx))
        tcell = window_ops.token_cell_index(coords, mask, (ny, nx))
        if "plans" in self.ablate:
            plans = None
            participate = mask
        elif host_win is not None and self.window_mode == "joint":
            plans = host_win["plans"]  # token-space JointPlans per shift
            participate = None
            for plan in plans:
                cover = plan.inv_idx < plan.total_tokens
                participate = cover if participate is None else \
                    (participate & cover)
            participate = participate & mask
        elif self.window_mode == "joint":
            assert self.joint_budget > 0 and self.joint_budget % 128 == 0, (
                "TPU_WINDOW_MODE: joint needs TPU_JOINT_BUDGETS (one "
                "multiple-of-128 per stage); got", self.joint_budget)
            raw_plans = [
                window_ops.build_joint_plan(
                    occ, (ny, nx), window, shift, drop_specs,
                    self.joint_budget, dense_pack=self.dense_pack)
                for shift in ((0, 0), (window[0] // 2, window[1] // 2))
            ]
            plans = [window_ops.joint_plan_to_tokens(p, c2t, tcell, m)
                     for p in raw_plans]
            participate = None
            for plan in plans:
                cover = plan.inv_idx < plan.total_tokens
                participate = cover if participate is None else \
                    (participate & cover)
            participate = participate & mask
        else:
            raw_plans = [
                window_ops.build_bucket_plan(
                    occ, (ny, nx), window, shift, drop_specs, self.win_caps)
                for shift in ((0, 0), (window[0] // 2, window[1] // 2))
            ]
            if "p2t" in self.ablate:  # profiling: skip plan_to_tokens
                plans = raw_plans
                participate = mask  # canvas-space inv (profiling only)
            else:
                plans = [window_ops.plan_to_tokens(p, c2t, tcell, m)
                         for p in raw_plans]
                # tokens covered by both shifts participate in the encoder;
                # others (bucket overflow only) keep their input features,
                # mirroring the reference's token-drop residual
                # (spt_backbone.py:260-262)
                participate = None
                for plan in plans:
                    cover = plan.inv_idx < plan.total_tokens  # (B, M)
                    participate = cover if participate is None else \
                        (participate & cover)
                participate = participate & mask

        if plans is not None and "attn" in self.ablate:
            # keep the full plan construction alive (defeat DCE) but skip
            # the transformer math: profiling-only path
            dep = jnp.zeros((), self.dtype)
            for plan in plans:
                dep = dep + plan.inv_idx.sum().astype(self.dtype) * 1e-30
                if "tokarrays" in self.ablate:
                    continue  # profiling: let DCE drop the per-level arrays
                if isinstance(plan, window_ops.JointPlan):
                    dep = dep + (plan.tok_src.sum() + plan.wid.sum()
                                 ).astype(self.dtype) * 1e-30
                    continue
                for s, yx in zip(plan.tok_src, plan.tok_yx):
                    dep = dep + (s.sum() + yx.sum()).astype(self.dtype) * 1e-30
            tokens = tokens + dep
        elif plans is not None:
            rows = tokens
            # position embeds depend only on the plan: build the packed
            # (B, S, C) embeds ONCE per stage instead of once per encoder
            # layer (2 layers x NUM_BLOCKS share them)
            pos_flats = None
            if self.window_mode == "joint" and self.pos_fold:
                pass  # pos folds into the attention projections per layer
            elif self.window_mode == "joint":
                pos_flats = [
                    window_ops.joint_pos_embed_flat(
                        p, window, d_model,
                        pos_temperature=float(pre.POS_TEMPERATURE),
                        normalize_pos=bool(pre.NORMALIZE_POS),
                        dtype=self.dtype,
                    )
                    for p in plans
                ]
            elif all(window_ops.plan_block_ts(p) is not None for p in plans):
                pos_flats = [
                    window_ops.pos_embed_flat(
                        p, window, d_model,
                        pos_temperature=float(pre.POS_TEMPERATURE),
                        normalize_pos=bool(pre.NORMALIZE_POS),
                        dtype=self.dtype,
                    )
                    for p in plans
                ]
            # remat trades ~1 extra forward in the backward pass for
            # O(layers) token activations of HBM; disable via TPU_REMAT:
            # false when the batch fits (faster steps)
            shift_block_cls = nn.remat(CanvasShiftBlock, static_argnums=()) \
                if self.remat else CanvasShiftBlock
            for bi in range(int(enc.NUM_BLOCKS)):
                rows = shift_block_cls(
                    d_model=d_model,
                    nhead=int(enc.NHEAD),
                    dim_feedforward=int(enc.DIM_FEEDFORWARD),
                    window=window,
                    pos_temperature=float(pre.POS_TEMPERATURE),
                    normalize_pos=bool(pre.NORMALIZE_POS),
                    activation=str(enc.ACTIVATION),
                    cosine=bool(enc.get("LAYER_CFG", {}).get("cosine", False)),
                    tau_min=float(enc.get("LAYER_CFG", {}).get("tau_min", 0.01)),
                    exact_gelu=enc.get("LAYER_CFG", {}).get("exact_gelu", None),
                    fused_layer=self.fused_layer,
                    pos_fold=(self.window_mode == "joint" and self.pos_fold),
                    dtype=self.dtype,
                    name=f"shift_block_{bi}",
                )(rows, plans, pos_flats)
            upd = participate[..., None].astype(tokens.dtype)
            tokens = tokens + rows * upd

        if self.sparse_conv:
            tokens = TokenConvBNReLU(
                d_model, kernel=3, dtype=self.dtype, name="conv_out",
            )(tokens, c2t, (ny, nx), coords, mask,
              coords_in=coords, mask_in=mask, train=train)
            canvas_out, _ = scatter_pillars_to_canvas(
                tokens, coords, mask, (ny, nx), cell2tok=c2t, tok_cell=tcell)
        else:
            canvas_mid, _ = scatter_pillars_to_canvas(
                tokens, coords, mask, (ny, nx), cell2tok=c2t, tok_cell=tcell)
            canvas_out = ConvBNReLU(
                d_model, kernel=3, dtype=self.dtype, name="conv_out",
            )(canvas_mid, occ_out=occ, train=train)
            tokens = gather_canvas_at(canvas_out, coords, (ny, nx), mask=mask,
                                      cell2tok=c2t)
        return tokens, coords, mask, occ, canvas_out, c2t

    def _call_dense(self, blk, tokens, coords, mask, occ, canvas_in, train):
        """Canvas-resident stage (``TPU_WINDOW_MODE: dense``): masked dense
        convs + full-window attention; no token lists, no bucket plans."""
        enc = blk.ENCODER
        pre = blk.PREPROCESS
        d_model = int(enc.D_MODEL)
        stride = int(enc.STRIDE)
        ny, nx = self.grid_hw

        if canvas_in is None:
            canvas_in, _ = scatter_pillars_to_canvas(
                tokens, coords, mask, (ny, nx))
        if stride > 1:
            occ = dilate_occupancy(occ, kernel=3, stride=stride)
            canvas = ConvBNReLU(
                d_model, kernel=3, stride=stride, dtype=self.dtype,
                name="conv_down",
            )(canvas_in, occ_out=occ, train=train)
            ny, nx = occ.shape[1], occ.shape[2]
        elif canvas_in.shape[-1] != d_model:
            canvas = ConvBNReLU(
                d_model, kernel=3, dtype=self.dtype, name="conv_down",
            )(canvas_in, occ_out=occ, train=train)
        else:
            canvas = canvas_in

        window = (int(pre.WINDOW_SHAPE[1]), int(pre.WINDOW_SHAPE[0]))
        shift_block_cls = nn.remat(DenseWindowShiftBlock) \
            if self.remat else DenseWindowShiftBlock
        x = canvas
        for bi in range(int(enc.NUM_BLOCKS)):
            x = shift_block_cls(
                d_model=d_model,
                nhead=int(enc.NHEAD),
                dim_feedforward=int(enc.DIM_FEEDFORWARD),
                window=window,
                pos_temperature=float(pre.POS_TEMPERATURE),
                normalize_pos=bool(pre.NORMALIZE_POS),
                activation=str(enc.ACTIVATION),
                cosine=bool(enc.get("LAYER_CFG", {}).get("cosine", False)),
                tau_min=float(enc.get("LAYER_CFG", {}).get("tau_min", 0.01)),
                exact_gelu=enc.get("LAYER_CFG", {}).get("exact_gelu", None),
                dtype=self.dtype,
                name=f"shift_block_{bi}",
            )(x, occ)
        canvas = canvas + x * occ[..., None].astype(canvas.dtype)

        canvas_out = ConvBNReLU(
            d_model, kernel=3, dtype=self.dtype, name="conv_out",
        )(canvas, occ_out=occ, train=train)
        return None, None, None, occ, canvas_out


class _ConvOutKernel(nn.Module):
    """Bare (kh, kw, cin, cout) conv kernel parameter with nn.Conv's tree
    layout/init, so the split-conv form shares checkpoints with the
    ``nn.Conv(name="conv_out")`` form."""

    shape: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class DeconvFuse(nn.Module):
    """FPN-style deconv fusion of the pyramid to a stride-1 dense map
    (reference SPTBackbone deblocks + conv_out, spt_backbone.py:283-303).
    Dense (unmasked) convs/BN, exactly like the reference's dense path.

    The reference's ``ConvTranspose2d(kernel=stride=s)`` touches each output
    cell exactly once, so it is computed here as a 1x1 conv to ``s*s*nf``
    channels followed by depth-to-space — the same function space (weight
    relayout only), but the matmul, BN statistics, and ReLU all run at the
    LOW resolution (s^2 fewer rows), and XLA's transposed-conv lowering
    (padding + scatter) is avoided entirely.  Measured ~100 ms of a 433 ms
    MAE step for the ConvTranspose form at KITTI batch 16 on v5e."""

    fuse_cfg: Any  # model_cfg.FUSE_LAYER
    sources: Sequence[str]  # model_cfg.FEATURES_SOURCE
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_maps: Dict[str, jnp.ndarray], train: bool = True):
        ups = []
        total = 0
        fuse_cfg = as_easy(self.fuse_cfg)
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
            # BN per upsampled channel == BN over (batch, h, w, s^2) of the
            # (s^2, nf)-grouped low-res channels: same element set, so the
            # statistics are exactly those of the full-res deconv output
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
        out_ch = total // len(ups)
        import os
        if os.environ.get("GDMAE_FUSE_SPLIT", "1") != "0":
            # DEFAULT (r5): conv(concat(a,b,c), W) == sum_i conv(x_i, W_i)
            # — avoids materializing the (B, Ny, Nx, total) concat through
            # fwd+bwd (658 MB/step at KITTI batch 16; 152.0 -> 150.7 ms).
            # Same parameter tree as the nn.Conv form
            # (tests/test_sparse_decode.py::test_fuse_split_equivalence);
            # the torch-parity suites pass with it on (r5).
            # GDMAE_FUSE_SPLIT=0 restores the concat form.
            w = _ConvOutKernel((3, 3, total, out_ch), name="conv_out")()
            x = None
            off = 0
            for u in ups:
                nf = u.shape[-1]
                y = jax.lax.conv_general_dilated(
                    u, w[:, :, off:off + nf, :].astype(self.dtype),
                    (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                x = y if x is None else x + y
                off += nf
        else:
            x = jnp.concatenate(ups, axis=-1)
            x = nn.Conv(out_ch, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name="conv_out")(x)
        x = MaskedBatchNorm(dtype=self.dtype, name="conv_out_bn")(
            x, use_running_average=not train
        )
        return nn.relu(x)


class SPTBackbone(nn.Module):
    """Reference SPTBackbone (spt_backbone.py:267-347): SST pyramid + FPN
    deconv fusion to a dense stride-1 BEV feature map."""

    model_cfg: Any
    input_channels: int
    grid_size: Tuple[int, int]  # (nx, ny)
    voxel_size: Tuple[float, ...]
    point_cloud_range: Tuple[float, ...]
    max_pillars: int
    dtype: Any = jnp.float32

    def block_grids(self):
        """Static (Ny, Nx) per pyramid stage (input grid of each block)."""
        ny, nx = int(self.grid_size[1]), int(self.grid_size[0])
        grids = []
        for blk in as_easy(self.model_cfg).SST_BLOCK_LIST:
            grids.append((ny, nx))
            s = int(blk.ENCODER.STRIDE)
            ny, nx = -(-ny // s), -(-nx // s)
        return grids

    def stage_caps(self, batch_size: int):
        """Per-sample per-level window capacities (buckets are per-sample,
        so these do NOT scale with batch size)."""
        del batch_size
        cfg = as_easy(self.model_cfg)
        caps_cfg = cfg.get("TPU_WINDOW_CAPS", None)
        grids = self.block_grids()
        out = []
        for i, blk in enumerate(cfg.SST_BLOCK_LIST):
            if caps_cfg is not None:
                out.append(tuple(int(c) for c in caps_cfg[i]))
                continue
            s = int(blk.ENCODER.STRIDE)
            ny, nx = grids[i]
            ny, nx = -(-ny // s), -(-nx // s)
            drop_specs = window_ops.drop_specs_from_cfg(blk.PREPROCESS.DROP_INFO["train"])
            window = (int(blk.PREPROCESS.WINDOW_SHAPE[1]), int(blk.PREPROCESS.WINDOW_SHAPE[0]))
            if bool(cfg.get("TPU_PACK_POW2", False)):
                drop_specs = window_ops.packing_specs(
                    drop_specs, window[0] * window[1],
                    min_t=int(cfg.get("TPU_PACK_MIN_T", 1)))
            out.append(window_ops.default_win_caps(
                (ny, nx), window, self.max_pillars, drop_specs))
        return out

    @nn.compact
    def __call__(self, batch_dict, train: bool = True):
        ny, nx = int(self.grid_size[1]), int(self.grid_size[0])
        b = batch_dict["pillar_features"].shape[0]
        tokens = batch_dict["pillar_features"].astype(self.dtype)
        coords = batch_dict["pillar_coords"]
        mask = batch_dict["pillar_mask"]
        m = coords.shape[1]
        # ONE cell->token build serves the entry occupancy and stage 1
        c2t = window_ops.build_cell2tok(coords, mask, (ny, nx))
        occ = (c2t < m).reshape(coords.shape[0], ny, nx)

        cfg = as_easy(self.model_cfg)
        grids = self.block_grids()
        caps = self.stage_caps(b)
        tok_caps = cfg.get("TPU_TOKEN_CAPS", None)
        joint_budgets = cfg.get("TPU_JOINT_BUDGETS", None)
        feature_maps, occs, strides, stage_tok = {}, {}, {}, {}
        stride = 1
        canvas = None
        # TPU_SPARSE_CONV: bool, or one bool per stage — gather-based token
        # convs win on large sparse grids (stage 1); on small late-stage
        # grids whose token cap approaches the cell count, regular masked
        # dense convs can be faster (no gathers)
        sp_conv = cfg.get("TPU_SPARSE_CONV", False)
        for i, blk in enumerate(cfg.SST_BLOCK_LIST):
            host_win = None
            if (f"host_win{i}s0_tok_src" in batch_dict
                    and str(cfg.get("TPU_WINDOW_MODE", "bucket")) == "joint"
                    and "plans" not in cfg.get("TPU_ABLATE", ())):
                host_win = {
                    "plans": [
                        window_ops.JointPlan(
                            tok_src=batch_dict[f"host_win{i}s{j}_tok_src"],
                            tok_valid=batch_dict[f"host_win{i}s{j}_tok_valid"],
                            tok_incell=batch_dict[f"host_win{i}s{j}_tok_incell"],
                            wid=batch_dict[f"host_win{i}s{j}_wid"],
                            inv_idx=batch_dict[f"host_win{i}s{j}_inv"],
                            overflow=jnp.zeros((), jnp.int32),
                        )
                        for j in (0, 1)
                    ],
                }
                if f"host_stage{i}_occ" in batch_dict:
                    host_win["occ"] = batch_dict[f"host_stage{i}_occ"]
                    host_win["coords"] = batch_dict[f"host_stage{i}_coords"]
                    host_win["cmask"] = batch_dict[f"host_stage{i}_cmask"]
            tokens, coords, mask, occ, canvas, c2t = SSTBlock(
                block_cfg=blk, grid_hw=grids[i], win_caps=caps[i],
                token_cap_out=int(tok_caps[i]) if tok_caps is not None else 0,
                sparse_conv=bool(sp_conv[i] if isinstance(
                    sp_conv, (list, tuple)) else sp_conv),
                remat=bool(cfg.get("TPU_REMAT", True)),
                window_mode=str(cfg.get("TPU_WINDOW_MODE", "bucket")),
                joint_budget=(int(joint_budgets[i])
                              if joint_budgets is not None else 0),
                pack_pow2=bool(cfg.get("TPU_PACK_POW2", False)),
                pack_min_t=int(cfg.get("TPU_PACK_MIN_T", 1)),
                dense_pack=cfg.get("TPU_JOINT_PACK", "pow2") == "dense",
                fused_layer=bool(cfg.get("TPU_FUSED_LAYER", False)),
                pos_fold=bool(cfg.get("TPU_POS_FOLD", False)),
                ablate=tuple(cfg.get("TPU_ABLATE", ())),
                dtype=self.dtype, name=f"sst_block_{i}",
            )(tokens, coords, mask, occ, canvas_in=canvas, cell2tok_in=c2t,
              host_win=host_win, train=train)
            stride *= int(blk.ENCODER.STRIDE)
            feature_maps[f"x_conv{i+1}"] = canvas
            occs[f"x_conv{i+1}"] = occ
            strides[f"x_conv{i+1}"] = stride
            stage_tok[f"x_conv{i+1}"] = (
                tokens, coords, mask, c2t,
                (int(occ.shape[1]), int(occ.shape[2])))

        batch_dict["multi_scale_2d_features"] = feature_maps
        batch_dict["multi_scale_2d_occupancy"] = occs
        batch_dict["multi_scale_2d_strides"] = strides

        # TPU_SPARSE_DECODE + decode_coords (MAE pretraining): fuse the
        # pyramid at the decode sites only — no full-resolution canvas ever
        # materializes (see sparse_decode.SparseDecodeFuse)
        if bool(cfg.get("TPU_SPARSE_DECODE", False)) and \
                "decode_coords" in batch_dict:
            assert tokens is not None, \
                "TPU_SPARSE_DECODE needs token-resident stages (not dense)"
            from .sparse_decode import SparseDecodeFuse
            batch_dict["decoded_features"] = SparseDecodeFuse(
                fuse_cfg=cfg.FUSE_LAYER,
                sources=cfg.FEATURES_SOURCE,
                full_hw=grids[0],
                dtype=self.dtype, name="fuse",
            )(stage_tok, batch_dict["decode_coords"],
              batch_dict["decode_valid"], train)
            batch_dict["spatial_features_stride"] = 1
            return batch_dict

        # TPU_HYBRID_DECODE + decode_coords (MAE pretraining): dense deblock
        # upsample, but the dominant full-resolution 3x3 conv_out runs at
        # the decode sites only (sparse_decode.HybridDecodeFuse)
        if bool(cfg.get("TPU_HYBRID_DECODE", False)) and \
                "decode_coords" in batch_dict:
            from .sparse_decode import HybridDecodeFuse
            hy_cls = (nn.remat(HybridDecodeFuse, static_argnums=(4,))
                      if bool(cfg.get("TPU_REMAT_FUSE", True))
                      else HybridDecodeFuse)
            batch_dict["decoded_features"] = hy_cls(
                fuse_cfg=cfg.FUSE_LAYER,
                sources=cfg.FEATURES_SOURCE,
                dtype=self.dtype, name="fuse",
            )(feature_maps, batch_dict["decode_coords"],
              batch_dict["decode_valid"], train)
            batch_dict["spatial_features_stride"] = 1
            return batch_dict

        # the fuse works at full canvas resolution (its conv_out input alone
        # is (B, Ny, Nx, 384) — 1.2G at batch 32 bf16): always recompute it
        # in the backward pass; one extra fuse forward is a few ms
        fuse_cls = (nn.remat(DeconvFuse, static_argnums=(2,))
                    if bool(cfg.get("TPU_REMAT_FUSE", True)) else DeconvFuse)
        spatial_features = fuse_cls(
            fuse_cfg=cfg.FUSE_LAYER,
            sources=cfg.FEATURES_SOURCE,
            dtype=self.dtype, name="fuse",
        )(feature_maps, train)

        batch_dict["spatial_features"] = spatial_features  # (B, Ny, Nx, C)
        batch_dict["spatial_features_stride"] = 1
        return batch_dict

    @property
    def num_point_features(self):
        cfg = as_easy(self.model_cfg)
        total = sum(
            int(cfg.FUSE_LAYER[s].NUM_UPSAMPLE_FILTER)
            for s in cfg.FEATURES_SOURCE
        )
        return total // len(cfg.FEATURES_SOURCE)


def mae_dec_cap(model_cfg, max_pillars):
    """Static decode-set capacity of SPTBackboneMAE (shared with loaders
    building host MAE targets — see datasets.processor.host_pillarize)."""
    cfg = as_easy(model_cfg)
    ratio = float(cfg.MASK_CONFIG.RATIO)
    return int(cfg.get(
        "TPU_MAE_DEC_CAP",
        -(-int(max_pillars * ratio + 1) // 8) * 8))


def mae_enc_cap(model_cfg, max_pillars):
    """Static kept-token capacity of the masked-compact encode (shared with
    loaders building host keep-compaction indices)."""
    cfg = as_easy(model_cfg)
    ratio = float(cfg.MASK_CONFIG.RATIO)
    return int(cfg.get(
        "TPU_MAE_TOKEN_CAP",
        -(-int(max_pillars * (1.0 - ratio) + 1) // 8) * 8))


class SPTBackboneMAE(nn.Module):
    """Reference SPTBackboneMAE (spt_backbone_mae.py): mask pillars, encode
    the kept ones through the SST pyramid, densify through the generative
    decoder, and regress each pillar's point set (Chamfer loss)."""

    model_cfg: Any
    input_channels: int
    grid_size: Tuple[int, int]
    voxel_size: Tuple[float, ...]
    point_cloud_range: Tuple[float, ...]
    max_pillars: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_dict, train: bool = True):
        cfg = as_easy(self.model_cfg)
        mask_cfg = cfg.get("MASK_CONFIG", None)
        mask_ratio = float(mask_cfg.RATIO) if mask_cfg is not None else 0.0
        num_prd = int(mask_cfg.NUM_PRD_POINTS)
        num_gt = int(mask_cfg.NUM_GT_POINTS)

        pillar_mask = batch_dict["pillar_mask"]  # (B, M)
        b, m = pillar_mask.shape

        # per-sample random masking, ratio as in reference (:96-100).
        # The loader may draw the mask on HOST (host_pillarize.mae_host_targets)
        # so the GT grouping below can also be host-precomputed; otherwise
        # draw it here.  Eval-mode apply must work without an rng stream
        # (reference GDMAE eval is an empty post-processing pass-through,
        # gd_mae.py:24-25), so fall back to a fixed key when not training.
        mae_mask = batch_dict.get("host_mae_mask")
        if mae_mask is None:
            if train and mask_ratio > 0.0:
                rng = self.make_rng("mae_mask")
            else:
                rng = jax.random.PRNGKey(0)
            keys = jax.random.split(rng, b)
            mae_mask = jax.vmap(
                lambda k, v: scatter_ops.random_masking(k, v, mask_ratio)
            )(keys, pillar_mask)  # 1.0 = masked
        batch_dict["pillar_mae_mask"] = mae_mask

        kept = pillar_mask & (mae_mask == 0.0)

        ny, nx = int(self.grid_size[1]), int(self.grid_size[0])

        # compact the ~(1-ratio) kept pillars into a small static token
        # list so the whole encoder scales with the VISIBLE set (the
        # reference encodes only kept pillars through spconv,
        # spt_backbone_mae.py:102-113).  random_masking keeps exactly
        # floor(n_valid*(1-ratio)) pillars, so this capacity never drops.
        m_enc = mae_enc_cap(cfg, m)
        kept_idx = batch_dict.get("host_mae_keep_idx")
        if kept_idx is None or kept_idx.shape[1] != m_enc:
            kept_idx = jax.vmap(
                lambda k: jnp.nonzero(k, size=m_enc, fill_value=m)[0]
            )(kept)  # (B, m_enc)
        kept_valid = kept_idx < m
        kept_idx_c = jnp.minimum(kept_idx, m - 1)
        tokens_c = jnp.take_along_axis(
            batch_dict["pillar_features"], kept_idx_c[..., None], axis=1)
        tokens_c = tokens_c * kept_valid[..., None].astype(tokens_c.dtype)
        coords_c = jnp.take_along_axis(
            batch_dict["pillar_coords"], kept_idx_c[..., None], axis=1)

        encoder = SPTBackbone(
            model_cfg=cfg,
            input_channels=self.input_channels,
            grid_size=self.grid_size,
            voxel_size=self.voxel_size,
            point_cloud_range=self.point_cloud_range,
            max_pillars=self.max_pillars,
            dtype=self.dtype,
            name="encoder",
        )
        # Decode set: the loss only covers masked AND real pillars
        # (reference weights by voxel_mae_mask, spt_backbone_mae.py:88), so
        # compact the decode/loss work onto that static-capacity subset
        # instead of running the prediction head + Chamfer over all M
        # pillars (identical loss value: the dropped rows had weight 0).
        # Opt out via TPU_MAE_COMPACT_DEC: false (full-M path).
        compact_dec = bool(cfg.get("TPU_MAE_COMPACT_DEC", True))
        sparse_decode = bool(cfg.get("TPU_SPARSE_DECODE", False)) and \
            compact_dec
        site_decode = sparse_decode or (
            bool(cfg.get("TPU_HYBRID_DECODE", False)) and compact_dec)
        sub_dict = {
            "pillar_features": tokens_c,
            "pillar_coords": coords_c,
            "pillar_mask": kept_valid,
        }
        # loader-precomputed window plans for the kept-token pyramid
        # (ops.window_host.host_joint_plans over the same compaction order)
        sub_dict.update({k: v for k, v in batch_dict.items()
                         if k.startswith(("host_win", "host_stage"))})
        dec_idx = dec_valid = None
        if compact_dec:
            loss_sel = (mae_mask > 0) & pillar_mask  # (B, M) bool
            m_dec = mae_dec_cap(cfg, m)
            dec_idx = batch_dict.get("host_mae_dec_idx")
            if dec_idx is None or dec_idx.shape[1] != m_dec:
                dec_idx = jax.vmap(
                    lambda v: jnp.nonzero(v, size=m_dec, fill_value=m)[0]
                )(loss_sel)  # (B, m_dec), ascending: coords stay sorted
            dec_valid = dec_idx < m
            dec_idx_c = jnp.minimum(dec_idx, m - 1)
            dec_coords = jnp.take_along_axis(
                batch_dict["pillar_coords"], dec_idx_c[..., None], axis=1)
            if site_decode:
                sub_dict["decode_coords"] = dec_coords
                sub_dict["decode_valid"] = dec_valid

        # run pyramid + generative decoder on the kept pillars
        sub_dict = encoder(sub_dict, train=train)
        spatial_features = sub_dict.get("spatial_features")

        batch_dict["spatial_features"] = spatial_features
        batch_dict["spatial_features_stride"] = 1
        batch_dict["multi_scale_2d_features"] = sub_dict["multi_scale_2d_features"]

        points = batch_dict["points"]
        res = batch_dict["pillarize_result"]
        if compact_dec:
            coords = dec_coords
            if site_decode:
                feats = sub_dict["decoded_features"]
            else:
                feats = gather_canvas_at(
                    spatial_features, coords, (ny, nx), mask=dec_valid)
            host_rel = batch_dict.get("host_mae_gt_rel")
            gt_points = None
            if host_rel is not None:
                # GT sets precomputed by the loader on HOST in the same
                # (ascending-slot) decode order (host_pillarize.py),
                # already pillar-center-RELATIVE (the quantity the chamfer
                # consumes) and shipped f16: GT carries no gradient, the
                # in-pillar offsets fit f16 at ≲5 mm, and this quarters
                # the step's dominant H2D tensor
                norm_gt_direct = host_rel.astype(jnp.float32)
                gt_mask = batch_dict["host_mae_gt_mask"] & \
                    dec_valid[..., None]
            elif bool(cfg.get("TPU_MAE_WRAP_GT", False)):
                # exact-parity GT build: wrap-repeat each pillar's points to
                # fill all num_gt slots like the reference group_inner_inds
                # kernel (sst_ops_gpu.cu:22-39) — the padded+mask default
                # reweights multi-point pillars' gt->pred term by up to one
                # part in k/count; this flag removes that delta for the
                # torch gradient-parity suite (test_train_trajectory)
                gt_full = jax.vmap(
                    lambda v, r: scatter_ops.group_points_wrap(v, r, num_gt)
                )(points[..., :3], res)  # (B, M, num_gt, 3)
                gt_points = jnp.take_along_axis(
                    gt_full.reshape(b, m, num_gt * 3), dec_idx_c[..., None],
                    axis=1).reshape(b, m_dec, num_gt, 3)
                gt_mask = jnp.broadcast_to(
                    dec_valid[..., None], (b, m_dec, num_gt))
            else:
                # device fallback: full-M sorted scatter, then compact the
                # grouped sets with ONE contiguous-row gather ((k*3)-float
                # rows).  Per-run dynamic slices at the decode subset
                # measured 5x WORSE (455 vs 265 ms step): variable
                # element-granularity slice offsets defeat the (8,128)
                # tiling, while the sorted scatter lowers well
                gt_points, gt_mask = jax.vmap(
                    lambda v, r: scatter_ops.group_points_padded(v, r, num_gt)
                )(points[..., :3], res)  # (B, M, num_gt, 3), (B, M, num_gt)
                gt_points = jnp.take_along_axis(
                    gt_points.reshape(b, m, num_gt * 3), dec_idx_c[..., None],
                    axis=1).reshape(b, m_dec, num_gt, 3)
                gt_mask = jnp.take_along_axis(
                    gt_mask, dec_idx_c[..., None], axis=1)
                gt_mask = gt_mask & dec_valid[..., None]
            gt_counts = jnp.take_along_axis(
                res.pillar_count, dec_idx_c, axis=1) * dec_valid
            out_m = m_dec
            loss_w = dec_valid.astype(jnp.float32)
        else:
            coords = batch_dict["pillar_coords"]
            feats = gather_canvas_at(
                spatial_features, coords, (ny, nx),
                mask=batch_dict["pillar_mask"])
            gt_points, gt_mask = jax.vmap(
                lambda v, r: scatter_ops.group_points_padded(v, r, num_gt)
            )(points[..., :3], res)
            gt_counts = res.pillar_count
            out_m = m
            loss_w = mae_mask * pillar_mask.astype(jnp.float32)

        # per-pillar point-set prediction
        pred = nn.Dense(num_prd * 3, dtype=jnp.float32, name="decoder_pred")(
            feats.astype(jnp.float32)
        ).reshape(b, out_m, num_prd, 3)

        centers = jnp.stack(
            [
                (coords[..., 1].astype(jnp.float32) + 0.5)
                * self.voxel_size[0] + self.point_cloud_range[0],
                (coords[..., 0].astype(jnp.float32) + 0.5)
                * self.voxel_size[1] + self.point_cloud_range[1],
                jnp.full((b, out_m),
                         0.5 * self.voxel_size[2] + self.point_cloud_range[2],
                         jnp.float32),
            ],
            axis=-1,
        )
        if gt_points is None:  # host path shipped center-relative GT
            norm_gt = norm_gt_direct
        else:
            norm_gt = gt_points - centers[:, :, None, :]

        batch_dict["mae_pred_points"] = pred
        batch_dict["mae_gt_points"] = norm_gt
        batch_dict["mae_gt_mask"] = gt_mask
        batch_dict["mae_gt_counts"] = gt_counts
        batch_dict["mae_loss_mask"] = loss_w
        return batch_dict

    @property
    def num_point_features(self):
        cfg = as_easy(self.model_cfg)
        total = sum(
            int(cfg.FUSE_LAYER[s].NUM_UPSAMPLE_FILTER)
            for s in cfg.FEATURES_SOURCE
        )
        return total // len(cfg.FEATURES_SOURCE)
