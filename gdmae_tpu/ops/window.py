"""Static-shape shifted-window partition + drop-level bucketing on a dense BEV canvas.

TPU-native equivalent of the reference's SST input layer machinery
(reference pcdet/models/model_utils/sst_utils.py:6-104 ``get_window_coors`` /
``get_flat2win_inds`` and pcdet/models/backbones_3d/spt_backbone.py:11-135
``SSTInputLayer``). The reference keeps a ragged list of pillar tokens, sorts
them into windows with CUDA atomics, and pads each window to a per-drop-level
``max_tokens`` bucket. Here the tokens live on a dense BEV canvas
``(B, Ny, Nx, C)`` with an occupancy mask, so:

  * window partition is pure index arithmetic over a padded canvas,
  * per-window token compaction is a vectorized 64-element sort,
  * drop-level assignment is a comparison against occupancy counts,
  * bucket slot assignment is one stable sort over the (small) window grid.

Every output is fixed-capacity and **per-sample**: level ``l`` owns a
``(B, W_l, T_l)`` bucket of per-sample gather indices + validity masks.
Keeping the batch dimension explicit (instead of global cross-batch buckets)
means every gather/scatter is a ``take_along_axis`` *within* a sample, so
under a data-parallel ``Mesh`` the SPMD partitioner keeps all window work
device-local — zero collectives in the encoder (global flat indices would
force all-to-alls).  Windows beyond a bucket's capacity are counted in
``overflow`` and simply not attended (their features pass through
unchanged), mirroring the reference's token-drop semantics
(spt_backbone.py:50 ``keep_mask = inner_win_inds < target_num_per_voxel``).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DropSpec(NamedTuple):
    """Static description of one drop level (reference DROP_INFO entry)."""

    max_tokens: int
    lower: int
    upper: int


def drop_specs_from_cfg(drop_info_cfg) -> Tuple[DropSpec, ...]:
    """Parse the reference's DROP_INFO dict ({'0': {'max_tokens':..,
    'drop_range': [lo, hi]}, ...}) into static DropSpecs sorted by level."""
    out = []
    for k in sorted(drop_info_cfg.keys(), key=int):
        v = drop_info_cfg[k]
        lo, hi = v["drop_range"] if "drop_range" in v else v["DROP_RANGE"]
        mt = v["max_tokens"] if "max_tokens" in v else v["MAX_TOKENS"]
        out.append(DropSpec(int(mt), int(lo), int(hi)))
    return tuple(out)


def packing_specs(drop_specs: Tuple[DropSpec, ...], cells: int,
                  sizes: Tuple[int, ...] = (1, 2, 4, 8, 16, 32, 64),
                  min_t: int = 1) -> Tuple[DropSpec, ...]:
    """Refine drop levels into power-of-two packing sub-levels.

    Drop semantics are IDENTICAL to ``drop_specs`` (a window in level l
    keeps its first ``min(count, l.max_tokens)`` tokens either way); the
    refinement only changes the PADDED size each window occupies in the
    bucket stream: ``next_pow2(kept)`` instead of the level's max_tokens.
    On sparse LiDAR BEV grids most windows hold 1-4 tokens while the
    shipped DROP_INFO pads them to 16 — measured ~3.4x padded-token waste
    at stage 1 of the MAE bench workload.

    Every returned ``max_tokens`` divides 128, so the whole stream stays on
    the packed 128-block attention path (:func:`plan_block_ts`).
    ``min_t`` truncates the size table from below (small sub-window levels
    produce (cap, T) plan tensors whose minor dim tiles poorly on TPU; the
    first kept size absorbs all smaller counts)."""
    sizes = tuple(t for t in sizes if t >= min_t) or (sizes[-1],)
    out = []
    for spec in drop_specs:
        m_l = min(spec.max_tokens, cells)
        lo, hi = max(spec.lower, 1), spec.upper
        for i, t in enumerate(sizes):
            # the first size in the table also absorbs all smaller counts
            # (so truncated tables like (8, 16, 32, 64) stay total)
            floor = lo if i == 0 else max(lo, t // 2 + 1)
            if t >= m_l:
                slo, shi = floor, hi
                if slo < shi:
                    out.append(DropSpec(m_l, slo, shi))
                break
            slo, shi = floor, min(hi, t + 1)
            if slo < shi:
                out.append(DropSpec(t, slo, shi))
        else:
            # max_tokens beyond the size table: keep the level unrefined
            if lo < hi:
                out.append(DropSpec(m_l, lo, hi))
    merged = [out[0]]
    for s in out[1:]:
        p = merged[-1]
        if s.max_tokens == p.max_tokens and s.lower == p.upper:
            merged[-1] = DropSpec(p.max_tokens, p.lower, s.upper)
        else:
            merged.append(s)
    return tuple(merged)


def cap_align(max_tokens: int, block: int = 128) -> int:
    """Window-capacity alignment so a level's ``cap * T`` fills whole
    ``block``-wide attention tiles (keeps :func:`plan_block_ts` valid)."""
    if block % max_tokens == 0:
        return max(8, block // max_tokens)
    return 8


class BucketPlan(NamedTuple):
    """Gather/scatter plan for ONE shift.  Lists below have one entry per
    drop level; all shapes static; everything is per-sample.

    Attributes:
        tok_src: [(B, W_l, T_l) int32] — per-sample flat cell index
            (``y*Nx + x``; or a row index into a (B, M) token list after
            :func:`plan_to_tokens`) of each bucket token; invalid slots
            point at the per-sample trash row (``Ny*Nx`` resp. ``M``).
        tok_valid: [(B, W_l, T_l) bool]
        tok_yx: [(B, W_l, T_l, 2) int32] — in-window (y, x) of each token,
            for the sinusoidal position embedding (reference
            spt_backbone.py:137-182 get_pos_embed).
        inv_idx: (B, Ny*Nx) int32 (resp. (B, M)) — for each cell/token,
            its position in the per-sample level-concatenated bucket token
            list, or ``total_tokens`` when not covered.  Built once per
            plan so the per-layer bucket->token writeback is a pure
            batched gather.
        overflow: () int32 — windows dropped because a bucket filled up
            (summed over the batch).
    """

    tok_src: Tuple[jnp.ndarray, ...]
    tok_valid: Tuple[jnp.ndarray, ...]
    tok_yx: Tuple[jnp.ndarray, ...]
    inv_idx: jnp.ndarray
    overflow: jnp.ndarray

    @property
    def total_tokens(self):
        """Per-sample length of the level-concatenated bucket list."""
        return sum(int(s.shape[-2] * s.shape[-1]) for s in self.tok_src)


def _plan_single(occ_flat, grid_hw, window, shift, drop_specs, win_caps):
    """Plan for ONE sample.  occ_flat: (Ny*Nx,) bool."""
    ny, nx = grid_hw
    wy, wx = window
    sy, sx = shift
    nwy = -(-(ny + sy) // wy)
    nwx = -(-(nx + sx) // wx)
    pad_y = nwy * wy - ny - sy
    pad_x = nwx * wx - nx - sx
    occ_pad = jnp.pad(occ_flat.reshape(ny, nx), ((sy, pad_y), (sx, pad_x)))

    g = nwy * nwx
    cells = wy * wx
    n_lvl = len(drop_specs)

    occ_win = occ_pad.reshape(nwy, wy, nwx, wx).transpose(0, 2, 1, 3)
    occ_win = occ_win.reshape(g, cells)
    counts = occ_win.sum(axis=-1).astype(jnp.int32)  # (G,)
    c_occ = jnp.cumsum(occ_win.astype(jnp.int32), axis=-1)  # (G, cells)
    # in-window compaction order (occupied cells first, raster order
    # preserved == a stable partition): ONE single-key sort over the
    # window's <=64 cells, key = (empty? 1 : 0) << bits | cell_index.
    # (XLA lowers searchsorted to a serial while-loop on TPU — measured
    # ~260 ms/step at KITTI scale for the binary-search form vs ~1 ms
    # for this small sort.)
    shift_bits = max(int(np.ceil(np.log2(max(cells, 2)))), 1)
    t_ids = jnp.arange(cells, dtype=jnp.int32)
    key = (
        (jnp.logical_not(occ_win).astype(jnp.int32) << shift_bits)
        | t_ids[None, :]
    )
    comp = (jnp.sort(key, axis=-1) & ((1 << shift_bits) - 1)).astype(jnp.int32)

    # level per window from pre-drop counts (reference spt_backbone.py:40-45)
    level = jnp.full((g,), n_lvl, jnp.int32)  # n_lvl = empty / unmatched
    for li, spec in enumerate(drop_specs):
        in_range = (counts >= max(spec.lower, 1)) & (counts < spec.upper)
        level = jnp.where(in_range, li, level)

    # bucket slot assignment: ONE stable partition of the g windows by
    # level (a single small sort) + per-level gathers.  The earlier form
    # ran a per-level ``jnp.searchsorted`` over the level cumsum, which
    # lowers to a serial scan on TPU — fine at 3 drop levels (~10 ms/step
    # at MAE-bench scale) but ~65 ms/step at 7 pow2-packing levels.
    csum_l = [jnp.cumsum((level == li).astype(jnp.int32)) for li in range(n_lvl)]
    n_per_level = [c[-1] for c in csum_l]
    # windows ordered level-major (raster-stable within a level): the
    # window at slot s of level li is sorted_wins[lvl_start[li] + s]
    sorted_wins = jnp.sort(level * g + jnp.arange(g, dtype=jnp.int32)) % g
    lvl_start = [jnp.zeros((), jnp.int32)]
    for li in range(n_lvl):
        lvl_start.append(lvl_start[-1] + n_per_level[li])
    # rank of each window within its own level (0-based)
    rank_in_level = jnp.zeros((g,), jnp.int32)
    for li in range(n_lvl):
        rank_in_level = jnp.where(level == li, csum_l[li] - 1, rank_in_level)

    # ALL levels' bucket slots in ONE (W_total, cells) computation with
    # STATIC level segmentation (trace-time numpy constants), then carved
    # into the per-level (cap, T) views by static slices.  Two failure
    # modes this form avoids (both measured on v5e):
    #   * a per-level Python loop emits O(n_lvl) copies of every op — with
    #     7 pow2 packing levels the extra ~12k HLO ops cost ~55 ms/step
    #     (kernel count, not bytes);
    #   * a flat (S,) form needs a SCALAR-granularity comp gather
    #     (comp[s*cells+r]), ~25 ms/step slower — this keeps the comp
    #     gather at 64-int row granularity.
    trash = ny * nx
    t_ls = [min(spec.max_tokens, cells) for spec in drop_specs]
    caps_np = list(win_caps)
    w_total = sum(caps_np)
    w_off = np.concatenate([[0], np.cumsum(caps_np)]).astype(np.int64)
    seg_level = np.repeat(np.arange(n_lvl), caps_np).astype(np.int32)
    seg_w = (np.arange(w_total) - w_off[seg_level]).astype(np.int32)
    # static per-window-slot column validity: col < T of the slot's level
    col_ok = (np.arange(cells)[None, :]
              < np.asarray(t_ls)[seg_level][:, None])  # (W, cells)

    seg_w_j = jnp.asarray(seg_w)
    # per-slot level scalars via static-mask where chains (see the inv
    # note below: tiny-table gathers turn into scalar-row gathers at >=4
    # levels)
    npl_w = jnp.zeros((w_total,), jnp.int32)
    start_w = jnp.zeros((w_total,), jnp.int32)
    for li in range(n_lvl):
        sel = jnp.asarray(seg_level == li)
        npl_w = jnp.where(sel, n_per_level[li], npl_w)
        start_w = jnp.where(sel, lvl_start[li], start_w)
    w_valid_w = seg_w_j < npl_w                     # (W,)
    sel_win_w = sorted_wins[jnp.clip(start_w + seg_w_j, 0, g - 1)]
    cnt_w = counts[sel_win_w]                       # (W,)
    cell_w = comp[sel_win_w]                        # (W, cells) row gather
    col = jnp.asarray(np.arange(cells, dtype=np.int32))[None, :]
    iy_w = cell_w // wx
    ix_w = cell_w % wx
    y_w = (sel_win_w // nwx)[:, None] * wy + iy_w - sy
    x_w = (sel_win_w % nwx)[:, None] * wx + ix_w - sx
    t_valid_w = (w_valid_w[:, None] & (col < cnt_w[:, None])
                 & jnp.asarray(col_ok))
    flat_w = jnp.where(t_valid_w, y_w * nx + x_w, trash).astype(jnp.int32)
    yx_w = jnp.stack([iy_w, ix_w], axis=-1).astype(jnp.int32)

    tok_src, tok_valid, tok_yx = [], [], []
    overflow = jnp.zeros((), jnp.int32)
    for li in range(n_lvl):
        a, b_ = int(w_off[li]), int(w_off[li + 1])
        t_l = t_ls[li]
        tok_src.append(flat_w[a:b_, :t_l])
        tok_valid.append(t_valid_w[a:b_, :t_l])
        tok_yx.append(yx_w[a:b_, :t_l])
        overflow = overflow + jnp.maximum(n_per_level[li] - caps_np[li], 0)

    # inverse map (cell -> position in the per-sample concat bucket list),
    # computed ANALYTICALLY per cell instead of scattering every bucket
    # slot: pos = level_offset + rank_in_level(win) * T_l + rank_in_window.
    total = sum(int(s.shape[0] * s.shape[1]) for s in tok_src)
    cy = jnp.arange(ny, dtype=jnp.int32)[:, None] + sy
    cx = jnp.arange(nx, dtype=jnp.int32)[None, :] + sx
    win_of_cell = ((cy // wy) * nwx + (cx // wx)).reshape(ny * nx)
    incell = ((cy % wy) * wx + (cx % wx)).reshape(ny * nx)
    lvl_c = level[win_of_cell]
    ril_c = rank_in_level[win_of_cell]
    # rank among occupied cells of the window (valid only for occupied)
    rank_in_win = (
        c_occ.reshape(g * cells)[win_of_cell * cells + incell] - 1)
    lvl_off = np.concatenate(
        [[0], np.cumsum([c * t for c, t in zip(caps_np, t_ls)])]).astype(np.int32)
    # per-cell level -> (offset, T, cap) via explicit WHERE chains over the
    # static per-level constants.  jnp.asarray(table)[lvl_c] lowers to a
    # select chain only up to 3 table entries; at >=4 XLA emits a
    # scalar-row gather over the (Ny*Nx,) map — measured ~40 ms/step at 7
    # pow2 packing levels (the whole pack=1 plan-cost regression).
    off_c = jnp.zeros_like(lvl_c)
    tl_c = jnp.zeros_like(lvl_c)
    cap_c = jnp.zeros_like(lvl_c)
    for li in range(n_lvl):
        sel = lvl_c == li
        off_c = jnp.where(sel, jnp.int32(lvl_off[li]), off_c)
        tl_c = jnp.where(sel, jnp.int32(t_ls[li]), tl_c)
        cap_c = jnp.where(sel, jnp.int32(caps_np[li]), cap_c)
    covered = (
        occ_flat
        & (lvl_c < n_lvl)
        & (ril_c < cap_c)
        & (rank_in_win < tl_c)
    )
    inv = jnp.where(
        covered, off_c + ril_c * tl_c + rank_in_win, total).astype(jnp.int32)

    return BucketPlan(tuple(tok_src), tuple(tok_valid), tuple(tok_yx),
                      inv, overflow)


@functools.partial(
    jax.jit,
    static_argnames=("grid_hw", "window", "shift", "drop_specs", "win_caps"),
)
def build_bucket_plan(
    occupancy: jnp.ndarray,
    grid_hw: Tuple[int, int],
    window: Tuple[int, int],
    shift: Tuple[int, int],
    drop_specs: Tuple[DropSpec, ...],
    win_caps: Tuple[int, ...],
) -> BucketPlan:
    """Build the per-sample bucket gather plan for one shift.

    Args:
        occupancy: (B, Ny, Nx) bool canvas occupancy.
        grid_hw: (Ny, Nx) static.
        window: (wy, wx) static window shape (reference WINDOW_SHAPE[:2]
            reversed to row-major).
        shift: (sy, sx) static shift offsets (0 or window//2; reference
            sst_utils.get_window_coors:18-21).
        drop_specs: static DropSpecs per level.
        win_caps: static PER-SAMPLE per-level window capacities W_l.
    """
    ny, nx = grid_hw
    b = occupancy.shape[0]
    assert occupancy.shape[1] == ny and occupancy.shape[2] == nx
    plan = jax.vmap(
        lambda o: _plan_single(o, grid_hw, window, shift, drop_specs, win_caps)
    )(occupancy.reshape(b, ny * nx))
    return plan._replace(overflow=plan.overflow.sum())


def _gather_rows_fwd_impl(rows, tok_src_list):
    b, m, c = rows.shape
    pad = jnp.concatenate([rows, jnp.zeros((b, 1, c), rows.dtype)], axis=1)
    out = []
    for src in tok_src_list:
        _, w, t = src.shape
        picked = jnp.take_along_axis(pad, src.reshape(b, w * t, 1), axis=1)
        out.append(picked.reshape(b, w, t, c))
    return out


def _scatter_rows_impl(rows, bucket_feats, inv_idx, total):
    b, m, c = rows.shape
    tokens = jnp.concatenate(
        [bf.reshape(b, -1, c) for bf in bucket_feats]
        + [jnp.zeros((b, 1, c), rows.dtype)], axis=1)
    covered = inv_idx < total  # (B, M)
    idx = jnp.minimum(inv_idx, total)
    picked = jnp.take_along_axis(tokens, idx[..., None], axis=1)
    return jnp.where(covered[..., None], picked, rows)


@jax.custom_vjp
def _gather_bucket_rows_p(rows, tok_src_list, inv_idx):
    return _gather_rows_fwd_impl(rows, tok_src_list)


def _gbr_fwd(rows, tok_src_list, inv_idx):
    out = _gather_rows_fwd_impl(rows, tok_src_list)
    return out, (tok_src_list, inv_idx, rows.shape)


def _gbr_bwd(res, g):
    # within one plan every row appears in AT MOST ONE bucket slot, so the
    # transpose of the bucket gather is itself a gather through inv_idx —
    # JAX's auto-derived transpose would be a serializing scatter-add
    tok_src_list, inv_idx, (b, m, c) = res
    total = sum(int(s.shape[-2] * s.shape[-1]) for s in tok_src_list)
    grows = _scatter_rows_impl(
        jnp.zeros((b, m, c), g[0].dtype), g, inv_idx, total)
    return (grows, [jnp.zeros_like(s) for s in tok_src_list],
            jnp.zeros_like(inv_idx))


_gather_bucket_rows_p.defvjp(_gbr_fwd, _gbr_bwd)


@jax.custom_vjp
def _scatter_bucket_rows_p(rows, bucket_feats, tok_src_list, inv_idx, total):
    return _scatter_rows_impl(rows, bucket_feats, inv_idx, total)


def _sbr_fwd(rows, bucket_feats, tok_src_list, inv_idx, total):
    out = _scatter_rows_impl(rows, bucket_feats, inv_idx, total)
    return out, (tok_src_list, inv_idx, total,
                 [bf.shape for bf in bucket_feats])


def _sbr_bwd(res, g):
    tok_src_list, inv_idx, total, bucket_shapes = res
    covered = (inv_idx < total)[..., None]
    grows = jnp.where(covered, jnp.zeros_like(g), g)
    # bucket-slot gradient: gather the row gradient back at tok_src
    # (valid slots point at unique rows; invalid slots hit the zero pad)
    gbuckets = _gather_rows_fwd_impl(jnp.where(covered, g, 0.0), tok_src_list)
    return (grows, gbuckets, [jnp.zeros_like(s) for s in tok_src_list],
            jnp.zeros_like(inv_idx), None)


_scatter_bucket_rows_p.defvjp(_sbr_fwd, _sbr_bwd)


def _gather_flat_impl(rows, src_flat):
    b, m, c = rows.shape
    pad = jnp.concatenate([rows, jnp.zeros((b, 1, c), rows.dtype)], axis=1)
    return jnp.take_along_axis(pad, src_flat[..., None], axis=1)


def _place_flat_impl(rows, flat_feats, inv_idx, total):
    b, m, c = rows.shape
    tokens = jnp.concatenate(
        [flat_feats, jnp.zeros((b, 1, c), rows.dtype)], axis=1)
    covered = inv_idx < total
    idx = jnp.minimum(inv_idx, total)
    picked = jnp.take_along_axis(tokens, idx[..., None], axis=1)
    return jnp.where(covered[..., None], picked, rows)


@jax.custom_vjp
def _gather_rows_flat_p(rows, src_flat, inv_idx):
    return _gather_flat_impl(rows, src_flat)


def _grf_fwd(rows, src_flat, inv_idx):
    return _gather_flat_impl(rows, src_flat), (src_flat, inv_idx, rows.shape)


def _grf_bwd(res, g):
    # every row appears in at most one bucket slot -> transpose is a gather
    # of the slot gradient at the row's packed position (trash -> zero)
    src_flat, inv_idx, (b, m, c) = res
    total = src_flat.shape[1]
    grows = _place_flat_impl(jnp.zeros((b, m, c), g.dtype), g, inv_idx, total)
    return (grows, jnp.zeros_like(src_flat), jnp.zeros_like(inv_idx))


_gather_rows_flat_p.defvjp(_grf_fwd, _grf_bwd)


@jax.custom_vjp
def _scatter_rows_flat_p(rows, flat_feats, src_flat, inv_idx):
    return _place_flat_impl(rows, flat_feats, inv_idx, src_flat.shape[1])


def _srf_fwd(rows, flat_feats, src_flat, inv_idx):
    total = src_flat.shape[1]
    return (_place_flat_impl(rows, flat_feats, inv_idx, total),
            (src_flat, inv_idx, total))


def _srf_bwd(res, g):
    src_flat, inv_idx, total = res
    covered = (inv_idx < total)[..., None]
    grows = jnp.where(covered, jnp.zeros_like(g), g)
    gflat = _gather_flat_impl(jnp.where(covered, g, 0.0), src_flat)
    return (grows, gflat, jnp.zeros_like(src_flat), jnp.zeros_like(inv_idx))


_scatter_rows_flat_p.defvjp(_srf_fwd, _srf_bwd)


def plan_src_flat(plan: BucketPlan):
    """Level-concatenated (B, S) row index (trash = M) — the packed-token
    order, matching ``plan.inv_idx`` positions."""
    b = plan.tok_src[0].shape[0]
    return jnp.concatenate([s.reshape(b, -1) for s in plan.tok_src], axis=1)


def plan_valid_flat(plan: BucketPlan):
    b = plan.tok_valid[0].shape[0]
    return jnp.concatenate([v.reshape(b, -1) for v in plan.tok_valid], axis=1)


def plan_yx_flat(plan: BucketPlan):
    b = plan.tok_yx[0].shape[0]
    return jnp.concatenate(
        [yx.reshape(b, -1, 2) for yx in plan.tok_yx], axis=1)


def plan_block_ts(plan: BucketPlan, block: int = 128):
    """Static per-128-block window length for the packed-token layout, or
    ``None`` when some level's W_l*T_l does not align to ``block``.

    Returns a tuple ``ts`` with one entry per block: attention over the
    packed (B, S, C) stream runs on (S//block) independent ``block``-wide
    tiles, each block-diagonal with sub-window size ``ts[i]``."""
    ts = []
    for s in plan.tok_src:
        _, w, t = s.shape
        # The packed path assumes every `block`-wide tile is an integer
        # number of whole T-sub-windows: require T | block (so sub-windows
        # never straddle a tile boundary) in addition to block | W*T.
        if (w * t) % block or t > block or block % t:
            return None
        ts.extend([t] * ((w * t) // block))
    return tuple(ts)


def packed_block_bias(ts, block: int = 128):
    """(num_blocks, block, block) additive f32 bias: 0 inside each
    T-sub-window diagonal, -1e9 elsewhere (numpy constant, trace-time)."""
    nb = len(ts)
    bias = np.full((nb, block, block), -1e9, np.float32)
    for i, t in enumerate(ts):
        for j in range(0, block, t):
            bias[i, j:j + t, j:j + t] = 0.0
    return jnp.asarray(bias)


def gather_bucket_rows_flat(rows: jnp.ndarray, plan: BucketPlan):
    """Token rows (B, M, C) -> packed (B, S, C) bucket stream (both VJP
    directions pure gathers)."""
    return _gather_rows_flat_p(rows, plan_src_flat(plan), plan.inv_idx)


def scatter_bucket_rows_flat(rows: jnp.ndarray, plan: BucketPlan,
                             flat_feats: jnp.ndarray):
    """Write the packed (B, S, C) stream back into rows (untouched rows keep
    their features); pure gathers in both VJP directions."""
    return _scatter_rows_flat_p(
        rows, flat_feats, plan_src_flat(plan), plan.inv_idx)


def gather_bucket_rows(rows: jnp.ndarray, plan: BucketPlan):
    """Token rows (B, M, C) -> list of (B, W_l, T_l, C) bucket tensors;
    the plan's ``tok_src`` holds per-sample row indices (trash = M).

    Equivalent of reference ``flat2window_v2`` (sst_utils.py:144-148).
    Both directions of the VJP are pure gathers (custom_vjp)."""
    return _gather_bucket_rows_p(rows, list(plan.tok_src), plan.inv_idx)


def scatter_bucket_rows(rows: jnp.ndarray, plan: BucketPlan, bucket_feats):
    """Write bucket tensors back into the row tensor; untouched rows keep
    their previous features.  Equivalent of reference ``window2flat_v2``
    (sst_utils.py:151-180).

    Implemented as a pure batched GATHER through the precomputed inverse
    index (plan.inv_idx) in BOTH directions of the VJP: TPU scatters
    serialize, gathers ride the full HBM bandwidth."""
    return _scatter_bucket_rows_p(
        rows, list(bucket_feats), list(plan.tok_src), plan.inv_idx,
        plan.total_tokens)


def gather_buckets(features: jnp.ndarray, plan: BucketPlan):
    """Canvas (B, Ny, Nx, C) -> list of (B, W_l, T_l, C) bucket tensors."""
    b, ny, nx, c = features.shape
    return gather_bucket_rows(features.reshape(b, ny * nx, c), plan)


def scatter_buckets(features: jnp.ndarray, plan: BucketPlan, bucket_feats):
    """Canvas-shaped wrapper around :func:`scatter_bucket_rows`."""
    b, ny, nx, c = features.shape
    out = scatter_bucket_rows(
        features.reshape(b, ny * nx, c), plan, bucket_feats)
    return out.reshape(b, ny, nx, c)


def compact_occupancy(occ: jnp.ndarray, cap: int):
    """(B, Ny, Nx) bool -> per-sample compact cell list.

    Returns ``coords (B, cap, 2) int32`` (iy, ix; raster order) and
    ``mask (B, cap) bool``.  Active cells beyond ``cap`` are dropped (the
    canvas keeps their features; they simply don't get tokens).
    """
    b, ny, nx = occ.shape
    flat = occ.reshape(b, ny * nx)

    def one(f):
        (idx,) = jnp.nonzero(f, size=cap, fill_value=ny * nx)
        valid = idx < ny * nx
        idx_c = jnp.minimum(idx, ny * nx - 1)
        return jnp.stack([idx_c // nx, idx_c % nx], -1).astype(jnp.int32), valid

    return jax.vmap(one)(flat)


def searchsorted_rows(sorted_rows: jnp.ndarray, queries: jnp.ndarray,
                      side: str = "left"):
    """Row-wise ``searchsorted``: a hand-rolled vectorized binary search.

    ``jnp.searchsorted``'s default lowering is a serial scan on TPU; this
    is log2(M) rounds of batched gathers + compares — fully vectorized.

    Args:
        sorted_rows: (B, M) nondecreasing int rows.
        queries: (B, Q) (or broadcastable) query values.
    Returns:
        (B, Q) int32 insertion positions in [0, M].
    """
    b, m_ = sorted_rows.shape
    queries = jnp.broadcast_to(queries, (b, queries.shape[-1]))
    lo = jnp.zeros(queries.shape, jnp.int32)
    hi = jnp.full(queries.shape, m_, jnp.int32)
    for _ in range(int(np.ceil(np.log2(m_ + 1)))):
        mid = (lo + hi) >> 1
        v = jnp.take_along_axis(sorted_rows, jnp.minimum(mid, m_ - 1), axis=1)
        go_right = (v < queries) if side == "left" else (v <= queries)
        go_right = go_right & (mid < hi)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


def build_cell2tok(coords: jnp.ndarray, mask: jnp.ndarray, grid_hw,
                   sorted_cells: bool = True):
    """(B, M, 2) int32 cell coords + (B, M) mask -> (B, Ny*Nx) int32 mapping
    each flat canvas cell to its per-sample token row ``m`` (or ``M`` when
    the cell holds no token).

    Default: a (Ny*Nx)-wide `.at[].set` with the sorted-indices hint —
    XLA's TPU scatter with sorted unique-ish indices is fast here.  The
    hand-rolled binary search (:func:`searchsorted_rows`) is kept opt-in
    (GDMAE_C2T_BINSEARCH): its 13 rounds of SCALAR-granularity
    take_along_axis gathers measured ~270 ms/step slower at MAE-bench
    scale (TPU gathers move (8,128) tiles; 4-byte rows waste ~100x)."""
    b, m, _ = coords.shape
    ny, nx = grid_hw
    flat = coords[..., 0] * nx + coords[..., 1]
    flat = jnp.where(mask, flat, ny * nx).astype(jnp.int32)

    import os

    if sorted_cells and os.environ.get("GDMAE_C2T_BINSEARCH"):
        q = jnp.arange(ny * nx, dtype=jnp.int32)[None]
        pos = searchsorted_rows(flat, q)  # (B, Ny*Nx) in [0, M]
        pos_c = jnp.minimum(pos, m - 1)
        match = (jnp.take_along_axis(flat, pos_c, axis=1) == q) & (pos < m)
        return jnp.where(match, pos_c, m).astype(jnp.int32)

    rows = jnp.arange(m, dtype=jnp.int32)

    def one_scatter(fl):
        c2t = jnp.full((ny * nx + 1,), m, jnp.int32)
        # sorted hint lets XLA use the vectorized scatter path; NOT
        # unique_indices — invalid rows all alias the trash cell Ny*Nx
        c2t = c2t.at[fl].set(
            rows, mode="drop", indices_are_sorted=sorted_cells)
        return c2t[:-1]

    return jax.vmap(one_scatter)(flat)


def occupancy_from_coords(coords: jnp.ndarray, mask: jnp.ndarray, grid_hw,
                          sorted_cells: bool = True):
    """(B, M, 2) int32 cell coords + (B, M) mask -> (B, Ny, Nx) bool."""
    b = coords.shape[0]
    ny, nx = grid_hw
    m = coords.shape[1]
    c2t = build_cell2tok(coords, mask, grid_hw, sorted_cells=sorted_cells)
    return (c2t < m).reshape(b, ny, nx)


def token_cell_index(coords: jnp.ndarray, mask: jnp.ndarray, grid_hw):
    """(B, M, 2) + (B, M) -> (B, M) int32 per-sample flat canvas cell of
    each token row (``Ny*Nx`` for invalid rows)."""
    ny, nx = grid_hw
    flat = coords[..., 0] * nx + coords[..., 1]
    return jnp.where(mask, flat, ny * nx).astype(jnp.int32)


def plan_to_tokens(plan: BucketPlan, cell2tok: jnp.ndarray,
                   tok_cell: jnp.ndarray, m: int) -> BucketPlan:
    """Rewrite a canvas-space BucketPlan into token-row space so encoder
    layers can gather/scatter against a compact (B, M, C) token list
    instead of the full (B, Ny*Nx, C) canvas (6-40x less HBM traffic per
    layer; the canvas is only materialized for convolutions).

    Args:
        plan: canvas-space plan from :func:`build_bucket_plan`.
        cell2tok: (B, Ny*Nx) from :func:`build_cell2tok`.
        tok_cell: (B, M) from :func:`token_cell_index`.
        m: static per-sample token capacity M.
    """
    b = cell2tok.shape[0]
    c2t = jnp.concatenate(
        [cell2tok, jnp.full((b, 1), m, jnp.int32)], axis=1)
    # ONE level-concatenated gather (per-level loops multiply kernel count)
    shapes = [s.shape[1:] for s in plan.tok_src]
    src_flat = jnp.concatenate(
        [s.reshape(b, -1) for s in plan.tok_src], axis=1)
    tv_flat = jnp.concatenate(
        [v.reshape(b, -1) for v in plan.tok_valid], axis=1)
    s_all = jnp.take_along_axis(c2t, src_flat, axis=1)
    v_all = tv_flat & (s_all < m)
    s_all = jnp.where(v_all, s_all, m).astype(jnp.int32)
    new_src, new_valid = [], []
    pos = 0
    for w, t in shapes:
        new_src.append(s_all[:, pos:pos + w * t].reshape(b, w, t))
        new_valid.append(v_all[:, pos:pos + w * t].reshape(b, w, t))
        pos += w * t
    total = plan.total_tokens
    inv_pad = jnp.concatenate(
        [plan.inv_idx, jnp.full((b, 1), total, jnp.int32)], axis=1)
    inv_tok = jnp.take_along_axis(inv_pad, tok_cell, axis=1)
    return BucketPlan(tuple(new_src), tuple(new_valid), plan.tok_yx,
                      inv_tok, plan.overflow)


def covered_mask(plan: BucketPlan, b: int, ny: int, nx: int):
    """(B, Ny, Nx) bool — cells updated by this plan's buckets."""
    return (plan.inv_idx < plan.total_tokens).reshape(b, ny, nx)


def sinusoidal_pos_embed(tok_yx, window, feat_dim, pos_temperature=1000,
                         normalize_pos=False, dtype=jnp.float32):
    """2D sinusoidal in-window position embedding.

    Matches reference SSTInputLayer.get_pos_embed (spt_backbone.py:137-182):
    centred in-window coords, per-axis sin/cos interleave, concat [x, y].

    Args:
        tok_yx: (..., 2) int32 in-window (y, x).
        window: (wy, wx) static.
        feat_dim: embedding dim (= d_model), must be even.
    Returns:
        (..., feat_dim) position embedding.
    """
    wy, wx = window
    y = tok_yx[..., 0].astype(dtype) - wy / 2
    x = tok_yx[..., 1].astype(dtype) - wx / 2
    if normalize_pos:
        x = x / wx * 2 * 3.1415
        y = y / wy * 2 * 3.1415
    pos_length = feat_dim // 2
    inv_freq = jnp.arange(pos_length, dtype=dtype)
    inv_freq = pos_temperature ** (2 * (inv_freq // 2) / pos_length)
    ex = x[..., None] / inv_freq
    ey = y[..., None] / inv_freq
    ex = jnp.stack([jnp.sin(ex[..., 0::2]), jnp.cos(ex[..., 1::2])], axis=-1)
    ey = jnp.stack([jnp.sin(ey[..., 0::2]), jnp.cos(ey[..., 1::2])], axis=-1)
    ex = ex.reshape(*ex.shape[:-2], -1)
    ey = ey.reshape(*ey.shape[:-2], -1)
    return jnp.concatenate([ex, ey], axis=-1)


def pos_embed_flat(plan: BucketPlan, window, feat_dim, pos_temperature=1000,
                   normalize_pos=False, dtype=jnp.float32):
    """Packed (B, S, C) position embeds for a plan, via ONE (wy*wx, C)
    trace-time table + a C-wide row gather (the embed depends only on the
    in-window cell, so computing sin/cos over the full (B, S, C) stream is
    wy*wx-fold redundant work + HBM traffic)."""
    wy, wx = window
    yx_all = np.stack(np.meshgrid(np.arange(wy), np.arange(wx),
                                  indexing="ij"), -1).reshape(-1, 2)
    table = sinusoidal_pos_embed(
        jnp.asarray(yx_all, jnp.int32), window, feat_dim,
        pos_temperature=pos_temperature, normalize_pos=normalize_pos,
        dtype=jnp.float32).astype(dtype)          # (wy*wx, C) constant
    yx = plan_yx_flat(plan)                        # (B, S, 2)
    cell = yx[..., 0] * wx + yx[..., 1]            # (B, S)
    return jnp.take(table, cell, axis=0)


def default_win_caps(grid_hw, window, max_pillars, drop_specs,
                     batch_size: int = 1) -> Tuple[int, ...]:
    """Heuristic per-sample per-level window capacities guaranteeing zero
    overflow.

    Level 0 can have as many windows as fit in the grid; level l>0 windows
    hold at least ``lower`` tokens so at most ``max_pillars // lower`` exist
    per sample.  Values are rounded up to a multiple of 8 for TPU-friendly
    shapes.  ``batch_size`` is kept for backward compatibility and ignored
    (buckets are per-sample).
    """
    del batch_size
    ny, nx = grid_hw
    wy, wx = window
    nw = (-(-(ny + wy // 2) // wy)) * (-(-(nx + wx // 2) // wx))
    caps = []
    for spec in drop_specs:
        lo = max(spec.lower, 1)
        cap = min(nw, -(-max_pillars // lo))
        a = cap_align(min(spec.max_tokens, wy * wx))
        caps.append(int(np.ceil(cap / a) * a))
    return tuple(caps)


# ---------------------------------------------------------------------------
# Joint-budget window packing
# ---------------------------------------------------------------------------
#
# The per-level BucketPlan pads each drop level to its own worst-case window
# count: S = sum_l cap_l * T_l with cap_l = max over samples of that level's
# population.  Samples never peak every level at once, so the static stream
# carries ~1.5-2x more padded tokens than any sample actually produces
# (measured 5120 vs 4045 at MAE-bench stage 2, 3456 vs 2452 at stage 3).
#
# A JointPlan packs ALL kept windows of a sample into ONE static token
# budget: windows are laid out in descending pow2-size order (so every
# window start is aligned to its size and no window straddles a 128-token
# attention block), and the attention mask comes from a per-slot window-id
# array instead of a static per-block sub-window size.  Drop semantics per
# window are identical to the per-level plan (first min(count, T) tokens in
# raster order); windows beyond the budget are dropped whole and counted in
# ``overflow`` (their tokens ride the residual, like per-level cap
# overflow).


class JointPlan(NamedTuple):
    """Single-budget packed gather plan for ONE shift (all shapes static,
    everything per-sample).

    Attributes:
        tok_src: (B, S) int32 flat cell index (``y*Nx + x``; or token-row
            index after :func:`joint_plan_to_tokens`); trash slots point at
            ``Ny*Nx`` (resp. ``M``).
        tok_valid: (B, S) bool.
        tok_incell: (B, S) int32 in-window cell ``iy*wx + ix`` (position
            embedding key); 0 on trash slots.
        wid: (B, S) int32 window ordinal of each slot (-1 on slots never
            written) — the attention mask is ``wid[q] == wid[k]``.
        inv_idx: (B, Ny*Nx) (resp. (B, M)) int32 packed position per cell,
            ``S`` when not covered.
        overflow: () int32 — kept windows dropped because the budget filled.
    """

    tok_src: jnp.ndarray
    tok_valid: jnp.ndarray
    tok_incell: jnp.ndarray
    wid: jnp.ndarray
    inv_idx: jnp.ndarray
    overflow: jnp.ndarray

    @property
    def total_tokens(self):
        return int(self.tok_src.shape[-1])


def _joint_plan_single(occ_flat, grid_hw, window, shift, drop_specs, budget,
                       dense_pack=False):
    """JointPlan for ONE sample.  occ_flat: (Ny*Nx,) bool; budget: static."""
    ny, nx = grid_hw
    wy, wx = window
    sy, sx = shift
    nwy = -(-(ny + sy) // wy)
    nwx = -(-(nx + sx) // wx)
    pad_y = nwy * wy - ny - sy
    pad_x = nwx * wx - nx - sx
    occ_pad = jnp.pad(occ_flat.reshape(ny, nx), ((sy, pad_y), (sx, pad_x)))

    g = nwy * nwx
    cells = wy * wx
    n_lvl = len(drop_specs)

    occ_win = occ_pad.reshape(nwy, wy, nwx, wx).transpose(0, 2, 1, 3)
    occ_win = occ_win.reshape(g, cells)
    counts = occ_win.sum(axis=-1).astype(jnp.int32)  # (G,)
    c_occ = jnp.cumsum(occ_win.astype(jnp.int32), axis=-1)
    # in-window compaction order (stable partition, see _plan_single)
    shift_bits = max(int(np.ceil(np.log2(max(cells, 2)))), 1)
    t_ids = jnp.arange(cells, dtype=jnp.int32)
    key = ((jnp.logical_not(occ_win).astype(jnp.int32) << shift_bits)
           | t_ids[None, :])
    comp = (jnp.sort(key, axis=-1) & ((1 << shift_bits) - 1)).astype(jnp.int32)

    # per-window padded size t_w (pow2 sub-level), 0 = dropped/empty
    t_ls = [min(spec.max_tokens, cells) for spec in drop_specs]
    if not dense_pack:
        assert all(t > 0 and (t & (t - 1)) == 0 and t <= 128 for t in t_ls), (
            "joint packing requires power-of-two window sizes <= 128 (the "
            f"descending-size layout keeps every window block-aligned): {t_ls}")
    t_w = jnp.zeros((g,), jnp.int32)
    for spec, t_l in zip(drop_specs, t_ls):
        in_range = (counts >= max(spec.lower, 1)) & (counts < spec.upper)
        t_w = jnp.where(in_range, t_l, t_w)
    if dense_pack:
        # TPU_JOINT_PACK: dense — windows take exactly min(count, level
        # max_tokens) slots (the level only classifies/truncates; no pow2
        # padding).  Measured ~18% smaller zero-overflow budgets at the
        # MAE bench workload (1792/3200/2304 vs 2176/4096/2560).
        t_w = jnp.where(t_w > 0, jnp.minimum(counts, t_w), 0)

    # windows sorted by DESCENDING size (then raster order): with pow2
    # sizes, every window's offset is then a multiple of its own size, so
    # no window straddles a 128-token attention block
    win_bits = max(int(np.ceil(np.log2(max(g, 2)))), 1)
    tmax = max(t_ls) if t_ls else cells
    sort_key = ((tmax + 1 - t_w) << win_bits) | jnp.arange(g, dtype=jnp.int32)
    skey = jnp.sort(sort_key)
    sorted_win = (skey & ((1 << win_bits) - 1)).astype(jnp.int32)
    sorted_t = (tmax + 1 - (skey >> win_bits)).astype(jnp.int32)
    if dense_pack:
        # next-fit over the descending sizes with 128-block alignment: a
        # window that would straddle an attention block starts the next
        # block instead (the wid mask only sees within-block equality).
        # Closed form per size run (the host twin's _nfd_offsets_np): a
        # run of equal sizes s fills the current partial block with
        # k0 = rem // s windows, then 128 // s per full block — one static
        # pass over the <= tmax candidate sizes, no sequential scan (a
        # per-window lax.scan would serialize ~G tiny steps per plan in
        # the in-graph fallback path).
        pos = jnp.arange(g, dtype=jnp.int32)

        def _nfd_body(i, carry):
            off, cur = carry
            s_val = tmax - i  # sizes descending, matching the sort order
            m_s = sorted_t == s_val
            n_s = m_s.sum()
            first = jnp.argmax(m_s).astype(jnp.int32)  # runs are contiguous
            j = pos - first
            rem = 128 - cur % 128
            k0 = rem // s_val
            kf = 128 // s_val
            blk_next = (cur // 128 + 1) * 128
            jj = j - k0
            off_s = jnp.where(j < k0, cur + j * s_val,
                              blk_next + (jj // kf) * 128 + (jj % kf) * s_val)
            off = jnp.where(m_s, off_s, off)
            jl = n_s - 1
            jjl = jl - k0
            last = jnp.where(jl < k0, cur + jl * s_val,
                             blk_next + (jjl // kf) * 128 + (jjl % kf) * s_val)
            cur = jnp.where(n_s > 0, last + s_val, cur)
            return off, cur

        off, _ = jax.lax.fori_loop(
            0, tmax, _nfd_body,
            (jnp.zeros((g,), jnp.int32), jnp.zeros((), jnp.int32)))
    else:
        off = jnp.cumsum(sorted_t) - sorted_t  # exclusive
    fits = (sorted_t > 0) & (off + sorted_t <= budget)
    overflow = jnp.sum((sorted_t > 0) & jnp.logical_not(fits))

    # packed arrays via ONE sorted scatter over (sorted-window, col) tokens
    cnt_s = counts[sorted_win]                     # (G,)
    cell_s = comp[sorted_win]                      # (G, cells) row gather
    col = jnp.arange(cells, dtype=jnp.int32)[None, :]
    tok_ok = fits[:, None] & (col < jnp.minimum(cnt_s, sorted_t)[:, None])
    slot = jnp.where(tok_ok, off[:, None] + col, budget).reshape(-1)

    iy = cell_s // wx
    ix = cell_s % wx
    y = (sorted_win // nwx)[:, None] * wy + iy - sy
    x = (sorted_win % nwx)[:, None] * wx + ix - sx
    flat_cell = (y * nx + x).reshape(-1)
    incell = cell_s.reshape(-1)
    # pack (incell | flat_cell) into one int32 scatter; wid separate.
    # cell_bits covers the largest supported grid inside int32 (incell < 64
    # needs 6 more bits; 6 + 25 = 31).
    cell_bits = max(int(np.ceil(np.log2(ny * nx + 1))), 1)
    assert cell_bits + int(np.ceil(np.log2(cells + 1))) < 32, (ny, nx, cells)
    packed_a = (incell << cell_bits) | flat_cell
    buf_a = jnp.full((budget + 1,), -1, jnp.int32).at[slot].set(
        packed_a, mode="drop", indices_are_sorted=True)[:-1]
    wid_src = jnp.broadcast_to(
        jnp.arange(g, dtype=jnp.int32)[:, None], (g, cells)).reshape(-1)
    wid = jnp.full((budget + 1,), -1, jnp.int32).at[slot].set(
        wid_src, mode="drop", indices_are_sorted=True)[:-1]

    tok_valid = buf_a >= 0
    tok_src = jnp.where(tok_valid, buf_a & ((1 << cell_bits) - 1),
                        ny * nx).astype(jnp.int32)
    tok_incell = jnp.where(tok_valid, buf_a >> cell_bits, 0).astype(jnp.int32)

    # inverse map per cell: pos = off(win) + rank among occupied cells
    pos_of_win = jnp.zeros((g,), jnp.int32).at[sorted_win].set(
        jnp.arange(g, dtype=jnp.int32), unique_indices=True)
    off_orig = off[pos_of_win]
    t_orig = sorted_t[pos_of_win]
    fits_orig = fits[pos_of_win]
    cy = jnp.arange(ny, dtype=jnp.int32)[:, None] + sy
    cx = jnp.arange(nx, dtype=jnp.int32)[None, :] + sx
    win_of_cell = ((cy // wy) * nwx + (cx // wx)).reshape(ny * nx)
    incell_c = ((cy % wy) * wx + (cx % wx)).reshape(ny * nx)
    rank_in_win = (
        c_occ.reshape(g * cells)[win_of_cell * cells + incell_c] - 1)
    covered = (occ_flat & fits_orig[win_of_cell]
               & (rank_in_win < t_orig[win_of_cell]))
    inv = jnp.where(covered, off_orig[win_of_cell] + rank_in_win,
                    budget).astype(jnp.int32)

    return JointPlan(tok_src, tok_valid, tok_incell, wid, inv, overflow)


@functools.partial(
    jax.jit,
    static_argnames=("grid_hw", "window", "shift", "drop_specs", "budget",
                     "dense_pack"),
)
def build_joint_plan(occupancy, grid_hw, window, shift, drop_specs, budget,
                     dense_pack=False):
    """Joint-budget packed plan for one shift (see :class:`JointPlan`).

    Args:
        occupancy: (B, Ny, Nx) bool.
        budget: static per-sample token budget S (multiple of 128 keeps the
            packed attention path exact).
        dense_pack: TPU_JOINT_PACK == 'dense' — next-fit-decreasing layout
            with exact window sizes instead of pow2 padding.
    """
    ny, nx = grid_hw
    b = occupancy.shape[0]
    plan = jax.vmap(
        lambda o: _joint_plan_single(o, grid_hw, window, shift, drop_specs,
                                     int(budget), dense_pack=dense_pack)
    )(occupancy.reshape(b, ny * nx))
    return plan._replace(overflow=plan.overflow.sum())


def joint_plan_to_tokens(plan: JointPlan, cell2tok, tok_cell, m: int):
    """Rewrite a canvas-space JointPlan into token-row space (the joint
    analogue of :func:`plan_to_tokens`)."""
    b = cell2tok.shape[0]
    c2t = jnp.concatenate([cell2tok, jnp.full((b, 1), m, jnp.int32)], axis=1)
    s_all = jnp.take_along_axis(c2t, plan.tok_src, axis=1)
    v_all = plan.tok_valid & (s_all < m)
    s_all = jnp.where(v_all, s_all, m).astype(jnp.int32)
    total = plan.total_tokens
    inv_pad = jnp.concatenate(
        [plan.inv_idx, jnp.full((b, 1), total, jnp.int32)], axis=1)
    inv_tok = jnp.take_along_axis(inv_pad, tok_cell, axis=1)
    return JointPlan(s_all, v_all, plan.tok_incell, plan.wid, inv_tok,
                     plan.overflow)


def joint_gather_rows(rows, plan: JointPlan):
    """(B, M, C) rows -> (B, S, C) packed stream (pure gathers both ways)."""
    return _gather_rows_flat_p(rows, plan.tok_src, plan.inv_idx)


def joint_scatter_rows(rows, plan: JointPlan, flat_feats):
    """Write the packed stream back into rows (uncovered rows unchanged)."""
    return _scatter_rows_flat_p(rows, flat_feats, plan.tok_src, plan.inv_idx)


def incell_pos_table(window, feat_dim, pos_temperature=1000,
                     normalize_pos=False, dtype=jnp.float32):
    """(wy*wx, C) sinusoidal pos-embed table keyed by in-window cell
    ``iy*wx + ix`` (the JointPlan ``tok_incell`` key)."""
    wy, wx = window
    yx_all = np.stack(np.meshgrid(np.arange(wy), np.arange(wx),
                                  indexing="ij"), -1).reshape(-1, 2)
    return sinusoidal_pos_embed(
        jnp.asarray(yx_all, jnp.int32), window, feat_dim,
        pos_temperature=pos_temperature, normalize_pos=normalize_pos,
        dtype=jnp.float32).astype(dtype)


def joint_pos_embed_flat(plan: JointPlan, window, feat_dim,
                         pos_temperature=1000, normalize_pos=False,
                         dtype=jnp.float32):
    """Packed (B, S, C) position embeds via the (wy*wx, C) table gather."""
    table = incell_pos_table(window, feat_dim,
                             pos_temperature=pos_temperature,
                             normalize_pos=normalize_pos, dtype=dtype)
    return jnp.take(table, plan.tok_incell, axis=0)


def default_joint_budget(grid_hw, window, max_pillars,
                         dilate: bool = False) -> int:
    """Conservative static joint budget: every occupied cell costs at most
    ~2x padding (pow2 rounding per window), bounded by the grid."""
    ny, nx = grid_hw
    cells = min(ny * nx, max_pillars * (4 if dilate else 1))
    return int(-(-min(2 * cells, ny * nx) // 128) * 128)
