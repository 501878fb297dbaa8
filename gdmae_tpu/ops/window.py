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

Every output is fixed-capacity: level ``l`` owns a ``(W_l, T_l)`` bucket of
canvas gather indices + validity masks. Windows beyond a bucket's capacity are
counted in ``overflow`` and simply not attended (their features pass through
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


class BucketPlan(NamedTuple):
    """Gather/scatter plan for ONE shift.  Lists below have one entry per
    drop level; all shapes static.

    Attributes:
        tok_src: [(W_l, T_l) int32] — flattened canvas index (b*Ny*Nx + y*Nx
            + x) of each bucket token; invalid slots point at the trash row
            ``B*Ny*Nx``.
        tok_valid: [(W_l, T_l) bool]
        tok_yx: [(W_l, T_l, 2) int32] — in-window (y, x) of each token, for
            the sinusoidal position embedding (reference
            spt_backbone.py:137-182 get_pos_embed).
        inv_idx: (B*Ny*Nx,) int32 — for each canvas cell, its position in
            the level-concatenated bucket token list, or ``total_tokens``
            when not covered.  Built once per plan so the per-layer
            bucket->canvas writeback is a pure gather (TPU scatters are
            slow; one int32 scatter here replaces C-wide feature scatters
            in every encoder layer).
        overflow: () int32 — windows dropped because a bucket filled up.
    """

    tok_src: Tuple[jnp.ndarray, ...]
    tok_valid: Tuple[jnp.ndarray, ...]
    tok_yx: Tuple[jnp.ndarray, ...]
    inv_idx: jnp.ndarray
    overflow: jnp.ndarray

    @property
    def total_tokens(self):
        return sum(int(s.shape[0] * s.shape[1]) for s in self.tok_src)


def _window_counts_and_compaction(occ_pad, b, nwy, nwx, wy, wx):
    """occ_pad: (B, nwy*wy, nwx*wx) bool -> per-window counts and in-window
    compaction order (occupied cells first, raster order preserved)."""
    cells = wy * wx
    occ_win = occ_pad.reshape(b, nwy, wy, nwx, wx)
    occ_win = occ_win.transpose(0, 1, 3, 2, 4).reshape(b * nwy * nwx, cells)
    counts = occ_win.sum(axis=-1).astype(jnp.int32)  # (G,)
    # stable sort pushes unoccupied cells to the back, keeps raster order
    comp = jnp.argsort(jnp.logical_not(occ_win), axis=-1, stable=True)
    return occ_win, counts, comp.astype(jnp.int32)


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
    """Build the bucket gather plan for one shift.

    Args:
        occupancy: (B, Ny, Nx) bool canvas occupancy.
        grid_hw: (Ny, Nx) static.
        window: (wy, wx) static window shape (reference WINDOW_SHAPE[:2]
            reversed to row-major).
        shift: (sy, sx) static shift offsets (0 or window//2; reference
            sst_utils.get_window_coors:18-21).
        drop_specs: static DropSpecs per level.
        win_caps: static per-level window capacities W_l.
    """
    ny, nx = grid_hw
    wy, wx = window
    sy, sx = shift
    b = occupancy.shape[0]
    assert occupancy.shape[1] == ny and occupancy.shape[2] == nx
    nwy = -(-(ny + sy) // wy)
    nwx = -(-(nx + sx) // wx)
    pad_y = nwy * wy - ny - sy
    pad_x = nwx * wx - nx - sx
    occ_pad = jnp.pad(occupancy, ((0, 0), (sy, pad_y), (sx, pad_x)))

    g = b * nwy * nwx
    cells = wy * wx
    n_lvl = len(drop_specs)

    occ_win, counts, comp = _window_counts_and_compaction(occ_pad, b, nwy, nwx, wy, wx)

    # level per window from pre-drop counts (reference spt_backbone.py:40-45)
    level = jnp.full((g,), n_lvl, jnp.int32)  # n_lvl = empty / unmatched
    for li, spec in enumerate(drop_specs):
        in_range = (counts >= max(spec.lower, 1)) & (counts < spec.upper)
        level = jnp.where(in_range, li, level)

    # bucket slot assignment: one stable sort groups windows by level
    order = jnp.argsort(level, stable=True)  # (G,) window ids sorted by level
    sorted_level = level[order]
    idx = jnp.arange(g, dtype=jnp.int32)
    # offset of each level's run in the sorted array
    offsets = jnp.searchsorted(sorted_level, jnp.arange(n_lvl + 1, dtype=jnp.int32))

    # canvas flat index of cell c of window w (padded coords -> true coords)
    win_ids = order  # window id at each sorted position
    bb = win_ids // (nwy * nwx)
    wrem = win_ids % (nwy * nwx)
    wyi = wrem // nwx
    wxi = wrem % nwx

    tok_src, tok_valid, tok_yx = [], [], []
    overflow = jnp.zeros((), jnp.int32)
    trash = b * ny * nx
    for li, spec in enumerate(drop_specs):
        cap = win_caps[li]
        t_l = min(spec.max_tokens, cells)
        # the windows of this level occupy sorted positions
        # [offsets[li], offsets[li+1]); take the first cap of them
        pos = offsets[li] + jnp.arange(cap, dtype=jnp.int32)
        w_valid = pos < offsets[li + 1]
        pos_c = jnp.clip(pos, 0, g - 1)
        sel_win = win_ids[pos_c]            # (cap,) window ids
        sel_b = bb[pos_c]
        sel_wy = wyi[pos_c]
        sel_wx = wxi[pos_c]
        sel_cnt = counts[sel_win]

        cell = comp[sel_win][:, :t_l]       # (cap, t_l) in-window cell index
        iy = cell // wx
        ix = cell % wx
        y = sel_wy[:, None] * wy + iy - sy  # true canvas coords
        x = sel_wx[:, None] * wx + ix - sx
        t_valid = (
            w_valid[:, None]
            & (jnp.arange(t_l, dtype=jnp.int32)[None, :] < sel_cnt[:, None])
        )
        flat = sel_b[:, None] * (ny * nx) + y * nx + x
        flat = jnp.where(t_valid, flat, trash)
        tok_src.append(flat.astype(jnp.int32))
        tok_valid.append(t_valid)
        tok_yx.append(jnp.stack([iy, ix], axis=-1).astype(jnp.int32))
        overflow = overflow + jnp.maximum(offsets[li + 1] - offsets[li] - cap, 0)

    # inverse map: canvas cell -> position in the concatenated bucket list
    total = sum(int(s.shape[0] * s.shape[1]) for s in tok_src)
    inv = jnp.full((b * ny * nx + 1,), total, jnp.int32)
    off = 0
    for src, tv in zip(tok_src, tok_valid):
        size = int(src.shape[0] * src.shape[1])
        pos = off + jnp.arange(size, dtype=jnp.int32)
        tgt = jnp.where(tv.reshape(-1), src.reshape(-1), b * ny * nx)
        inv = inv.at[tgt].set(pos, mode="drop")
        off += size
    inv = inv.at[b * ny * nx].set(total)  # trash never counts as covered

    return BucketPlan(tuple(tok_src), tuple(tok_valid), tuple(tok_yx),
                      inv[:-1], overflow)


def gather_buckets(features: jnp.ndarray, plan: BucketPlan):
    """Canvas (B, Ny, Nx, C) -> list of (W_l, T_l, C) bucket tensors.

    Equivalent of reference ``flat2window_v2`` (sst_utils.py:144-148)."""
    b, ny, nx, c = features.shape
    flat = features.reshape(b * ny * nx, c)
    flat = jnp.concatenate([flat, jnp.zeros((1, c), flat.dtype)], axis=0)
    return [flat[src] for src in plan.tok_src]


def scatter_buckets(features: jnp.ndarray, plan: BucketPlan, bucket_feats):
    """Write bucket tensors back onto the canvas; untouched cells keep their
    previous features.  Equivalent of reference ``window2flat_v2``
    (sst_utils.py:151-180).

    Implemented as a pure GATHER through the precomputed inverse index
    (plan.inv_idx): TPU scatters serialize, gathers ride the full HBM
    bandwidth."""
    b, ny, nx, c = features.shape
    flat = features.reshape(b * ny * nx, c)
    tokens = jnp.concatenate(
        [bf.reshape(-1, c) for bf in bucket_feats]
        + [jnp.zeros((1, c), features.dtype)], axis=0)
    total = plan.total_tokens
    covered = plan.inv_idx < total
    picked = tokens[jnp.minimum(plan.inv_idx, total)]
    out = jnp.where(covered[:, None], picked, flat)
    return out.reshape(b, ny, nx, c)


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


def default_win_caps(grid_hw, window, max_pillars, drop_specs,
                     batch_size: int = 1) -> Tuple[int, ...]:
    """Heuristic per-level window capacities guaranteeing zero overflow.

    Buckets are global across the batch, so capacities scale with
    ``batch_size``.  Level 0 can have as many windows as fit in the grid;
    level l>0 windows hold at least ``lower`` tokens so at most
    ``max_pillars // lower`` exist per sample.  Values are rounded up to a
    multiple of 8 for TPU-friendly shapes.
    """
    ny, nx = grid_hw
    wy, wx = window
    nw = (-(-(ny + wy // 2) // wy)) * (-(-(nx + wx // 2) // wx))
    caps = []
    for spec in drop_specs:
        lo = max(spec.lower, 1)
        cap = min(nw, -(-max_pillars // lo)) * batch_size
        caps.append(int(np.ceil(cap / 8) * 8))
    return tuple(caps)
