"""Fixed-capacity scatter/segment primitives and dynamic pillarization.

TPU-native replacements for torch_scatter + ``coords.unique(return_inverse)``
(reference pcdet/models/backbones_3d/vfe/dyn_vfe.py:68-113) and for the
``sst_ops`` CUDA extension's ``get_inner_win_inds`` / ``group_inner_inds``
(reference pcdet/ops/sst_ops/src/sst_ops_gpu.cu:14-39).

Design: every op takes fixed-shape padded arrays + validity masks. "Unique"
is sort-based: tokens are sorted by key, run starts mark unique values, and a
cumulative count yields dense ranks. All shapes are static; overflow beyond a
capacity spills into a trash slot (index == capacity) that callers discard.
"""
from __future__ import annotations

import functools
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def _run_bounds(segment_ids, num_segments):
    """For NONDECREASING segment_ids: (starts, ends) of each segment's run
    — a vectorized binary search (no sort, no scatter)."""
    q = jnp.arange(num_segments, dtype=segment_ids.dtype)
    starts = jnp.searchsorted(segment_ids, q, side="left")
    ends = jnp.searchsorted(segment_ids, q, side="right")
    return starts, ends


def _segmented_scan(values, segment_ids, op):
    """Inclusive segmented scan along axis 0 (runs reset at segment
    boundaries).  Exact, log-depth, no scatters — the TPU-friendly form of
    a sorted-segment reduction (jax.ops.segment_* lower to scatters, which
    serialize per update: measured 127 ms for 1M x 128 vs ~25 ms here)."""

    def comb(a, b):
        av, ai = a
        bv, bi = b
        same = (ai == bi)
        same = same[(...,) + (None,) * (av.ndim - same.ndim)]
        return (jnp.where(same, op(av, bv), bv), bi)

    v, _ = jax.lax.associative_scan(comb, (values, segment_ids))
    return v


def _sorted_segment_reduce(values, segment_ids, num_segments, op, fill=0.0):
    n = values.shape[0]
    scanned = _segmented_scan(values, segment_ids, op)
    starts, ends = _run_bounds(segment_ids, num_segments)
    out = scanned[jnp.clip(ends - 1, 0, n - 1)]
    empty = (ends == starts)[(...,) + (None,) * (values.ndim - 1)]
    return jnp.where(empty, jnp.asarray(fill, values.dtype), out)


# NOTE (measured on v5e, 1M x 128): a segmented-associative-scan variant of
# these reductions is SLOWER than XLA's scatter lowering (fwd 172 vs 144 ms,
# fwd+bwd 247 vs 90 ms) and differentiating through the scan explodes
# memory, so the sorted path just forwards the hint to jax.ops.

def segment_sum(values, segment_ids, num_segments, indices_are_sorted=False):
    return jax.ops.segment_sum(values, segment_ids, num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_mean(values, segment_ids, num_segments, eps=1e-9,
                 indices_are_sorted=False):
    sums = jax.ops.segment_sum(values, segment_ids, num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)
    ones = jnp.ones(values.shape[:1], dtype=values.dtype)
    counts = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments,
                                 indices_are_sorted=indices_are_sorted)
    return sums / jnp.clip(counts[(...,) + (None,) * (values.ndim - 1)], eps, None)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_max(values, segment_ids, num_segments, indices_are_sorted=False):
    """Max per segment; empty segments get 0 (torch_scatter.scatter_max pads 0
    for empty outputs in the reference's usage on ReLU'd features).

    Custom VJP — two tie rules, both valid subgradients, identical whenever
    a segment's max is attained uniquely:

    * default (TIE-SPLITTING): the cotangent splits evenly across tied
      maxima.  ~5 ms/step cheaper than the bookkeeping below on v5e
      (147.0 vs 152.0 ms full MAE step, PERFORMANCE.md r4), and measured
      BIT-IDENTICAL to first-winner through the whole detection graph on
      realistic continuous features — ties simply do not occur there
      (tests/test_train_trajectory.py::test_segmax_split_gradient_deviation
      measured 0.0 per-tensor deviation, r5).
    * ``GDMAE_SEGMAX_BWD=exact``: routed to the FIRST element attaining the
      max, matching torch_scatter.scatter_max's argmax-indexed backward
      (reference dyn_vfe.py:107-113) — pinned by the torch-parity suites so
      degenerate tied inputs cannot silently diverge them."""
    out = jax.ops.segment_max(values, segment_ids, num_segments=num_segments,
                              indices_are_sorted=indices_are_sorted)
    return jnp.where(jnp.isneginf(out), 0.0, out)


def _segment_max_fwd(values, segment_ids, num_segments, indices_are_sorted):
    out = segment_max(values, segment_ids, num_segments, indices_are_sorted)
    return out, (values, segment_ids, out)


def _segment_max_bwd(num_segments, indices_are_sorted, res, g):
    import os
    values, segment_ids, out = res
    n = values.shape[0]
    mode = os.environ.get("GDMAE_SEGMAX_BWD", "split")
    is_max = values == out[segment_ids]
    if mode == "split":
        # DEFAULT: tie-splitting backward (see segment_max docstring);
        # GDMAE_SEGMAX_BWD=exact restores torch_scatter first-winner parity
        num = jax.ops.segment_sum(
            is_max.astype(values.dtype), segment_ids,
            num_segments=num_segments, indices_are_sorted=indices_are_sorted)
        gv = jnp.where(
            is_max, (g / jnp.maximum(num, 1))[segment_ids], 0
        ).astype(values.dtype)
        return gv, np.zeros(segment_ids.shape, dtype=jax.dtypes.float0)
    if indices_are_sorted and mode == "sorted":
        # sorted-segment alternative: the first max within each contiguous
        # run is the element whose within-run inclusive count of maxima is
        # 1 — ONE native cumsum + a row gather at run starts, no (N,C) i32
        # segment-min scatter.  Measured NEUTRAL vs the segment-min form on
        # v5e (216.0 vs 213.6 ms full step at ~9 ms probes, r4 sweep), so
        # the simpler scatter form below stays the default; kept as an
        # opt-in (GDMAE_SEGMAX_BWD=sorted) for chips where scatters hurt
        i_n = jnp.arange(n, dtype=jnp.int32)
        new_run = jnp.concatenate(
            [jnp.ones((1,), bool), segment_ids[1:] != segment_ids[:-1]])
        run_start = jax.lax.cummax(jnp.where(new_run, i_n, 0))  # (N,)
        cs = jnp.cumsum(is_max.astype(jnp.int32), axis=0)       # (N, ...)
        prev = jnp.clip(run_start - 1, 0, n - 1)
        base = jnp.where(
            (run_start > 0)[(...,) + (None,) * (values.ndim - 1)],
            cs[prev], 0)
        winner = is_max & (cs - base == 1)
    else:
        idx = jnp.arange(n, dtype=jnp.int32)
        idx = idx.reshape((n,) + (1,) * (values.ndim - 1))
        cand = jnp.where(is_max, idx, n)
        first = jax.ops.segment_min(
            jnp.broadcast_to(cand, values.shape), segment_ids,
            num_segments=num_segments, indices_are_sorted=indices_are_sorted)
        winner = idx == first[segment_ids]
    gv = jnp.where(winner, g[segment_ids], 0).astype(values.dtype)
    return gv, np.zeros(segment_ids.shape, dtype=jax.dtypes.float0)


segment_max.defvjp(_segment_max_fwd, _segment_max_bwd)


def segment_min(values, segment_ids, num_segments):
    out = jax.ops.segment_min(values, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isposinf(out), 0.0, out)


def segment_argmin(values, segment_ids, num_segments):
    """Index (into the value array) of the min value per segment; empty
    segments get index == len(values)."""
    n = values.shape[0]
    mins = jax.ops.segment_min(values, segment_ids, num_segments=num_segments)
    is_min = values <= mins[segment_ids]
    cand = jnp.where(is_min, jnp.arange(n), n)
    return jax.ops.segment_min(cand, segment_ids, num_segments=num_segments)


def rank_within_group(group_ids, valid, sentinel=None):
    """Dense 0-based rank of each element within its group (by element order).

    TPU-native equivalent of sst_ops ``get_inner_win_inds`` (reference
    sst_ops_gpu.cu:14-20, atomicAdd-based). Deterministic: ranks follow the
    original element order. Invalid elements get rank N.

    Args:
        group_ids: (N,) int32
        valid: (N,) bool
    Returns:
        ranks: (N,) int32; invalid -> N.
    """
    n = group_ids.shape[0]
    big = jnp.iinfo(jnp.int32).max if sentinel is None else sentinel
    key = jnp.where(valid, group_ids, big)
    order = jnp.argsort(key, stable=True)
    sorted_key = key[order]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_key[1:] != sorted_key[:-1]])
    start_idx = jnp.where(is_start, idx, 0)
    run_start = jax.lax.associative_scan(jnp.maximum, start_idx)
    rank_sorted = idx - run_start
    ranks = jnp.zeros(n, jnp.int32).at[order].set(rank_sorted)
    return jnp.where(valid, ranks, n)


class PillarizeResult(NamedTuple):
    """Output of dynamic pillarization for ONE sample (vmap over batch).

    Attributes:
        pillar_coords: (M, 2) int32 [iy, ix]; undefined rows masked out.
        pillar_mask: (M,) bool — slot holds a real pillar.
        point_pillar: (N,) int32 in [0, M] — pillar slot per point IN SORTED
            ORDER (i.e. of point ``point_order[i]``); M = trash (invalid
            point or capacity overflow).  Nondecreasing, so segment
            reductions over it take the fast sorted path.
        point_order: (N,) int32 — permutation sorting points by pillar slot
            (valid pillars first, grouped contiguously).
        pillar_start: (M,) int32 — start offset of each pillar's run in
            ``point_order``.
        pillar_count: (M,) int32 — number of points in each pillar.
        num_pillars: () int32 — number of real pillars (pre-capacity-clip).
    """

    pillar_coords: jnp.ndarray
    pillar_mask: jnp.ndarray
    point_pillar: jnp.ndarray
    point_order: jnp.ndarray
    pillar_start: jnp.ndarray
    pillar_count: jnp.ndarray
    num_pillars: jnp.ndarray


def dynamic_pillarize(points_xyz, point_mask, pc_range, voxel_size, grid_size, max_pillars):
    """Dynamic (hash-free) voxelization of one sample onto a BEV pillar grid.

    TPU-native equivalent of DynVFE's in-range mask + ``unique(return_inverse)``
    (reference dyn_vfe.py:65-68 and common_utils.get_in_range_mask). Pillars
    are ordered by linear cell index (deterministic).

    Args:
        points_xyz: (N, 3+) float — only xyz used.
        point_mask: (N,) bool — padding mask.
        pc_range: (6,) [x0, y0, z0, x1, y1, z1]
        voxel_size: (3,) [vx, vy, vz]
        grid_size: (nx, ny) static ints
        max_pillars: M static int
    Returns:
        PillarizeResult (see class docstring) plus in-range point validity is
        folded into point_pillar == M.
    """
    n = points_xyz.shape[0]
    nx, ny = int(grid_size[0]), int(grid_size[1])
    nz = int(grid_size[2]) if len(grid_size) > 2 else 1
    pc_range = jnp.asarray(pc_range, dtype=points_xyz.dtype)
    voxel_size = jnp.asarray(voxel_size, dtype=points_xyz.dtype)

    fx = (points_xyz[:, 0] - pc_range[0]) / voxel_size[0]
    fy = (points_xyz[:, 1] - pc_range[1]) / voxel_size[1]
    fz = (points_xyz[:, 2] - pc_range[2]) / voxel_size[2]
    ix = jnp.floor(fx).astype(jnp.int32)
    iy = jnp.floor(fy).astype(jnp.int32)
    iz = jnp.floor(fz).astype(jnp.int32)
    in_range = (
        (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny) & (iz >= 0) & (iz < nz)
        & point_mask
    )
    sentinel = nx * ny * nz
    pid = jnp.where(in_range, (iz * ny + iy) * nx + ix, sentinel)

    order = jnp.argsort(pid, stable=True)
    sorted_pid = pid[order]
    valid_sorted = sorted_pid < sentinel
    is_first = valid_sorted & jnp.concatenate(
        [jnp.ones((1,), bool), sorted_pid[1:] != sorted_pid[:-1]])
    rank_sorted = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # pillar slot per sorted point
    num_pillars = jnp.sum(is_first.astype(jnp.int32))
    in_cap = valid_sorted & (rank_sorted < max_pillars)
    slot_sorted = jnp.where(in_cap, rank_sorted, max_pillars)

    # pillar tables via run-start COMPACTION: a second small sort moves the
    # run-start positions of the first M pillars into slots 0..M-1, and
    # counts fall out as differences of consecutive starts.  TPU scatters
    # serialize per update (the histogram `.at[].add` form measured ~120 ms
    # at 32x16384; searchsorted lowers to a serial while-loop, ~140 ms) —
    # a 16k i32 sort is ~4 ms.
    idx = jnp.arange(n, dtype=jnp.int32)
    start_or_big = jnp.where(is_first & in_cap, idx, n)
    starts = jax.lax.sort(start_or_big)[:max_pillars]
    n_eff = jnp.sum(in_cap.astype(jnp.int32))  # points in capped pillars
    next_start = jnp.concatenate(
        [starts[1:], jnp.full((1,), n, jnp.int32)])
    counts = (jnp.minimum(next_start, n_eff)
              - jnp.minimum(starts, n_eff)).astype(jnp.int32)
    pillar_mask = counts > 0
    lin = jnp.where(
        pillar_mask, sorted_pid[jnp.clip(starts, 0, n - 1)], 0)
    if nz > 1:
        piz = lin // (nx * ny)
        piy = (lin // nx) % ny
        pix = lin % nx
        pillar_coords = jnp.stack([piz, piy, pix], axis=-1)
    else:
        piy = lin // nx
        pix = lin % nx
        pillar_coords = jnp.stack([piy, pix], axis=-1)

    return PillarizeResult(
        pillar_coords=pillar_coords.astype(jnp.int32),
        pillar_mask=pillar_mask,
        point_pillar=slot_sorted.astype(jnp.int32),
        point_order=order.astype(jnp.int32),
        pillar_start=starts,
        pillar_count=counts.astype(jnp.int32),
        num_pillars=num_pillars,
    )


def group_points_wrap(values, res: PillarizeResult, k: int):
    """Gather the first k points of each pillar, wrap-repeating to fill.

    TPU-native equivalent of sst_ops ``group_inner_inds`` (reference
    sst_ops_gpu.cu:22-39; used by the MAE target assigner,
    spt_backbone_mae.py:67). Empty pillars return zeros.

    Args:
        values: (N, C) per-point values.
        res: PillarizeResult for the same sample.
        k: number of points per pillar (static).
    Returns:
        (M, k, C) grouped values.
    """
    m = res.pillar_start.shape[0]
    n = values.shape[0]
    kk = jnp.arange(k, dtype=jnp.int32)[None, :]  # (1, k)
    cnt = jnp.clip(res.pillar_count[:, None], 1, None)
    # kk mod cnt with a DYNAMIC divisor: TPUs have no integer divide (XLA
    # expands `%` into a huge per-element sequence — measured 700 ms for
    # this op alone at (8192, 64) x batch 64).  kk <= 64 fits f32 exactly,
    # so float-reciprocal division + one off-by-one correction is exact
    # and runs at full VPU rate.
    q = (kk.astype(jnp.float32) * (1.0 / cnt.astype(jnp.float32))).astype(jnp.int32)
    r = kk - q * cnt
    r = jnp.where(r < 0, r + cnt, r)
    r = jnp.where(r >= cnt, r - cnt, r)
    pos = res.pillar_start[:, None] + r  # (M, k) into point_order
    gather_idx = res.point_order[jnp.clip(pos, 0, n - 1)]  # (M, k) into values
    out = values[gather_idx]
    valid = (res.pillar_count > 0)[:, None, None]
    return jnp.where(valid, out, 0.0)


def group_points_padded(values, res: PillarizeResult, k: int):
    """First ``min(count, k)`` points of each pillar + validity mask.

    Same point SET as :func:`group_points_wrap` (reference sst_ops
    ``group_inner_inds``) but padded-with-mask instead of wrap-repeated,
    which lets the whole grouping be ONE contiguous-slice gather per pillar
    (points are stored as pillar-sorted runs) instead of M*k tiny row
    gathers — TPU gathers move (8,128) tiles, so 12-byte row gathers waste
    ~100x bandwidth.  Consumers must honor the mask (e.g. chamfer gt_mask);
    versus wrap-repeat this reweights multi-point pillars' gt->pred term by
    at most one part in k/count.

    Args:
        values: (N, C) per-point values IN PILLAR-SORTED ORDER (i.e. after
            the VFE reorder; ``res.point_order`` must be the identity).
        res: PillarizeResult for the same sample.
        k: points per pillar (static).
    Returns:
        (M, k, C) grouped values (zeros past count), (M, k) bool mask.
    """
    n, c = values.shape
    m = res.pillar_start.shape[0]
    # ONE sorted scatter: point i (pillar-sorted) lands at slot
    # pillar_i * k + rank_i.  The per-pillar rank comes from a cummax over
    # run boundaries — no gathers.  (An M-wide vmapped dynamic_slice form
    # measured ~39 ms/step at MAE-bench scale: 131k tiny slices.)
    pil = res.point_pillar.astype(jnp.int32)       # (N,) nondecreasing
    i_n = jnp.arange(n, dtype=jnp.int32)
    new_run = jnp.concatenate(
        [jnp.ones((1,), bool), pil[1:] != pil[:-1]])
    run_start = jax.lax.cummax(jnp.where(new_run, i_n, 0))
    rank = i_n - run_start                          # (N,) rank within pillar
    ok = (rank < k) & (pil >= 0) & (pil < m)
    slot = jnp.where(ok, pil * k + rank, m * k)     # sorted nondecreasing
    out = jnp.zeros((m * k + 1, c), values.dtype)
    out = out.at[slot].set(values, mode="drop", indices_are_sorted=True)
    blocks = out[:-1].reshape(m, k, c)
    mask = (jnp.arange(k, dtype=jnp.int32)[None, :]
            < jnp.minimum(res.pillar_count, k)[:, None])
    # no `blocks * mask` pass: the scatter writes exactly the slots the mask
    # covers (rank < min(count, k)), everything else stays zero — the
    # multiply would re-stream the whole (M, k, C) tensor for an identity
    return blocks, mask


def random_masking(key, valid_mask, mask_ratio):
    """Per-set random masking with an exact per-sample count.

    TPU-native equivalent of common_utils.random_masking (reference
    pcdet/utils/common_utils.py:49-63): keep ``floor(n_valid*(1-ratio))``
    elements chosen uniformly; returns mask with 1 = masked/dropped
    (invalid slots are marked masked too).

    Args:
        key: jax PRNG key
        valid_mask: (M,) bool
        mask_ratio: python float
    Returns:
        (M,) float32 mask, 1.0 = masked.
    """
    m = valid_mask.shape[0]
    noise = jax.random.uniform(key, (m,))
    noise = jnp.where(valid_mask, noise, jnp.inf)
    # rank of each slot among valid by noise
    order = jnp.argsort(noise)
    ranks = jnp.zeros(m, jnp.int32).at[order].set(jnp.arange(m, dtype=jnp.int32))
    n_valid = valid_mask.sum()
    len_keep = (n_valid.astype(jnp.float32) * (1.0 - mask_ratio)).astype(jnp.int32)
    keep = (ranks < len_keep) & valid_mask
    return jnp.where(keep, 0.0, 1.0)
