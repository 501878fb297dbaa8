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

from typing import NamedTuple

import jax
import jax.numpy as jnp


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


def segment_max(values, segment_ids, num_segments, indices_are_sorted=False):
    """Max per segment; empty segments get 0 (torch_scatter.scatter_max pads 0
    for empty outputs in the reference's usage on ReLU'd features)."""
    out = jax.ops.segment_max(values, segment_ids, num_segments=num_segments,
                              indices_are_sorted=indices_are_sorted)
    return jnp.where(jnp.isneginf(out), 0.0, out)


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
        point_pillar: (N,) int32 in [0, M] — pillar slot per point; M = trash
            (invalid point or capacity overflow).
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
    idx = jnp.arange(n, dtype=jnp.int32)
    is_first = valid_sorted & jnp.concatenate(
        [jnp.ones((1,), bool), sorted_pid[1:] != sorted_pid[:-1]])
    rank_sorted = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # pillar slot per sorted point
    num_pillars = jnp.sum(is_first.astype(jnp.int32))
    slot_sorted = jnp.where(valid_sorted & (rank_sorted < max_pillars), rank_sorted, max_pillars)

    point_pillar = jnp.full((n,), max_pillars, jnp.int32).at[order].set(slot_sorted)

    # pillar tables (size M+1; trash row last, sliced off)
    coords_flat = jnp.full((max_pillars + 1,), sentinel, jnp.int32)
    coords_flat = coords_flat.at[jnp.where(is_first, slot_sorted, max_pillars)].set(
        jnp.where(is_first, sorted_pid, sentinel))
    pillar_mask = coords_flat[:max_pillars] < sentinel
    lin = jnp.where(pillar_mask, coords_flat[:max_pillars], 0)
    if nz > 1:
        piz = lin // (nx * ny)
        piy = (lin // nx) % ny
        pix = lin % nx
        pillar_coords = jnp.stack([piz, piy, pix], axis=-1)
    else:
        piy = lin // nx
        pix = lin % nx
        pillar_coords = jnp.stack([piy, pix], axis=-1)

    starts = jnp.zeros((max_pillars + 1,), jnp.int32).at[
        jnp.where(is_first, slot_sorted, max_pillars)
    ].set(jnp.where(is_first, idx, 0))
    ones = (slot_sorted < max_pillars).astype(jnp.int32)
    counts = jax.ops.segment_sum(ones, slot_sorted, num_segments=max_pillars + 1)

    return PillarizeResult(
        pillar_coords=pillar_coords,
        pillar_mask=pillar_mask,
        point_pillar=point_pillar,
        point_order=order.astype(jnp.int32),
        pillar_start=starts[:max_pillars],
        pillar_count=counts[:max_pillars],
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
    pos = res.pillar_start[:, None] + kk % cnt  # (M, k) into point_order
    gather_idx = res.point_order[jnp.clip(pos, 0, n - 1)]  # (M, k) into values
    out = values[gather_idx]
    valid = (res.pillar_count > 0)[:, None, None]
    return jnp.where(valid, out, 0.0)


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
