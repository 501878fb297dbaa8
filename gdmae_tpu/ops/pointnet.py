"""Point-set primitives: masked FPS, ball query, kNN, three-interpolate.

TPU-native equivalents of the reference ``pointnet2_batch_cuda`` /
``pointnet2_stack_cuda`` extensions (reference
pcdet/ops/pointnet2/pointnet2_batch/src/*: FPS sampling_gpu.cu:101,
ball_query_gpu.cu, group_points, interpolate_gpu.cu) re-designed for fixed
shapes: the "stacked" ragged batching becomes padded (B, N, ...) arrays with
validity masks, and the sequential samplers are lax.fori_loop scans whose
compute is batched across the leading dims.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

BIG = 1e10


def masked_fps(xyz, valid, num_samples: int):
    """Farthest point sampling on a padded point set.

    Matches reference farthest_point_sampling_kernel (sampling_gpu.cu:101):
    starts from index 0, iteratively picks the point farthest from the
    selected set.  Invalid points are never selected; if fewer than
    ``num_samples`` valid points exist, selection wraps onto already-picked
    indices (their min-distance is 0, ties resolve to the first argmax —
    callers should mask with ``valid[idx]``).

    Args:
        xyz: (N, 3); valid: (N,) bool.
    Returns:
        idx: (num_samples,) int32.
    """
    n = xyz.shape[0]
    d2 = jnp.where(valid, BIG, -BIG)  # invalid can't be argmax

    def body(i, state):
        dist, idx = state
        last = idx[i - 1]
        delta = xyz - xyz[last]
        nd = jnp.sum(delta * delta, axis=-1)
        dist = jnp.minimum(dist, jnp.where(valid, nd, -BIG))
        idx = idx.at[i].set(jnp.argmax(dist).astype(jnp.int32))
        return dist, idx

    # first sample: the first valid point
    first = jnp.argmax(valid).astype(jnp.int32)
    idx0 = jnp.zeros((num_samples,), jnp.int32).at[0].set(first)
    _, idx = jax.lax.fori_loop(1, num_samples, body, (d2, idx0))
    return idx


def ball_query(radius: float, nsample: int, xyz, xyz_valid, new_xyz, new_valid):
    """First ``nsample`` points (original order) within radius of each query,
    first-in-ball index repeated to fill (reference ball_query_gpu.cu).

    Args:
        xyz: (N, 3) support points + (N,) valid;
        new_xyz: (M, 3) query centers + (M,) valid.
    Returns:
        idx: (M, nsample) int32; cnt: (M,) int32 (0 => empty ball).
    """
    n = xyz.shape[0]
    d2 = jnp.sum((new_xyz[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)  # (M, N)
    in_ball = (d2 < radius * radius) & xyz_valid[None, :] & new_valid[:, None]
    # rank among in-ball points by original order
    order_key = jnp.where(in_ball, jnp.arange(n)[None, :], n)
    sorted_idx = jnp.argsort(order_key, axis=-1)[:, :nsample].astype(jnp.int32)
    cnt = jnp.minimum(in_ball.sum(axis=-1), nsample).astype(jnp.int32)
    first = sorted_idx[:, 0:1]
    ks = jnp.arange(nsample)[None, :]
    idx = jnp.where(ks < jnp.maximum(cnt[:, None], 1), sorted_idx, first)
    return idx, cnt


def ball_query_dilated(min_radius: float, max_radius: float, nsample: int,
                       xyz, xyz_valid, new_xyz, new_valid):
    """Annulus ball query (reference ball_query_dilated_gpu)."""
    n = xyz.shape[0]
    d2 = jnp.sum((new_xyz[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
    in_ball = (d2 < max_radius * max_radius) & (d2 >= min_radius * min_radius) \
        & xyz_valid[None, :] & new_valid[:, None]
    order_key = jnp.where(in_ball, jnp.arange(n)[None, :], n)
    sorted_idx = jnp.argsort(order_key, axis=-1)[:, :nsample].astype(jnp.int32)
    cnt = jnp.minimum(in_ball.sum(axis=-1), nsample).astype(jnp.int32)
    first = sorted_idx[:, 0:1]
    ks = jnp.arange(nsample)[None, :]
    idx = jnp.where(ks < jnp.maximum(cnt[:, None], 1), sorted_idx, first)
    return idx, cnt


def knn(query, query_valid, support, support_valid, k: int):
    """k nearest neighbours by squared euclidean distance.

    Returns idx (M, k) into support and the distances; invalid support is
    pushed to +inf (may still appear when fewer than k valid points exist).
    """
    d2 = jnp.sum((query[:, None, :] - support[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(support_valid[None, :], d2, BIG)
    neg_d, idx = jax.lax.top_k(-d2, k)
    return idx.astype(jnp.int32), -neg_d


def three_nn(unknown, unknown_valid, known, known_valid):
    """3 nearest known points per unknown point (reference three_nn)."""
    idx, d2 = knn(unknown, unknown_valid, known, known_valid, 3)
    return idx, jnp.sqrt(jnp.maximum(d2, 0.0))


def three_interpolate(features, idx, dist):
    """Inverse-distance-weighted 3-NN interpolation (reference
    three_interpolate_gpu).  features: (N, C); idx: (M, 3); dist: (M, 3)."""
    recip = 1.0 / jnp.maximum(dist * dist, 1e-8)
    norm = jnp.sum(recip, axis=-1, keepdims=True)
    weight = recip / norm
    return jnp.sum(features[idx] * weight[..., None], axis=1)


def gather_points(points, idx):
    """points: (N, C), idx: (...,) -> (..., C)."""
    return points[idx]


def dvs_fps_sample(points_xyz, point_valid, boxes, num_candidates: int,
                   num_fps: int, lambda_: float = 0.18, delta: float = 50.0,
                   pool_extra_width=(0.0, 0.0, 0.0), pre_cap: int = None):
    """Density-adaptive in-RoI point sampling: DVS voxel dedup then FPS.

    TPU-native equivalent of the reference ``patch_ops_cuda``
    roilocal_dfvs_pool3d_v2 (roipatch_dfvs_pool3d_gpu.cu:39-233, python
    wrapper patch_ops_utils.py:59-98): points inside each (enlarged) box are
    deduplicated on a box-size-adaptive voxel grid of resolution
    ``lambda * (1 + dist/delta)`` and then farthest-point-sampled down to
    ``num_fps``.  The patch-based inverted index of the reference is a
    GPU-memory optimization; on TPU the dense (M, N) membership test is a
    single fused elementwise pass.

    ``pre_cap``: each box's candidate set is first compacted to ``pre_cap``
    slots so the voxel-dedup ARGSORT (and every per-point tensor) runs at
    (M, pre_cap) instead of (M, N) — at Waymo batch-1 scale (500 rois x
    163k points) the full-width pipeline measured ~5.4 s/frame on v5e, the
    capped form milliseconds.  The compaction is CHUNK-based: points are
    viewed as 128-point chunks (pillar-sorted points are spatially local,
    so each chunk has a tight AABB), each box selects the first
    ``pre_cap // 128`` chunks whose AABB overlaps its own, and the exact
    membership test runs only on the gathered chunks.  A per-point
    cumsum-rank scatter was tried first and is the WRONG form on TPU: the
    (M, N) scalar-granularity scatter alone measured 408 ms (scatters
    serialize per update), vs ~20 ms for the whole chunk path.  The cap
    mirrors the reference kernel's own per-box candidate cap (the CUDA
    loop stops once ``num_candidates`` voxels are filled,
    roipatch_dfvs_pool3d_gpu.cu:134-170); ``None`` picks
    ``max(4 * num_candidates, 4096)``.

    Args:
        points_xyz: (N, 3); point_valid: (N,);
        boxes: (M, 7) rois.
    Returns:
        idx: (M, num_fps) int32 indices into points; cnt: (M,) valid counts.
    """
    n = points_xyz.shape[0]
    m = boxes.shape[0]
    ex = jnp.asarray(pool_extra_width)
    half = boxes[:, 3:6] / 2 + ex[None, :] / 2
    c, s = jnp.cos(-boxes[:, 6]), jnp.sin(-boxes[:, 6])

    if pre_cap is None:
        pre_cap = max(4 * num_candidates, 4096)
    cs = 128
    if pre_cap < n and n % cs == 0 and pre_cap % cs == 0:
        nc = n // cs
        ncand = pre_cap // cs
        pv = point_valid.reshape(nc, cs)
        pc3 = points_xyz.reshape(nc, cs, 3)
        big = jnp.float32(1e30)
        cmin = jnp.min(jnp.where(pv[..., None], pc3, big), axis=1)
        cmax = jnp.max(jnp.where(pv[..., None], pc3, -big), axis=1)
        # rotated box -> conservative world AABB
        axx = jnp.abs(c) * half[:, 0] + jnp.abs(s) * half[:, 1]
        ayy = jnp.abs(s) * half[:, 0] + jnp.abs(c) * half[:, 1]
        bhalf = jnp.stack([axx, ayy, half[:, 2]], axis=-1)  # (M, 3)
        bmin = boxes[:, :3] - bhalf
        bmax = boxes[:, :3] + bhalf
        overlap = jnp.all(
            (bmin[:, None, :] <= cmax[None]) & (cmin[None] <= bmax[:, None, :]),
            axis=-1)  # (M, NC)
        # first ncand overlapping chunks by ascending chunk id (top_k of
        # the negated id; deterministic truncation when a box overlaps
        # more — the same first-by-index rule as the reference cap)
        LOW = jnp.int32(-(2 ** 30))
        vals, _ = jax.lax.top_k(
            jnp.where(overlap, -jnp.arange(nc, dtype=jnp.int32)[None], LOW),
            ncand)
        cid = -vals                      # (M, ncand) ascending chunk ids
        cvalid = vals > LOW
        cidc = jnp.clip(cid, 0, nc - 1)
        # whole-chunk row gathers (1.5 KB rows tile well; per-point 12 B
        # rows would waste ~100x bandwidth)
        gpts = pc3.reshape(nc, cs * 3)[cidc].reshape(m, ncand * cs, 3)
        gval = (pv[cidc] & cvalid[..., None]).reshape(m, ncand * cs)
        pidx = (cidc[..., None] * cs
                + jnp.arange(cs, dtype=jnp.int32)).reshape(m, ncand * cs)
        rel = gpts - boxes[:, None, :3]  # (M, pre_cap, 3)
        lx = c[:, None] * rel[..., 0] - s[:, None] * rel[..., 1]
        ly = s[:, None] * rel[..., 0] + c[:, None] * rel[..., 1]
        lz = rel[..., 2]
        inside = (
            (jnp.abs(lx) <= half[:, 0:1]) & (jnp.abs(ly) <= half[:, 1:2])
            & (jnp.abs(lz) <= half[:, 2:3]) & gval
        )  # (M, pre_cap)
        point_index = jnp.where(inside, pidx, 0)
        n_eff = ncand * cs
    else:
        # full-width membership (small N or shape not chunkable)
        rel = points_xyz[None, :, :] - boxes[:, None, :3]  # (M, N, 3)
        lx = c[:, None] * rel[..., 0] - s[:, None] * rel[..., 1]
        ly = s[:, None] * rel[..., 0] + c[:, None] * rel[..., 1]
        lz = rel[..., 2]
        inside = (
            (jnp.abs(lx) <= half[:, 0:1]) & (jnp.abs(ly) <= half[:, 1:2])
            & (jnp.abs(lz) <= half[:, 2:3]) & point_valid[None, :]
        )  # (M, N)
        point_index = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[None], (m, n))
        n_eff = n

    # density-adaptive voxel size per box (reference lambda/delta rule)
    dist = jnp.linalg.norm(boxes[:, :2], axis=-1)
    vsize = lambda_ * (1.0 + dist / delta)  # (M,)

    vx = jnp.clip(jnp.floor(lx / vsize[:, None]).astype(jnp.int32) + 512, 0, 1023)
    vy = jnp.clip(jnp.floor(ly / vsize[:, None]).astype(jnp.int32) + 512, 0, 1023)
    vz = jnp.clip(jnp.floor(lz / vsize[:, None]).astype(jnp.int32) + 512, 0, 1023)
    # packed base-1024 voxel key (int32-safe: < 2^30); rank points within each
    # (box, voxel) by original order and keep only the first (DVS dedup)
    SENT = jnp.int32(2 ** 31 - 1)
    key = (vx * 1024 + vy) * 1024 + vz
    key = jnp.where(inside, key, SENT)
    order = jnp.argsort(key, axis=-1, stable=True)  # (M, N)
    key_sorted = jnp.take_along_axis(key, order, axis=-1)
    is_first = jnp.concatenate(
        [jnp.ones((m, 1), bool), key_sorted[:, 1:] != key_sorted[:, :-1]],
        axis=-1) & (key_sorted < SENT)

    # candidate list: first-of-voxel points, capped at num_candidates
    cand_rank = jnp.cumsum(is_first.astype(jnp.int32), axis=-1) - 1
    sel_key = jnp.where(is_first & (cand_rank < num_candidates),
                        cand_rank, num_candidates)
    cand_idx = jnp.full((m, num_candidates + 1), 0, jnp.int32)
    rows = jnp.broadcast_to(jnp.arange(m)[:, None], (m, n_eff))
    cand_idx = cand_idx.at[rows, sel_key].set(
        jnp.take_along_axis(point_index, order, axis=-1),
        mode="drop")[:, :num_candidates]
    cand_cnt = jnp.minimum(is_first.sum(axis=-1), num_candidates)
    cand_valid = jnp.arange(num_candidates)[None, :] < cand_cnt[:, None]

    # FPS down to num_fps per box
    cand_xyz = points_xyz[cand_idx]  # (M, C, 3)
    fps_idx = jax.vmap(lambda p, v: masked_fps(p, v, num_fps))(cand_xyz, cand_valid)
    out_idx = jnp.take_along_axis(cand_idx, fps_idx, axis=-1)
    cnt = jnp.minimum(cand_cnt, num_fps)
    # wrap-repeat within available candidates (reference repeat_pooled_pts_idx)
    ks = jnp.arange(num_fps)[None, :]
    safe_cnt = jnp.maximum(cnt[:, None], 1)
    wrapped = jnp.take_along_axis(out_idx, ks % safe_cnt, axis=-1)
    out_idx = jnp.where(ks < safe_cnt, out_idx, wrapped)
    return out_idx, cnt.astype(jnp.int32)


def masked_fps_matrix(dist_matrix, valid, num_samples: int):
    """Farthest point sampling driven by a precomputed distance matrix
    (reference furthest_point_sample_matrix, sampling_gpu.cu:263 — used by
    F-FPS / fusion sampling in 3DSSD-style backbones).

    Args:
        dist_matrix: (N, N); valid: (N,).
    Returns:
        idx: (num_samples,) int32.
    """
    n = dist_matrix.shape[0]
    d = jnp.where(valid, BIG, -BIG)

    def body(i, state):
        dist, idx = state
        last = idx[i - 1]
        nd = dist_matrix[last]
        dist = jnp.minimum(dist, jnp.where(valid, nd, -BIG))
        idx = idx.at[i].set(jnp.argmax(dist).astype(jnp.int32))
        return dist, idx

    first = jnp.argmax(valid).astype(jnp.int32)
    idx0 = jnp.zeros((num_samples,), jnp.int32).at[0].set(first)
    _, idx = jax.lax.fori_loop(1, num_samples, body, (d, idx0))
    return idx


def calc_dist_matrix_for_sampling(xyz, features=None, gamma: float = 1.0):
    """Combined coordinate + feature distance matrix for F-FPS (reference
    pointnet2_utils.calc_dist_matrix_for_sampling)."""
    d = jnp.sum((xyz[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
    if features is not None:
        fd = jnp.sum((features[:, None, :] - features[None, :, :]) ** 2, axis=-1)
        d = d + gamma * fd
    return d
