"""RoI-aware and RoI-point pooling.

TPU-native equivalents of the reference ``roiaware_pool3d_cuda`` and
``roipoint_pool3d_cuda`` extensions (reference
pcdet/ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu:111-339 and
pcdet/ops/roipoint_pool3d/src/roipoint_pool3d_kernel.cu:38-103): voxelized
in-RoI max/avg pooling and fixed-K per-RoI point gathering, on padded
arrays.  Autodiff supplies the backward passes the CUDA code hand-wrote.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def points_in_boxes(points, boxes, box_valid=None):
    """(N, 3) x (M, 7) -> (N,) index of first containing box, -1 if none
    (reference points_in_boxes_gpu)."""
    from ..utils import box_utils

    if box_valid is None:
        box_valid = jnp.ones(boxes.shape[0], bool)
    return box_utils.points_in_boxes_first_idx(points, boxes, box_valid)


def _to_local(points, boxes):
    """(M, N, 3) box-local coords of all points for all boxes."""
    rel = points[None, :, :] - boxes[:, None, :3]
    c, s = jnp.cos(-boxes[:, 6]), jnp.sin(-boxes[:, 6])
    lx = c[:, None] * rel[..., 0] - s[:, None] * rel[..., 1]
    ly = s[:, None] * rel[..., 0] + c[:, None] * rel[..., 1]
    return jnp.stack([lx, ly, rel[..., 2]], axis=-1)


def roiaware_pool3d(points, point_feats, point_valid, boxes, out_size: Tuple[int, int, int],
                    pool_method: str = "max"):
    """Voxelized in-RoI pooling (reference roiaware_max/avgpool3d).

    Each RoI is split into an (ox, oy, oz) local grid; point features are
    max/avg pooled per cell via segment ops.

    Args:
        points: (N, 3); point_feats: (N, C); point_valid: (N,);
        boxes: (M, 7); out_size: (ox, oy, oz).
    Returns:
        (M, ox, oy, oz, C) pooled features.
    """
    ox, oy, oz = out_size
    m = boxes.shape[0]
    n, c = point_feats.shape
    local = _to_local(points, boxes)  # (M, N, 3)
    half = boxes[:, None, 3:6] / 2
    inside = jnp.all(jnp.abs(local) <= half, axis=-1) & point_valid[None, :]

    # local cell index
    cell = (local + half) / (2 * half) * jnp.asarray([ox, oy, oz], local.dtype)
    cell = jnp.clip(cell.astype(jnp.int32), 0,
                    jnp.asarray([ox - 1, oy - 1, oz - 1]))
    flat_cell = (cell[..., 0] * oy + cell[..., 1]) * oz + cell[..., 2]  # (M, N)
    ncell = ox * oy * oz
    seg = jnp.where(inside,
                    jnp.arange(m)[:, None] * ncell + flat_cell,
                    m * ncell)

    flat_seg = seg.reshape(-1)
    rep_feats = jnp.broadcast_to(point_feats[None], (m, n, c)).reshape(-1, c)
    if pool_method == "max":
        pooled = jax.ops.segment_max(
            jnp.where(inside.reshape(-1, 1), rep_feats, -jnp.inf),
            flat_seg, num_segments=m * ncell + 1)
        pooled = jnp.where(jnp.isneginf(pooled), 0.0, pooled)
    else:
        sums = jax.ops.segment_sum(
            rep_feats * inside.reshape(-1, 1), flat_seg,
            num_segments=m * ncell + 1)
        cnt = jax.ops.segment_sum(
            inside.reshape(-1).astype(point_feats.dtype), flat_seg,
            num_segments=m * ncell + 1)
        pooled = sums / jnp.clip(cnt[:, None], 1.0)
    return pooled[:-1].reshape(m, ox, oy, oz, c)


def roipoint_pool3d(points, point_feats, point_valid, boxes, num_sampled: int,
                    pool_extra_width=(0.0, 0.0, 0.0)):
    """Gather a fixed K points+features per (enlarged) RoI with an empty
    flag (reference roipool3d_forward: first-K in original order,
    wrap-repeated).

    Returns:
        pooled: (M, K, 3 + C); empty: (M,) bool.
    """
    from ..utils import box_utils

    big = box_utils.enlarge_box3d(boxes[:, :7], pool_extra_width)
    local = _to_local(points, big)
    half = big[:, None, 3:6] / 2
    inside = jnp.all(jnp.abs(local) <= half, axis=-1) & point_valid[None, :]

    n = points.shape[0]
    order_key = jnp.where(inside, jnp.arange(n)[None, :], n)
    sorted_idx = jnp.argsort(order_key, axis=-1)[:, :num_sampled]
    cnt = jnp.minimum(inside.sum(axis=-1), num_sampled)
    ks = jnp.arange(num_sampled)[None, :]
    safe_cnt = jnp.maximum(cnt[:, None], 1)
    idx = jnp.take_along_axis(sorted_idx, ks % safe_cnt, axis=-1)
    feats = jnp.concatenate([points, point_feats], axis=-1)
    pooled = feats[idx]
    empty = cnt == 0
    pooled = pooled * (~empty)[:, None, None].astype(pooled.dtype)
    return pooled, empty
