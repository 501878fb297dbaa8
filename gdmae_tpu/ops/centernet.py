"""CenterNet primitives: gaussian heatmap target assignment (fully on
device) and top-K heatmap decoding.

TPU-native counterpart of reference
pcdet/models/model_utils/centernet_utils.py + the CenterHead target assign
loop (pcdet/models/dense_heads/center_head.py:106-227) — which the reference
runs on CPU per sample (a known hot spot, :210).  Here the gaussian draw is
a lax.scan over a fixed number of padded objects, and decoding is a batched
top-k — no host round-trips, static shapes throughout.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def gaussian_radius(height, width, min_overlap=0.5):
    """Same three-case radius as reference centernet_utils.gaussian_radius."""
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * a1 * c1, 0.0))
    r1 = (b1 + sq1) / 2

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.maximum(b2 ** 2 - 4 * a2 * c2, 0.0))
    r2 = (b2 + sq2) / 2

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def draw_gaussians(num_classes: int, hw: Tuple[int, int], center_int,
                   radius, cls_ids, valid):
    """Render the max-combined gaussian heatmap for one sample.

    Matches reference draw_gaussian_to_heatmap: discrete gaussian of integer
    radius r centred at the integer cell, sigma = (2r+1)/6, truncated at the
    radius box.

    Args:
        center_int: (M, 2) int32 [cx, cy] cell coords.
        radius: (M,) int32.
        cls_ids: (M,) int32 0-based class within this head.
        valid: (M,) bool.
    Returns:
        (num_classes, H, W) heatmap.
    """
    h, w = hw
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]

    def body(hm, inp):
        cxy, r, cid, ok = inp
        r = r.astype(jnp.float32)
        sigma = (2.0 * r + 1.0) / 6.0
        dx = xs - cxy[0].astype(jnp.float32)
        dy = ys - cxy[1].astype(jnp.float32)
        g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
        inside = (jnp.abs(dx) <= r) & (jnp.abs(dy) <= r)
        g = jnp.where(inside & ok, g, 0.0)
        onehot = jax.nn.one_hot(cid, num_classes, dtype=jnp.float32)
        hm = jnp.maximum(hm, onehot[:, None, None] * g[None])
        return hm, None

    hm0 = jnp.zeros((num_classes, h, w), jnp.float32)
    hm, _ = jax.lax.scan(body, hm0, (center_int, radius, cls_ids, valid))
    return hm


def assign_single_head(gt_boxes, gt_valid, num_classes, hw, voxel_size,
                       pc_range, feature_map_stride, gaussian_overlap=0.1,
                       min_radius=2):
    """Vectorized reference assign_target_of_single_head
    (center_head.py:106-163) for ONE sample.

    Args:
        gt_boxes: (M, C) [x, y, z, dx, dy, dz, heading, (vel...), cls] where
            cls is 1-based within this head; gt_valid: (M,) bool.
    Returns dict: heatmap (ncls, H, W), target_boxes (M, C-1+1),
        iou_boxes (M, 7), inds (M,), mask (M,).
    """
    h, w = hw
    m, c = gt_boxes.shape
    x, y, z = gt_boxes[:, 0], gt_boxes[:, 1], gt_boxes[:, 2]
    coord_x = (x - pc_range[0]) / voxel_size[0] / feature_map_stride
    coord_y = (y - pc_range[1]) / voxel_size[1] / feature_map_stride
    coord_x = jnp.clip(coord_x, 0, w - 0.5)
    coord_y = jnp.clip(coord_y, 0, h - 0.5)
    center = jnp.stack([coord_x, coord_y], axis=-1)
    center_int = center.astype(jnp.int32)

    dx = gt_boxes[:, 3] / voxel_size[0] / feature_map_stride
    dy = gt_boxes[:, 4] / voxel_size[1] / feature_map_stride
    radius = gaussian_radius(dy, dx, min_overlap=gaussian_overlap)
    radius = jnp.maximum(radius.astype(jnp.int32), min_radius)

    ok = gt_valid & (dx > 0) & (dy > 0)
    ok = ok & (center_int[:, 0] >= 0) & (center_int[:, 0] <= w) \
        & (center_int[:, 1] >= 0) & (center_int[:, 1] <= h)
    cls_ids = (gt_boxes[:, -1] - 1).astype(jnp.int32)

    heatmap = draw_gaussians(num_classes, hw, center_int, radius, cls_ids, ok)

    inds = jnp.where(ok, center_int[:, 1] * w + center_int[:, 0], 0)
    mask = ok.astype(jnp.int32)
    tb = [
        center - center_int.astype(jnp.float32),  # (M, 2)
        z[:, None],
        jnp.log(jnp.maximum(gt_boxes[:, 3:6], 1e-6)),
        jnp.cos(gt_boxes[:, 6])[:, None],
        jnp.sin(gt_boxes[:, 6])[:, None],
    ]
    if c > 8:
        tb.append(gt_boxes[:, 7:-1])
    target_boxes = jnp.concatenate(tb, axis=-1) * ok[:, None]
    iou_boxes = gt_boxes[:, :7] * ok[:, None]
    return {
        "heatmap": heatmap,
        "target_boxes": target_boxes,
        "iou_boxes": iou_boxes,
        "inds": inds.astype(jnp.int32),
        "mask": mask,
    }


def topk_heatmap(scores, k):
    """Reference centernet_utils._topk: per-class spatial top-k then global
    top-k.  scores: (B, ncls, H, W) -> (score, inds, class, ys, xs), each
    (B, K)."""
    b, ncls, h, w = scores.shape
    k1 = min(k, h * w)  # tiny grids: can't pick more cells than exist
    flat = scores.reshape(b, ncls, h * w)
    topk_scores, topk_inds = jax.lax.top_k(flat, k1)  # (B, ncls, K1)
    topk_ys = (topk_inds // w).astype(jnp.float32)
    topk_xs = (topk_inds % w).astype(jnp.float32)

    k2 = min(k, ncls * k1)
    topk_score, topk_ind = jax.lax.top_k(
        topk_scores.reshape(b, -1), k2)  # (B, K2)
    topk_classes = (topk_ind // k1).astype(jnp.int32)
    gather = lambda v: jnp.take_along_axis(v.reshape(b, -1), topk_ind, axis=1)
    out = (topk_score, gather(topk_inds), topk_classes,
           gather(topk_ys.astype(jnp.int32)).astype(jnp.float32),
           gather(topk_xs.astype(jnp.int32)).astype(jnp.float32))
    if k2 < k:  # pad to the static K (scores -inf sort/threshold away)
        pad = [jnp.full((b, k - k2), -jnp.inf, out[0].dtype)] + [
            jnp.zeros((b, k - k2), o.dtype) for o in out[1:]]
        out = tuple(jnp.concatenate([o, p], axis=1)
                    for o, p in zip(out, pad))
    return out


def decode_bbox_from_heatmap(heatmap, rot_cos, rot_sin, center, center_z, dim,
                             vel=None, iou=None, point_cloud_range=None,
                             voxel_size=None, feature_map_stride=None, K=100,
                             score_thresh=None, post_center_limit_range=None):
    """Reference centernet_utils.decode_bbox_from_heatmap (:154-211) on NHWC
    maps; returns fixed-K padded boxes + validity mask instead of ragged
    lists.

    All head maps are (B, H, W, C) [NHWC].
    """
    b, h, w, ncls = heatmap.shape
    hm = heatmap.transpose(0, 3, 1, 2)  # (B, ncls, H, W)
    scores, inds, class_ids, ys, xs = topk_heatmap(hm, K)

    def gather(feat):
        return jnp.take_along_axis(
            feat.reshape(b, h * w, -1), inds[..., None], axis=1)

    center_k = gather(center)  # (B, K, 2)
    rot_sin_k = gather(rot_sin)
    rot_cos_k = gather(rot_cos)
    center_z_k = gather(center_z)
    dim_k = gather(dim)

    angle = jnp.arctan2(rot_sin_k, rot_cos_k)
    xs_f = xs[..., None] + center_k[..., 0:1]
    ys_f = ys[..., None] + center_k[..., 1:2]
    xs_f = xs_f * feature_map_stride * voxel_size[0] + point_cloud_range[0]
    ys_f = ys_f * feature_map_stride * voxel_size[1] + point_cloud_range[1]

    parts = [xs_f, ys_f, center_z_k, dim_k, angle]
    if vel is not None:
        parts.append(gather(vel))
    boxes = jnp.concatenate(parts, axis=-1)  # (B, K, 7[+2])

    ious = gather(iou)[..., 0] if iou is not None else jnp.ones_like(scores)

    valid = jnp.ones_like(scores, bool)
    if post_center_limit_range is not None:
        lim = jnp.asarray(post_center_limit_range)
        valid &= jnp.all(boxes[..., :3] >= lim[:3], axis=-1)
        valid &= jnp.all(boxes[..., :3] <= lim[3:], axis=-1)
    if score_thresh is not None:
        valid &= scores > score_thresh
    return boxes, scores, class_ids, ious, valid


def circle_nms(centers_xy, scores, min_radius, post_maxsize, valid=None):
    """Center-distance greedy NMS (reference centernet_utils.circle_nms:80-111,
    numba host kernel) as a jittable fixed-K suppression: a detection is
    dropped when a higher-scoring kept detection lies within ``min_radius``.

    Args:
        centers_xy: (N, 2); scores: (N,); valid: (N,) bool optional.
    Returns:
        keep_idx (post_maxsize,) int32 padded -1; keep_mask; keep_scores.
    """
    n = centers_xy.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    masked = jnp.where(valid, scores, -jnp.inf)
    top_scores, order = jax.lax.top_k(masked, n)
    top_xy = centers_xy[order]
    top_valid = jnp.isfinite(top_scores)

    d2 = jnp.sum((top_xy[:, None, :] - top_xy[None, :, :]) ** 2, axis=-1)
    # reference compares squared distance to thresh; blocked greedy
    # suppression (see ops.iou_nms._greedy_suppress: per-box fori_loop
    # costs ~0.7 ms/step of TPU loop overhead)
    from .iou_nms import _greedy_suppress
    keep = _greedy_suppress(
        jnp.where(d2 <= min_radius, 1.0, 0.0), top_valid, 0.5)
    keep_scores = jnp.where(keep, top_scores, -jnp.inf)
    sel_scores, sel = jax.lax.top_k(keep_scores, min(post_maxsize, n))
    sel_mask = jnp.isfinite(sel_scores)
    return (jnp.where(sel_mask, order[sel], -1), sel_mask,
            jnp.where(sel_mask, sel_scores, 0.0))
