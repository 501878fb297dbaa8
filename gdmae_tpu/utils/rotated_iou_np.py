"""Host-side (numpy) rotated BEV IoU.

Numpy port of the reference's CPU rotated IoU
(pcdet/ops/iou3d_nms/src/iou3d_cpu.cpp, used by the gt-sampler collision
check database_sampler.py:242-244).  Same Sutherland–Hodgman convex clip as
ops/iou_nms.py but vectorized over all pairs in numpy for dataloader workers.
"""
from __future__ import annotations

import numpy as np


def _clip(poly, count, axis, sign, bound):
    """poly: (P, 8, 2), count: (P,). Clip against sign*coord <= bound."""
    p, cap, _ = poly.shape
    idx = np.arange(cap)
    nxt = np.where(idx[None, :] + 1 < count[:, None], idx[None, :] + 1, 0)
    v = poly
    w = np.take_along_axis(poly, nxt[..., None], axis=1)
    fv = sign * v[..., axis] - bound[:, None]
    fw = sign * w[..., axis] - bound[:, None]
    in_v = fv <= 0
    in_w = fw <= 0
    valid_edge = idx[None, :] < count[:, None]

    denom = fv - fw
    t = fv / np.where(np.abs(denom) > 1e-12, denom, 1e-12)
    inter = v + t[..., None] * (w - v)

    emit_v = in_v & valid_edge
    emit_i = (in_v != in_w) & valid_edge
    n_emit = emit_v.astype(np.int64) + emit_i.astype(np.int64)
    offset = np.cumsum(n_emit, axis=1) - n_emit
    new_count = n_emit.sum(axis=1)

    out = np.zeros_like(poly)
    rows = np.arange(p)[:, None].repeat(cap, 1)
    pos_v = np.where(emit_v, offset, cap)
    ok = pos_v < cap
    out[rows[ok], pos_v[ok]] = v[ok]
    pos_i = np.where(emit_i, offset + emit_v.astype(np.int64), cap)
    ok = pos_i < cap
    out[rows[ok], pos_i[ok]] = inter[ok]
    return out, new_count


def boxes_overlap_bev_cpu(boxes_a, boxes_b):
    """(N, 7) x (M, 7) -> (N, M) rotated BEV overlap area, numpy."""
    n, m = len(boxes_a), len(boxes_b)
    if n == 0 or m == 0:
        return np.zeros((n, m), np.float32)
    a = np.repeat(boxes_a[:, None, :], m, axis=1).reshape(n * m, -1)
    b = np.repeat(boxes_b[None, :, :], n, axis=0).reshape(n * m, -1)

    cosb, sinb = np.cos(-b[:, 6]), np.sin(-b[:, 6])
    rel = a[:, :2] - b[:, :2]
    cx = cosb * rel[:, 0] - sinb * rel[:, 1]
    cy = sinb * rel[:, 0] + cosb * rel[:, 1]
    ar = a[:, 6] - b[:, 6]
    ca, sa = np.cos(ar), np.sin(ar)
    hx, hy = a[:, 3] / 2, a[:, 4] / 2
    loc = np.stack([
        np.stack([hx, hy], -1), np.stack([-hx, hy], -1),
        np.stack([-hx, -hy], -1), np.stack([hx, -hy], -1),
    ], axis=1)  # (P, 4, 2)
    rx = ca[:, None] * loc[..., 0] - sa[:, None] * loc[..., 1] + cx[:, None]
    ry = sa[:, None] * loc[..., 0] + ca[:, None] * loc[..., 1] + cy[:, None]
    poly = np.zeros((n * m, 8, 2))
    poly[:, :4, 0] = rx
    poly[:, :4, 1] = ry
    count = np.full(n * m, 4, np.int64)

    bx, by = b[:, 3] / 2, b[:, 4] / 2
    poly, count = _clip(poly, count, 0, 1.0, bx)
    poly, count = _clip(poly, count, 0, -1.0, bx)
    poly, count = _clip(poly, count, 1, 1.0, by)
    poly, count = _clip(poly, count, 1, -1.0, by)

    idx = np.arange(8)
    pin = np.minimum(idx[None, :], np.maximum(count[:, None] - 1, 0))
    p = np.take_along_axis(poly, pin[..., None], axis=1)
    q = np.roll(p, -1, axis=1)
    area = 0.5 * np.abs(np.sum(p[..., 0] * q[..., 1] - q[..., 0] * p[..., 1], axis=1))
    area = np.where(count >= 3, area, 0.0)
    return area.reshape(n, m).astype(np.float32)


def boxes_bev_iou_cpu(boxes_a, boxes_b):
    """Rotated BEV IoU, numpy (reference iou3d_nms_utils.boxes_bev_iou_cpu)."""
    overlap = boxes_overlap_bev_cpu(np.asarray(boxes_a), np.asarray(boxes_b))
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return overlap / np.clip(area_a + area_b - overlap, 1e-6, None)
