"""3D box geometry utilities (namespace-generic: numpy on host, jnp on device).

TPU-native counterpart of reference pcdet/utils/box_utils.py. Box layout is
the OpenPCDet convention throughout: (x, y, z, dx, dy, dz, heading[, ...]),
with (x, y, z) the box *center* and heading a counterclockwise rotation
around +z measured from +x.
"""
from __future__ import annotations

import numpy as np

from .common_utils import _xp, limit_period, rotate_points_along_z

# 8 corners of a unit box, z-bottom face first (reference box_utils.py:28-53)
CORNER_TEMPLATE = np.array(
    [
        [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
        [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
    ],
    dtype=np.float32,
) / 2.0


def boxes_to_corners_3d(boxes3d):
    """(N, 7) boxes -> (N, 8, 3) corners."""
    xp = _xp(boxes3d)
    template = xp.asarray(CORNER_TEMPLATE, dtype=boxes3d.dtype)
    corners = boxes3d[:, None, 3:6] * template[None, :, :]
    corners = rotate_points_along_z(corners, boxes3d[:, 6])
    return corners + boxes3d[:, None, 0:3]


def boxes_to_corners_bev(boxes3d):
    """(N, 7+) boxes -> (N, 4, 2) BEV polygon corners (counterclockwise)."""
    xp = _xp(boxes3d)
    half = boxes3d[:, 3:5] / 2.0  # (N, 2) [dx/2, dy/2]
    template = xp.asarray(
        np.array([[1, 1], [1, -1], [-1, -1], [-1, 1]], dtype=np.float32),
        dtype=boxes3d.dtype,
    )
    corners = half[:, None, :] * template[None, :, :]  # (N, 4, 2)
    cosa = xp.cos(boxes3d[:, 6])[:, None]
    sina = xp.sin(boxes3d[:, 6])[:, None]
    x = corners[..., 0] * cosa - corners[..., 1] * sina + boxes3d[:, None, 0]
    y = corners[..., 0] * sina + corners[..., 1] * cosa + boxes3d[:, None, 1]
    return xp.stack([x, y], axis=-1)


def mask_boxes_outside_range_numpy(boxes, limit_range, min_num_corners=1):
    """Host-side: keep boxes with >= min_num_corners corners inside range."""
    boxes = np.asarray(boxes)
    corners = np.asarray(boxes_to_corners_3d(boxes[:, 0:7]))
    limit_range = np.asarray(limit_range)
    inside = ((corners >= limit_range[0:3]) & (corners <= limit_range[3:6])).all(axis=2)
    return inside.sum(axis=1) >= min_num_corners


def enlarge_box3d(boxes3d, extra_width=(0, 0, 0)):
    """Grow each box by extra_width (dx, dy, dz); z center shifts down by dz/2
    so only the top is raised — matches reference box_utils.enlarge_box3d."""
    xp = _xp(boxes3d)
    extra = xp.asarray(np.asarray(extra_width, dtype=np.float32), dtype=boxes3d.dtype)
    large = xp.concatenate(
        [
            boxes3d[..., 0:2],
            boxes3d[..., 2:3] - extra[2] / 2,
            boxes3d[..., 3:6] + extra[None, :],
            boxes3d[..., 6:],
        ],
        axis=-1,
    )
    return large


def points_in_boxes_3d(points, boxes):
    """Point-in-rotated-box test, fully vectorized (device friendly).

    TPU-native replacement for roiaware_pool3d points_in_boxes_gpu
    (reference pcdet/ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu:313).

    Args:
        points: (N, 3)
        boxes: (M, 7) center/extent/heading
    Returns:
        (N, M) bool — point n inside box m.
    """
    xp = _xp(points, boxes)
    shifted = points[:, None, :] - boxes[None, :, 0:3]  # (N, M, 3)
    cosa = xp.cos(-boxes[:, 6])
    sina = xp.sin(-boxes[:, 6])
    local_x = shifted[..., 0] * cosa[None, :] - shifted[..., 1] * sina[None, :]
    local_y = shifted[..., 0] * sina[None, :] + shifted[..., 1] * cosa[None, :]
    in_x = xp.abs(local_x) <= boxes[None, :, 3] / 2
    in_y = xp.abs(local_y) <= boxes[None, :, 4] / 2
    in_z = xp.abs(shifted[..., 2]) <= boxes[None, :, 5] / 2
    return in_x & in_y & in_z


def remove_points_in_boxes3d(points, boxes3d):
    """Host-side: drop points falling inside any of the boxes."""
    if len(boxes3d) == 0:
        return points
    mask = points_in_boxes_3d(np.asarray(points[:, 0:3]), np.asarray(boxes3d[:, 0:7]))
    return points[~mask.any(axis=1)]


def boxes3d_nearest_bev_iou(boxes_a, boxes_b):
    """Axis-aligned nearest-BEV IoU used by the anchor target assigner.

    Each rotated box is replaced by its nearest axis-aligned form: heading is
    rounded to the nearest multiple of pi/2, which swaps dx/dy when closer to
    +-pi/2 (reference AxisAlignedTargetAssigner uses boxes3d_nearest_bev_iou,
    pcdet/ops/iou3d_nms/iou3d_nms_utils.py + axis_aligned_target_assigner.py).

    Args:
        boxes_a: (N, 7), boxes_b: (M, 7)
    Returns:
        (N, M) IoU of axis-aligned BEV boxes.
    """
    xp = _xp(boxes_a, boxes_b)

    def to_aa(b):
        rot = limit_period(b[:, 6], 0.5, np.pi)
        swap = xp.abs(rot) > np.pi / 4
        dx = xp.where(swap, b[:, 4], b[:, 3])
        dy = xp.where(swap, b[:, 3], b[:, 4])
        return xp.stack(
            [b[:, 0] - dx / 2, b[:, 1] - dy / 2, b[:, 0] + dx / 2, b[:, 1] + dy / 2],
            axis=-1,
        )

    a = to_aa(boxes_a)
    b = to_aa(boxes_b)
    lt = xp.maximum(a[:, None, 0:2], b[None, :, 0:2])
    rb = xp.minimum(a[:, None, 2:4], b[None, :, 2:4])
    wh = xp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / xp.clip(union, 1e-6, None)


def boxes3d_lidar_to_kitti_camera(boxes3d_lidar, calib):
    """(N, 7) lidar boxes -> (N, 7) camera-frame [x, y, z, l, h, w, r]."""
    boxes3d_lidar = np.asarray(boxes3d_lidar).copy()
    xyz_lidar = boxes3d_lidar[:, 0:3].copy()
    l, w, h = boxes3d_lidar[:, 3:4], boxes3d_lidar[:, 4:5], boxes3d_lidar[:, 5:6]
    r = boxes3d_lidar[:, 6:7]
    xyz_lidar[:, 2] -= h.reshape(-1) / 2
    xyz_cam = calib.lidar_to_rect(xyz_lidar)
    r = -r - np.pi / 2
    return np.concatenate([xyz_cam, l, h, w, r], axis=-1)


def boxes3d_kitti_camera_to_lidar(boxes3d_camera, calib):
    """(N, 7) camera boxes [x, y, z, l, h, w, r] -> (N, 7) lidar boxes."""
    boxes3d_camera = np.asarray(boxes3d_camera).copy()
    xyz_camera, r = boxes3d_camera[:, 0:3], boxes3d_camera[:, 6:7]
    l, h, w = boxes3d_camera[:, 3:4], boxes3d_camera[:, 4:5], boxes3d_camera[:, 5:6]
    xyz_lidar = calib.rect_to_lidar(xyz_camera)
    xyz_lidar[:, 2] += h[:, 0] / 2
    return np.concatenate([xyz_lidar, l, w, h, -(r + np.pi / 2)], axis=-1)


def boxes3d_kitti_camera_to_imageboxes(boxes3d, calib, image_shape=None):
    """(N, 7) camera boxes -> (N, 4) 2D boxes [x1, y1, x2, y2] in image."""
    corners3d = np.asarray(boxes_to_corners_3d_camera(boxes3d))
    pts_img, _ = calib.rect_to_img(corners3d.reshape(-1, 3))
    corners_img = pts_img.reshape(-1, 8, 2)
    min_uv = corners_img.min(axis=1)
    max_uv = corners_img.max(axis=1)
    boxes2d = np.concatenate([min_uv, max_uv], axis=1)
    if image_shape is not None:
        boxes2d[:, 0] = np.clip(boxes2d[:, 0], 0, image_shape[1] - 1)
        boxes2d[:, 1] = np.clip(boxes2d[:, 1], 0, image_shape[0] - 1)
        boxes2d[:, 2] = np.clip(boxes2d[:, 2], 0, image_shape[1] - 1)
        boxes2d[:, 3] = np.clip(boxes2d[:, 3], 0, image_shape[0] - 1)
    return boxes2d


def boxes_to_corners_3d_camera(boxes3d):
    """(N, 7) camera-frame boxes [x, y, z, l, h, w, r] -> (N, 8, 3) corners.

    Camera frame: x right, y down, z forward; ry around the y axis; (x, y, z)
    is the *bottom* center (KITTI label convention).
    """
    boxes3d = np.asarray(boxes3d)
    l, h, w = boxes3d[:, 3], boxes3d[:, 4], boxes3d[:, 5]
    x_c = np.stack([l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2], axis=1)
    y_c = np.stack([np.zeros_like(h)] * 4 + [-h] * 4, axis=1)
    z_c = np.stack([w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2], axis=1)
    ry = boxes3d[:, 6]
    cosa, sina = np.cos(ry), np.sin(ry)
    x_r = cosa[:, None] * x_c + sina[:, None] * z_c
    z_r = -sina[:, None] * x_c + cosa[:, None] * z_c
    corners = np.stack([x_r, y_c, z_r], axis=-1)
    return corners + boxes3d[:, None, 0:3]


def in_hull(p, hull):
    """Host-side point-in-convex-hull (used for frustum filtering)."""
    from scipy.spatial import Delaunay

    try:
        if not isinstance(hull, Delaunay):
            hull = Delaunay(hull)
        return hull.find_simplex(p) >= 0
    except Exception:
        return np.zeros(p.shape[0], dtype=bool)


def generate_centerness_mask(points, boxes):
    """Per-point centerness inside its box (reference box_utils.py:301-321):
    cube-root of the product of min/max margin ratios along each local axis.

    Args:
        points: (N, 3); boxes: (N, 7) — box matched to each point.
    Returns:
        (N,) centerness in [0, 1].
    """
    xp = _xp(points, boxes)
    offset = points - boxes[:, 0:3]
    c, s = xp.cos(-boxes[:, 6]), xp.sin(-boxes[:, 6])
    lx = c * offset[:, 0] - s * offset[:, 1]
    ly = s * offset[:, 0] + c * offset[:, 1]
    local = xp.stack([lx, ly, offset[:, 2]], axis=-1)
    half = boxes[:, 3:6] / 2
    dist_pos = half - local   # distance to +face
    dist_neg = half + local   # distance to -face
    dmin = xp.minimum(dist_pos, dist_neg)
    dmax = xp.maximum(dist_pos, dist_neg)
    ratio = dmin / xp.clip(dmax, 1e-6, None)
    centerness = ratio[:, 0] * ratio[:, 1] * ratio[:, 2]
    centerness = xp.clip(centerness, 0.0, None) ** (1.0 / 3.0)
    return centerness


def points_in_boxes_first_idx(points, boxes, box_valid):
    """Index of the first valid box containing each point; -1 if none.

    Vectorized replacement for roiaware_pool3d points_in_boxes_gpu
    (reference roiaware_pool3d_kernel.cu:313-339).

    Args:
        points: (N, 3); boxes: (M, 7); box_valid: (M,).
    Returns:
        (N,) int32.
    """
    xp = _xp(points, boxes)
    rel = points[:, None, :] - boxes[None, :, 0:3]  # (N, M, 3)
    c, s = xp.cos(-boxes[:, 6]), xp.sin(-boxes[:, 6])
    lx = c[None, :] * rel[..., 0] - s[None, :] * rel[..., 1]
    ly = s[None, :] * rel[..., 0] + c[None, :] * rel[..., 1]
    lz = rel[..., 2]
    half = boxes[:, 3:6] / 2
    inside = (
        (xp.abs(lx) <= half[None, :, 0]) & (xp.abs(ly) <= half[None, :, 1])
        & (xp.abs(lz) <= half[None, :, 2]) & box_valid[None, :]
    )
    m = boxes.shape[0]
    first = xp.where(inside, xp.arange(m)[None, :], m).min(axis=-1)
    return xp.where(first < m, first, -1).astype(np.int32) if xp is np \
        else xp.where(first < m, first, -1).astype("int32")
