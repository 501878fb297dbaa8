"""Reversible 3D/2D transforms for the camera-fusion branch
(reference pcdet/utils/transform_utils.py): replay/reverse the recorded
world augmentations on 3D points and apply image transforms to 2D points.
Works with numpy or jnp (functional: returns new arrays)."""
from __future__ import annotations

import numpy as np

from .common_utils import _xp, rotate_points_along_z


def random_world_flip(params, reverse=False, points_3d=None, boxes_3d=None):
    axes = params[::-1] if reverse else params
    for axis in axes:
        if axis == "x":
            if points_3d is not None:
                points_3d = points_3d.copy() if isinstance(points_3d, np.ndarray) \
                    else points_3d
                xp = _xp(points_3d)
                points_3d = xp.concatenate(
                    [points_3d[:, :1], -points_3d[:, 1:2], points_3d[:, 2:]], axis=1)
            if boxes_3d is not None:
                xp = _xp(boxes_3d)
                boxes_3d = xp.concatenate(
                    [boxes_3d[:, :1], -boxes_3d[:, 1:2], boxes_3d[:, 2:6],
                     -boxes_3d[:, 6:7], boxes_3d[:, 7:]], axis=1)
        elif axis == "y":
            if points_3d is not None:
                xp = _xp(points_3d)
                points_3d = xp.concatenate(
                    [-points_3d[:, :1], points_3d[:, 1:]], axis=1)
            if boxes_3d is not None:
                xp = _xp(boxes_3d)
                boxes_3d = xp.concatenate(
                    [-boxes_3d[:, :1], boxes_3d[:, 1:6],
                     -(boxes_3d[:, 6:7] + np.pi), boxes_3d[:, 7:]], axis=1)
        else:
            raise NotImplementedError(axis)
    return points_3d, boxes_3d


def random_world_rotation(params, reverse=False, points_3d=None, boxes_3d=None):
    ang = -params if reverse else params
    if points_3d is not None:
        xp = _xp(points_3d)
        points_3d = rotate_points_along_z(
            points_3d[None], xp.asarray([ang], dtype=points_3d.dtype))[0]
    if boxes_3d is not None:
        xp = _xp(boxes_3d)
        xyz = rotate_points_along_z(
            boxes_3d[None, :, 0:3], xp.asarray([ang], dtype=boxes_3d.dtype))[0]
        boxes_3d = xp.concatenate(
            [xyz, boxes_3d[:, 3:6], boxes_3d[:, 6:7] + ang, boxes_3d[:, 7:]],
            axis=1)
    return points_3d, boxes_3d


def random_world_scaling(params, reverse=False, points_3d=None, boxes_3d=None):
    s = 1.0 / params if reverse else params
    if points_3d is not None:
        xp = _xp(points_3d)
        points_3d = xp.concatenate(
            [points_3d[:, :3] * s, points_3d[:, 3:]], axis=1)
    if boxes_3d is not None:
        xp = _xp(boxes_3d)
        boxes_3d = xp.concatenate(
            [boxes_3d[:, :6] * s, boxes_3d[:, 6:]], axis=1)
    return points_3d, boxes_3d


def random_world_translation(params, reverse=False, points_3d=None, boxes_3d=None):
    t = -np.asarray(params) if reverse else np.asarray(params)
    if points_3d is not None:
        xp = _xp(points_3d)
        points_3d = xp.concatenate(
            [points_3d[:, :3] + xp.asarray(t, dtype=points_3d.dtype).reshape(1, 3),
             points_3d[:, 3:]], axis=1)
    if boxes_3d is not None:
        xp = _xp(boxes_3d)
        boxes_3d = xp.concatenate(
            [boxes_3d[:, :3] + xp.asarray(t, dtype=boxes_3d.dtype).reshape(1, 3),
             boxes_3d[:, 3:]], axis=1)
    return points_3d, boxes_3d


def imrescale(params, reverse=False, points_2d=None, boxes_2d=None):
    w_scale, h_scale = params
    if reverse:
        w_scale, h_scale = 1.0 / w_scale, 1.0 / h_scale
    if points_2d is not None:
        xp = _xp(points_2d)
        scale = xp.asarray([w_scale, h_scale], dtype=points_2d.dtype)
        points_2d = xp.concatenate(
            [points_2d[:, :2] * scale, points_2d[:, 2:]], axis=1)
    if boxes_2d is not None:
        xp = _xp(boxes_2d)
        scale = xp.asarray([w_scale, h_scale, w_scale, h_scale],
                           dtype=boxes_2d.dtype)
        boxes_2d = xp.concatenate(
            [boxes_2d[:, :4] * scale, boxes_2d[:, 4:]], axis=1)
    return points_2d, boxes_2d


def imflip(params, reverse=False, points_2d=None, boxes_2d=None):
    enable_x, rescale_w = params
    if enable_x:
        if points_2d is not None:
            xp = _xp(points_2d)
            points_2d = xp.concatenate(
                [rescale_w - 1 - points_2d[:, :1], points_2d[:, 1:]], axis=1)
        if boxes_2d is not None:
            xp = _xp(boxes_2d)
            boxes_2d = xp.concatenate(
                [rescale_w - 1 - boxes_2d[:, 2:3], boxes_2d[:, 1:2],
                 rescale_w - 1 - boxes_2d[:, 0:1], boxes_2d[:, 3:]], axis=1)
    return points_2d, boxes_2d


def points_lidar2img(points_3d, proj_mat, with_depth=False):
    """Project (N, 3) lidar points to image pixels via a (3, 4) matrix."""
    xp = _xp(points_3d)
    ones = xp.ones((points_3d.shape[0], 1), dtype=points_3d.dtype)
    pts4 = xp.concatenate([points_3d[:, :3], ones], axis=-1)
    p2d = pts4 @ proj_mat.T
    res = p2d[..., :2] / xp.clip(p2d[..., 2:3], 1e-5, 1e5)
    if with_depth:
        return xp.concatenate([res, p2d[..., 2:3]], axis=-1)
    return res
