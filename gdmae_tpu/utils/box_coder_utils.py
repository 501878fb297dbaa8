"""Box coders (pure-functional jnp).

TPU-native counterpart of reference pcdet/utils/box_coder_utils.py — same
encodings, but functional (no in-place mutation) and namespace-generic so the
host pipeline can call them with numpy.
"""
from __future__ import annotations

import numpy as np

from .common_utils import _xp


class ResidualCoder:
    """Anchor/RoI residual coder (reference box_coder_utils.py:5-78)."""

    def __init__(self, code_size=7, encode_angle_by_sincos=False, norm=True, **kwargs):
        self.code_size = code_size
        self.encode_angle_by_sincos = encode_angle_by_sincos
        self.norm = norm
        if self.encode_angle_by_sincos:
            self.code_size += 1

    def encode(self, boxes, anchors):
        """boxes, anchors: (..., 7 + C) -> (..., code_size)."""
        xp = _xp(boxes, anchors)
        a_sizes = xp.clip(anchors[..., 3:6], 1e-5, None)
        g_sizes = xp.clip(boxes[..., 3:6], 1e-5, None)
        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        dxa, dya, dza = a_sizes[..., 0], a_sizes[..., 1], a_sizes[..., 2]
        ra = anchors[..., 6]
        xg, yg, zg = boxes[..., 0], boxes[..., 1], boxes[..., 2]
        dxg, dyg, dzg = g_sizes[..., 0], g_sizes[..., 1], g_sizes[..., 2]
        rg = boxes[..., 6]

        diagonal = xp.sqrt(dxa ** 2 + dya ** 2)
        if self.norm:
            xt, yt, zt = (xg - xa) / diagonal, (yg - ya) / diagonal, (zg - za) / dza
            dxt, dyt, dzt = xp.log(dxg / dxa), xp.log(dyg / dya), xp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = dxg - dxa, dyg - dya, dzg - dza
        if self.encode_angle_by_sincos:
            rts = [xp.cos(rg) - xp.cos(ra), xp.sin(rg) - xp.sin(ra)]
        else:
            rts = [rg - ra]
        extras = [boxes[..., 7 + i] - anchors[..., 7 + i] for i in range(boxes.shape[-1] - 7)]
        return xp.stack([xt, yt, zt, dxt, dyt, dzt, *rts, *extras], axis=-1)

    def decode(self, box_encodings, anchors):
        xp = _xp(box_encodings, anchors)
        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        dxa, dya, dza = anchors[..., 3], anchors[..., 4], anchors[..., 5]
        ra = anchors[..., 6]
        xt, yt, zt = box_encodings[..., 0], box_encodings[..., 1], box_encodings[..., 2]
        dxt, dyt, dzt = box_encodings[..., 3], box_encodings[..., 4], box_encodings[..., 5]

        diagonal = xp.sqrt(dxa ** 2 + dya ** 2)
        if self.norm:
            xg, yg, zg = xt * diagonal + xa, yt * diagonal + ya, zt * dza + za
            dxg, dyg, dzg = xp.exp(dxt) * dxa, xp.exp(dyt) * dya, xp.exp(dzt) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg, dyg, dzg = dxt + dxa, dyt + dya, dzt + dza
        if self.encode_angle_by_sincos:
            rg = xp.arctan2(box_encodings[..., 7] + xp.sin(ra), box_encodings[..., 6] + xp.cos(ra))
            extra_start = 8
        else:
            rg = box_encodings[..., 6] + ra
            extra_start = 7
        extras = [
            box_encodings[..., extra_start + i] + anchors[..., 7 + i]
            for i in range(anchors.shape[-1] - 7)
        ]
        return xp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *extras], axis=-1)


class PointResidualCoder:
    """Point-anchored residual coder with sin/cos heading
    (reference box_coder_utils.py:81-159)."""

    def __init__(self, code_size=8, use_mean_size=True, **kwargs):
        self.code_size = code_size
        self.use_mean_size = use_mean_size
        if self.use_mean_size:
            self.mean_size = np.asarray(kwargs["mean_size"], dtype=np.float32)
            assert self.mean_size.min() > 0

    def _anchor_sizes(self, xp, classes):
        mean_size = xp.asarray(self.mean_size)
        return mean_size[classes - 1]

    def encode(self, gt_boxes, points, gt_classes=None):
        xp = _xp(gt_boxes, points)
        sizes = xp.clip(gt_boxes[..., 3:6], 1e-5, None)
        xg, yg, zg = gt_boxes[..., 0], gt_boxes[..., 1], gt_boxes[..., 2]
        dxg, dyg, dzg = sizes[..., 0], sizes[..., 1], sizes[..., 2]
        rg = gt_boxes[..., 6]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        if self.use_mean_size:
            pa = self._anchor_sizes(xp, gt_classes)
            dxa, dya, dza = pa[..., 0], pa[..., 1], pa[..., 2]
            diagonal = xp.sqrt(dxa ** 2 + dya ** 2)
            xt, yt, zt = (xg - xa) / diagonal, (yg - ya) / diagonal, (zg - za) / dza
            dxt, dyt, dzt = xp.log(dxg / dxa), xp.log(dyg / dya), xp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = xp.log(dxg), xp.log(dyg), xp.log(dzg)
        extras = [gt_boxes[..., 7 + i] for i in range(gt_boxes.shape[-1] - 7)]
        return xp.stack([xt, yt, zt, dxt, dyt, dzt, xp.cos(rg), xp.sin(rg), *extras], axis=-1)

    def decode(self, box_encodings, points, pred_classes=None):
        xp = _xp(box_encodings, points)
        xt, yt, zt = box_encodings[..., 0], box_encodings[..., 1], box_encodings[..., 2]
        dxt, dyt, dzt = box_encodings[..., 3], box_encodings[..., 4], box_encodings[..., 5]
        cost, sint = box_encodings[..., 6], box_encodings[..., 7]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        if self.use_mean_size:
            pa = self._anchor_sizes(xp, pred_classes)
            dxa, dya, dza = pa[..., 0], pa[..., 1], pa[..., 2]
            diagonal = xp.sqrt(dxa ** 2 + dya ** 2)
            xg, yg, zg = xt * diagonal + xa, yt * diagonal + ya, zt * dza + za
            dxg, dyg, dzg = xp.exp(dxt) * dxa, xp.exp(dyt) * dya, xp.exp(dzt) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg, dyg, dzg = xp.exp(dxt), xp.exp(dyt), xp.exp(dzt)
        rg = xp.arctan2(sint, cost)
        extras = [box_encodings[..., 8 + i] for i in range(box_encodings.shape[-1] - 8)]
        return xp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *extras], axis=-1)


class PointBinResidualCoder:
    """Angle-bin point coder used by PointHeadVote
    (reference box_coder_utils.py:162-293)."""

    def __init__(self, angle_bin_num, use_mean_size=True, pred_velo=False, **kwargs):
        self.code_size = 6 + 2 * angle_bin_num
        self.angle_bin_num = angle_bin_num
        self.pred_velo = pred_velo
        if pred_velo:
            self.code_size += 2
        self.use_mean_size = use_mean_size
        if self.use_mean_size:
            self.mean_size = np.asarray(kwargs["mean_size"], dtype=np.float32)
            assert self.mean_size.min() > 0

    def encode_angle(self, angle):
        xp = _xp(angle)
        angle = xp.remainder(angle, 2 * np.pi)
        per = 2 * np.pi / float(self.angle_bin_num)
        shifted = xp.remainder(angle + per / 2, 2 * np.pi)
        cls_idx = xp.floor(shifted / per).astype(xp.int32)
        one_hot = (
            xp.arange(self.angle_bin_num)[None, :] == cls_idx[..., None]
        ).astype(angle.dtype)
        res = (shifted - (cls_idx * per + per / 2)) / per
        return one_hot, one_hot * res[..., None]

    def decode_angle(self, angle_cls, angle_res):
        xp = _xp(angle_cls, angle_res)
        idx = xp.argmax(angle_cls, axis=-1)
        one_hot = (
            xp.arange(self.angle_bin_num)[None, :] == idx[..., None]
        ).astype(angle_cls.dtype)
        res = (one_hot * angle_res).sum(axis=-1)
        per = 2 * np.pi / float(self.angle_bin_num)
        return (idx.astype(angle_cls.dtype) + res) * per

    def encode(self, gt_boxes, points, gt_classes=None):
        xp = _xp(gt_boxes, points)
        sizes = xp.clip(gt_boxes[..., 3:6], 1e-5, None)
        xg, yg, zg = gt_boxes[..., 0], gt_boxes[..., 1], gt_boxes[..., 2]
        dxg, dyg, dzg = sizes[..., 0], sizes[..., 1], sizes[..., 2]
        rg = gt_boxes[..., 6]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        if self.use_mean_size:
            mean_size = xp.asarray(self.mean_size)
            pa = mean_size[gt_classes - 1]
            dxa, dya, dza = pa[..., 0], pa[..., 1], pa[..., 2]
            diagonal = xp.sqrt(dxa ** 2 + dya ** 2)
            xt, yt, zt = (xg - xa) / diagonal, (yg - ya) / diagonal, (zg - za) / dza
            dxt, dyt, dzt = xp.log(dxg / dxa), xp.log(dyg / dya), xp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = xp.log(dxg), xp.log(dyg), xp.log(dzg)
        rg_cls, rg_res = self.encode_angle(rg)
        extras = [gt_boxes[..., 7 + i][..., None] for i in range(gt_boxes.shape[-1] - 7)]
        base = xp.stack([xt, yt, zt, dxt, dyt, dzt], axis=-1)
        return xp.concatenate([base, rg_cls, rg_res, *extras], axis=-1)

    def decode(self, box_encodings, points, pred_classes=None):
        xp = _xp(box_encodings, points)
        xt, yt, zt = box_encodings[..., 0], box_encodings[..., 1], box_encodings[..., 2]
        dxt, dyt, dzt = box_encodings[..., 3], box_encodings[..., 4], box_encodings[..., 5]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        if self.use_mean_size:
            mean_size = xp.asarray(self.mean_size)
            pa = mean_size[pred_classes - 1]
            dxa, dya, dza = pa[..., 0], pa[..., 1], pa[..., 2]
            diagonal = xp.sqrt(dxa ** 2 + dya ** 2)
            xg, yg, zg = xt * diagonal + xa, yt * diagonal + ya, zt * dza + za
            dxg, dyg, dzg = xp.exp(dxt) * dxa, xp.exp(dyt) * dya, xp.exp(dzt) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg, dyg, dzg = xp.exp(dxt), xp.exp(dyt), xp.exp(dzt)
        n = self.angle_bin_num
        angle_cls = box_encodings[..., 6:6 + n]
        angle_res = box_encodings[..., 6 + n:6 + 2 * n]
        rg = self.decode_angle(angle_cls, angle_res)
        extras = box_encodings[..., 6 + 2 * n:]
        base = xp.stack([xg, yg, zg, dxg, dyg, dzg, rg], axis=-1)
        return xp.concatenate([base, extras], axis=-1)
