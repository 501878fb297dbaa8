"""Anchor-based dense head (AnchorHeadSingle) with a fully-vectorized
axis-aligned target assigner.

TPU-native counterpart of reference
pcdet/models/dense_heads/anchor_head_{template,single}.py and
target_assigner/{anchor_generator,axis_aligned_target_assigner}.py.
The per-sample/per-class Python loops of the reference assigner become a
static class loop over a vmapped, masked (Na, Mg) IoU computation — no
dynamic shapes, no host round-trips.
"""
from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import as_easy
from ...utils import box_coder_utils, box_utils, common_utils, loss_utils


def generate_anchors(anchor_cfgs, grid_size, point_cloud_range, feature_stride=None):
    """Numpy anchor generation (reference anchor_generator.py:18-62).

    Returns:
        anchors_per_class: list of (ny, nx, nsz * nrot, 7) float32,
        num_per_loc: list of ints.
    """
    out, num_per_loc = [], []
    pr = np.asarray(point_cloud_range, np.float64)
    for cfg in anchor_cfgs:
        stride = int(cfg.get("feature_map_stride", 1)) if feature_stride is None else feature_stride
        gx, gy = int(grid_size[0]) // stride, int(grid_size[1]) // stride
        sizes = np.asarray(cfg["anchor_sizes"], np.float64)  # (nsz, 3)
        rots = np.asarray(cfg["anchor_rotations"], np.float64)  # (nrot,)
        heights = np.asarray(cfg["anchor_bottom_heights"], np.float64)  # (nh,)
        align_center = bool(cfg.get("align_center", False))
        if align_center:
            x_stride = (pr[3] - pr[0]) / gx
            y_stride = (pr[4] - pr[1]) / gy
            x_off, y_off = x_stride / 2, y_stride / 2
        else:
            x_stride = (pr[3] - pr[0]) / (gx - 1)
            y_stride = (pr[4] - pr[1]) / (gy - 1)
            x_off, y_off = 0.0, 0.0
        xs = pr[0] + x_off + x_stride * np.arange(gx)
        ys = pr[1] + y_off + y_stride * np.arange(gy)
        nsz, nrot, nh = len(sizes), len(rots), len(heights)
        # (ny, nx, nh*nsz*nrot, 7): y-major grid to match NHWC head outputs
        a = np.zeros((gy, gx, nh, nsz, nrot, 7), np.float64)
        a[..., 0] = xs[None, :, None, None, None]
        a[..., 1] = ys[:, None, None, None, None]
        a[..., 2] = heights[None, None, :, None, None] + sizes[None, None, None, :, 2] / 2
        a[..., 3:6] = sizes[None, None, None, :, None, :]
        a[..., 6] = rots[None, None, None, None, :]
        out.append(a.reshape(gy, gx, nh * nsz * nrot, 7).astype(np.float32))
        num_per_loc.append(nh * nsz * nrot)
    return out, num_per_loc


def assign_targets_single_class(anchors, gt_boxes, gt_mask, matched_thr, unmatched_thr):
    """Vectorized reference assign_targets_single
    (axis_aligned_target_assigner.py:133-209) for one class, one sample.

    Args:
        anchors: (Na, 7); gt_boxes: (Mg, 7); gt_mask: (Mg,) bool — gt of this
            class and valid.
    Returns:
        fg: (Na,) bool, bg: (Na,) bool, gt_idx: (Na,) int32 (argmax gt).
    """
    iou = box_utils.boxes3d_nearest_bev_iou(anchors, gt_boxes)  # (Na, Mg)
    iou = jnp.where(gt_mask[None, :], iou, -1.0)
    a2g_max = jnp.max(iou, axis=1)
    a2g_arg = jnp.argmax(iou, axis=1).astype(jnp.int32)
    g2a_max = jnp.max(iou, axis=0)  # (Mg,)
    # a gt with zero best overlap force-matches nothing (reference :154-155)
    force = gt_mask[None, :] & (g2a_max[None, :] > 0) & (iou >= g2a_max[None, :])
    force_any = jnp.any(force, axis=1)
    pos = a2g_max >= matched_thr
    fg = force_any | pos
    bg = (a2g_max < unmatched_thr) & ~fg
    return fg, bg, a2g_arg


class AnchorHeadSingle(nn.Module):
    """Reference anchor_head_single.py — 1x1 conv cls/box/dir heads over the
    dense BEV map plus template losses (anchor_head_template.py)."""

    model_cfg: Any
    input_channels: int
    num_class: int
    class_names: Sequence[str]
    grid_size: Tuple[int, int]  # (nx, ny)
    point_cloud_range: Tuple[float, ...]
    predict_boxes_when_training: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        cfg = as_easy(self.model_cfg)
        target_cfg = cfg.TARGET_ASSIGNER_CONFIG
        self.box_coder = getattr(box_coder_utils, target_cfg.BOX_CODER)(
            **target_cfg.get("BOX_CODER_CONFIG", {})
        )
        anchors, num_per_loc = generate_anchors(
            cfg.ANCHOR_GENERATOR_CONFIG, self.grid_size, self.point_cloud_range
        )
        self.anchors_per_class = [jnp.asarray(a) for a in anchors]
        self.num_anchors_per_location = int(sum(num_per_loc))
        self.matched_thr = [float(c["matched_threshold"]) for c in cfg.ANCHOR_GENERATOR_CONFIG]
        self.unmatched_thr = [float(c["unmatched_threshold"]) for c in cfg.ANCHOR_GENERATOR_CONFIG]
        self.anchor_class_names = [c["class_name"] for c in cfg.ANCHOR_GENERATOR_CONFIG]

        code = self.box_coder.code_size
        self.conv_cls = nn.Conv(
            self.num_anchors_per_location * self.num_class, (1, 1), dtype=self.dtype,
            bias_init=nn.initializers.constant(-math.log((1 - 0.01) / 0.01)),
            name="conv_cls",
        )
        self.conv_box = nn.Conv(
            self.num_anchors_per_location * code, (1, 1), dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001), name="conv_box",
        )
        self.use_dir = cfg.get("USE_DIRECTION_CLASSIFIER", None) is not None
        if self.use_dir:
            self.conv_dir = nn.Conv(
                self.num_anchors_per_location * int(cfg.NUM_DIR_BINS), (1, 1),
                dtype=self.dtype, name="conv_dir_cls",
            )

        lw = cfg.LOSS_CONFIG.LOSS_WEIGHTS
        self.cls_loss_func = loss_utils.SigmoidFocalClassificationLoss(alpha=0.25, gamma=2.0)
        self.reg_loss_func = loss_utils.WeightedSmoothL1Loss(code_weights=lw["code_weights"])
        self.dir_loss_func = loss_utils.WeightedCrossEntropyLoss()

    # ------------------------------------------------------------------ #
    def flat_anchors(self):
        """(num_total, 7): per location, class-major then size/rot, matching
        the reference's cat(self.anchors, dim=-3).view(-1, 7)."""
        gy, gx = self.anchors_per_class[0].shape[:2]
        per_loc = jnp.concatenate(self.anchors_per_class, axis=2)  # (gy, gx, A, 7)
        return per_loc.reshape(-1, 7)

    def assign_targets(self, gt_boxes):
        """gt_boxes: (B, Mg, 8) padded with zeros; last col = class id (1-based).

        Returns dict with box_cls_labels (B, Ntot), box_reg_targets
        (B, Ntot, code), reg_weights (B, Ntot).
        """
        gt_cls = gt_boxes[..., 7].astype(jnp.int32)
        gt_box = gt_boxes[..., :7]
        gt_valid = jnp.any(jnp.abs(gt_boxes) > 1e-6, axis=-1)

        def per_sample(gt_b, gt_c, valid):
            labels_c, tgt_c, fg_c = [], [], []
            for ci, anch in enumerate(self.anchors_per_class):
                gy, gx, a_c, _ = anch.shape
                flat_anch = anch.reshape(-1, 7)
                mask = valid & (gt_c == ci + 1)
                fg, bg, arg = assign_targets_single_class(
                    flat_anch, gt_b, mask, self.matched_thr[ci], self.unmatched_thr[ci]
                )
                label = jnp.where(fg, ci + 1, jnp.where(bg, 0, -1)).astype(jnp.int32)
                matched_gt = gt_b[arg]
                t = self.box_coder.encode(matched_gt, flat_anch)
                t = jnp.where(fg[:, None], t, 0.0)
                labels_c.append(label.reshape(gy, gx, a_c))
                tgt_c.append(t.reshape(gy, gx, a_c, -1))
                fg_c.append(fg.reshape(gy, gx, a_c))
            labels = jnp.concatenate(labels_c, axis=2).reshape(-1)
            tgts = jnp.concatenate(tgt_c, axis=2).reshape(-1, self.box_coder.code_size)
            fg = jnp.concatenate(fg_c, axis=2).reshape(-1)
            return labels, tgts, fg

        labels, tgts, fg = jax.vmap(per_sample)(gt_box, gt_cls, gt_valid)
        return {
            "box_cls_labels": labels,
            "box_reg_targets": tgts,
            "reg_weights": fg.astype(jnp.float32),
        }

    # ------------------------------------------------------------------ #
    def get_loss(self, ret):
        """Reference anchor_head_template get_cls_layer_loss /
        get_box_reg_layer_loss (:100-213)."""
        cfg = as_easy(self.model_cfg)
        lw = cfg.LOSS_CONFIG.LOSS_WEIGHTS
        cls_preds = ret["cls_preds"].astype(jnp.float32)
        box_preds = ret["box_preds"].astype(jnp.float32)
        labels = ret["box_cls_labels"]
        b = cls_preds.shape[0]

        cared = labels >= 0
        positives = labels > 0
        negatives = labels == 0
        cls_weights = (negatives.astype(jnp.float32) + positives.astype(jnp.float32))
        pos_norm = jnp.clip(positives.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0)
        cls_weights = cls_weights / pos_norm
        cls_targets = jnp.where(cared, labels, 0)
        one_hot = jax.nn.one_hot(cls_targets, self.num_class + 1)[..., 1:]
        cls_preds_r = cls_preds.reshape(b, -1, self.num_class)
        cls_loss = self.cls_loss_func(cls_preds_r, one_hot, weights=cls_weights)
        cls_loss = cls_loss.sum() / b * lw["cls_weight"]

        reg_weights = positives.astype(jnp.float32) / pos_norm
        anchors = self.flat_anchors()[None].repeat(b, 0)
        box_preds_r = box_preds.reshape(b, -1, self.box_coder.code_size)
        reg_targets = ret["box_reg_targets"]
        # sin(a - b) heading encoding (:134-141)
        ps, ts = self._add_sin_difference(box_preds_r, reg_targets)
        loc_loss = self.reg_loss_func(ps, ts, weights=reg_weights)
        loc_loss = loc_loss.sum() / b * lw["loc_weight"]

        tb = {"rpn_loss_cls": cls_loss, "rpn_loss_loc": loc_loss}
        box_loss = loc_loss
        if self.use_dir and "dir_cls_preds" in ret:
            dir_targets = self._get_direction_target(anchors, reg_targets)
            dir_logits = ret["dir_cls_preds"].astype(jnp.float32).reshape(
                b, -1, int(cfg.NUM_DIR_BINS))
            weights = positives.astype(jnp.float32)
            weights = weights / jnp.clip(weights.sum(-1, keepdims=True), 1.0)
            dir_loss = self.dir_loss_func(dir_logits, dir_targets, weights=weights)
            dir_loss = dir_loss.sum() / b * lw["dir_weight"]
            box_loss = box_loss + dir_loss
            tb["rpn_loss_dir"] = dir_loss
        return cls_loss + box_loss, tb

    @staticmethod
    def _add_sin_difference(boxes1, boxes2, dim=6):
        rad_pred = jnp.sin(boxes1[..., dim:dim + 1]) * jnp.cos(boxes2[..., dim:dim + 1])
        rad_tg = jnp.cos(boxes1[..., dim:dim + 1]) * jnp.sin(boxes2[..., dim:dim + 1])
        b1 = jnp.concatenate([boxes1[..., :dim], rad_pred, boxes1[..., dim + 1:]], axis=-1)
        b2 = jnp.concatenate([boxes2[..., :dim], rad_tg, boxes2[..., dim + 1:]], axis=-1)
        return b1, b2

    def _get_direction_target(self, anchors, reg_targets):
        cfg = as_easy(self.model_cfg)
        num_bins = int(cfg.NUM_DIR_BINS)
        rot_gt = reg_targets[..., 6] + anchors[..., 6]
        offset_rot = common_utils.limit_period(rot_gt - float(cfg.DIR_OFFSET), 0, 2 * np.pi)
        dir_t = jnp.clip(
            jnp.floor(offset_rot / (2 * np.pi / num_bins)).astype(jnp.int32), 0, num_bins - 1
        )
        return jax.nn.one_hot(dir_t, num_bins)

    def generate_predicted_boxes(self, cls_preds, box_preds, dir_cls_preds=None):
        """(B, H, W, C) head maps -> (B, Ntot, num_class), (B, Ntot, 7)."""
        b = cls_preds.shape[0]
        anchors = self.flat_anchors()
        n_tot = anchors.shape[0]
        cls = cls_preds.reshape(b, n_tot, -1).astype(jnp.float32)
        box = box_preds.reshape(b, n_tot, -1).astype(jnp.float32)
        boxes = self.box_coder.decode(box, anchors[None])
        if dir_cls_preds is not None:
            cfg = as_easy(self.model_cfg)
            dir_offset = float(cfg.DIR_OFFSET)
            dir_limit = float(cfg.DIR_LIMIT_OFFSET)
            num_bins = int(cfg.NUM_DIR_BINS)
            dir_labels = jnp.argmax(
                dir_cls_preds.reshape(b, n_tot, -1).astype(jnp.float32), axis=-1)
            period = 2 * np.pi / num_bins
            dir_rot = common_utils.limit_period(boxes[..., 6] - dir_offset, dir_limit, period)
            heading = dir_rot + dir_offset + period * dir_labels.astype(jnp.float32)
            boxes = jnp.concatenate([boxes[..., :6], heading[..., None], boxes[..., 7:]], axis=-1)
        return cls, boxes

    def __call__(self, batch_dict, train: bool = True):
        x = batch_dict["spatial_features_2d"]
        cls_preds = self.conv_cls(x)
        box_preds = self.conv_box(x)
        ret = {"cls_preds": cls_preds, "box_preds": box_preds}
        if self.use_dir:
            ret["dir_cls_preds"] = self.conv_dir(x)

        if train:
            ret.update(self.assign_targets(batch_dict["gt_boxes"]))
            loss, tb = self.get_loss(ret)
            batch_dict["loss_rpn"] = loss
            batch_dict.setdefault("tb_dict", {}).update(tb)
        if not train or self.predict_boxes_when_training:
            batch_cls, batch_box = self.generate_predicted_boxes(
                cls_preds, box_preds, ret.get("dir_cls_preds")
            )
            batch_dict["batch_cls_preds"] = batch_cls
            batch_dict["batch_box_preds"] = batch_box
            batch_dict["cls_preds_normalized"] = False
        batch_dict["dense_head_ret"] = ret
        return batch_dict
