"""RoI head template: proposal selection, IoU-matched RoI sampling, and
box-refinement losses — all fixed-capacity.

TPU-native counterpart of reference
pcdet/models/roi_heads/roi_head_template.py and
target_assigner/proposal_target_layer.py.  The per-sample Python sampling
loops become a vmapped, mask-based categorical sampler with a static
ROI_PER_IMAGE output; 3D IoU comes from ops/iou_nms.boxes_iou3d.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import as_easy
from ...ops import iou_nms
from ...utils import box_coder_utils, common_utils, loss_utils


def subsample_rois(key, max_overlaps, roi_valid, cfg):
    """Vectorized reference ProposalTargetLayer.subsample_rois (:119-196):
    fixed ROI_PER_IMAGE slots filled with fg / hard-bg / easy-bg samples.

    Returns:
        sampled_idx: (R,) int32 indices into rois;
        sampled_valid: (R,) bool (False when no candidates existed at all).
    """
    r = int(cfg.ROI_PER_IMAGE)
    fg_per_image = int(round(float(cfg.FG_RATIO) * r))
    fg_thresh = min(float(cfg.REG_FG_THRESH), float(cfg.CLS_FG_THRESH))
    n = max_overlaps.shape[0]

    fg = (max_overlaps >= fg_thresh) & roi_valid
    easy_bg = (max_overlaps < float(cfg.CLS_BG_THRESH_LO)) & roi_valid
    hard_bg = ((max_overlaps < float(cfg.REG_FG_THRESH))
               & (max_overlaps >= float(cfg.CLS_BG_THRESH_LO)) & roi_valid)
    n_fg = fg.sum()
    n_hard = hard_bg.sum()
    n_easy = easy_bg.sum()
    n_bg = n_hard + n_easy

    k1, k2, k3, k4 = jax.random.split(key, 4)
    # random order inside each category
    def rand_order(mask, k):
        noise = jnp.where(mask, jax.random.uniform(k, (n,)), 2.0)
        return jnp.argsort(noise).astype(jnp.int32)  # category indices first

    fg_order = rand_order(fg, k1)
    hard_order = rand_order(hard_bg, k2)
    easy_order = rand_order(easy_bg, k3)

    # fg count for this image
    both = (n_fg > 0) & (n_bg > 0)
    fg_cnt = jnp.where(both, jnp.minimum(fg_per_image, n_fg),
                       jnp.where(n_fg > 0, r, 0))
    bg_cnt = r - fg_cnt

    # hard/easy split of bg slots (reference sample_bg_inds)
    hard_cnt = jnp.where(
        (n_hard > 0) & (n_easy > 0),
        jnp.minimum((bg_cnt * float(cfg.HARD_BG_RATIO)).astype(jnp.int32), n_hard),
        jnp.where(n_hard > 0, bg_cnt, 0),
    )

    slots = jnp.arange(r, dtype=jnp.int32)
    # fg slots: cycle through the fg_order list (with replacement when
    # fg-only fills all R slots, matching reference randint behavior)
    fg_pick = fg_order[slots % jnp.maximum(n_fg, 1)]
    # bg: random with replacement within each category
    hard_rand = jax.random.randint(k4, (r,), 0, jnp.maximum(n_hard, 1))
    easy_rand = jax.random.randint(k2, (r,), 0, jnp.maximum(n_easy, 1))
    hard_pick = hard_order[hard_rand]
    easy_pick = easy_order[easy_rand]

    bg_slot = slots - fg_cnt  # position within bg slots
    bg_pick = jnp.where(bg_slot < hard_cnt, hard_pick, easy_pick)
    sampled = jnp.where(slots < fg_cnt, fg_pick, bg_pick)
    sampled_valid = jnp.where(slots < fg_cnt, True, bg_slot < bg_cnt) \
        & ((n_fg + n_bg) > 0)
    sampled = jnp.where(sampled_valid, sampled, 0)
    return sampled, sampled_valid


class RoIHeadTemplate(nn.Module):
    """Subclasses implement __call__; this provides proposal_layer,
    assign_targets, losses, and decoded predictions."""

    model_cfg: Any
    num_class: int = 1
    dtype: Any = jnp.float32

    def _cfg(self):
        return as_easy(self.model_cfg)

    def _box_coder(self):
        cfg = self._cfg().TARGET_CONFIG
        return getattr(box_coder_utils, cfg.BOX_CODER)(**cfg.get("BOX_CODER_CONFIG", {}))

    # ------------------------------------------------------------------ #
    def proposal_layer(self, batch_dict, nms_config):
        """Reference proposal_layer (:46-103): NMS over first-stage box
        predictions into fixed NMS_POST_MAXSIZE RoIs.  Skipped when rois
        already exist (e.g. CenterHead supplied them) or NMS_CONFIG None."""
        if "rois" in batch_dict or nms_config in (None, "None"):
            batch_dict.setdefault("roi_valid", jnp.ones(
                batch_dict["rois"].shape[:2], bool) if "rois" in batch_dict else None)
            return batch_dict
        box_preds = batch_dict["batch_box_preds"]
        cls_preds = batch_dict["batch_cls_preds"]
        scores = jnp.max(cls_preds, axis=-1)
        labels = jnp.argmax(cls_preds, axis=-1)

        def per_sample(bx, sc, lb):
            keep_idx, keep_mask, keep_scores = iou_nms.nms_bev(
                bx[:, :7], sc, float(nms_config.NMS_THRESH),
                int(nms_config.NMS_PRE_MAXSIZE), int(nms_config.NMS_POST_MAXSIZE))
            safe = jnp.clip(keep_idx, 0)
            return bx[safe], keep_scores, lb[safe], keep_mask

        rois, roi_scores, roi_labels, roi_valid = jax.vmap(per_sample)(
            box_preds, scores, labels)
        batch_dict["rois"] = rois
        batch_dict["roi_scores"] = roi_scores
        batch_dict["roi_labels"] = roi_labels + 1
        batch_dict["roi_valid"] = roi_valid
        batch_dict["has_class_labels"] = cls_preds.shape[-1] > 1
        return batch_dict

    # ------------------------------------------------------------------ #
    def assign_targets(self, batch_dict, rng):
        """Reference assign_targets + ProposalTargetLayer: IoU-matched
        sampling to ROI_PER_IMAGE, canonical gt transform."""
        cfg = self._cfg().TARGET_CONFIG
        rois = batch_dict["rois"][..., :7]
        roi_scores = batch_dict["roi_scores"]
        roi_labels = batch_dict["roi_labels"].astype(jnp.int32)
        roi_valid = batch_dict.get(
            "roi_valid", jnp.ones(rois.shape[:2], bool))
        gt_boxes = batch_dict["gt_boxes"]  # (B, G, 8)
        b = rois.shape[0]

        gt_valid = jnp.any(jnp.abs(gt_boxes) > 1e-6, axis=-1)
        gt_cls = gt_boxes[..., -1].astype(jnp.int32)

        def per_sample(key, roi, rsc, rlb, rvd, gt, gvd, gcls):
            iou = iou_nms.boxes_iou3d(roi, gt[:, :7])  # (N, G)
            if cfg.get("SAMPLE_ROI_BY_EACH_CLASS", False):
                same = (rlb[:, None] == gcls[None, :])
                iou = jnp.where(same & gvd[None, :], iou, 0.0)
            else:
                iou = jnp.where(gvd[None, :], iou, 0.0)
            max_overlaps = jnp.max(iou, axis=1)
            gt_assign = jnp.argmax(iou, axis=1).astype(jnp.int32)

            sampled, sampled_valid = subsample_rois(key, max_overlaps, rvd, cfg)
            s_rois = roi[sampled]
            s_labels = rlb[sampled]
            s_scores = rsc[sampled]
            s_ious = max_overlaps[sampled]
            s_gt = gt[gt_assign[sampled]]
            return s_rois, s_labels, s_scores, s_ious, s_gt, sampled_valid

        keys = jax.random.split(rng, b)
        s_rois, s_labels, s_scores, s_ious, s_gt, s_valid = jax.vmap(per_sample)(
            keys, rois, roi_scores, roi_labels, roi_valid, gt_boxes, gt_valid, gt_cls)

        reg_valid_mask = ((s_ious > float(cfg.REG_FG_THRESH)) & s_valid).astype(jnp.int32)
        cls_type = cfg.CLS_SCORE_TYPE
        if cls_type == "cls":
            lbl = (s_ious > float(cfg.CLS_FG_THRESH)).astype(jnp.float32)
            ignore = (s_ious > float(cfg.CLS_BG_THRESH)) & \
                (s_ious < float(cfg.CLS_FG_THRESH))
            cls_labels = jnp.where(ignore, -1.0, lbl)
        elif cls_type == "roi_iou":
            fg = s_ious > float(cfg.CLS_FG_THRESH)
            bg = s_ious < float(cfg.CLS_BG_THRESH)
            interval = (~fg) & (~bg)
            soft = (s_ious - float(cfg.CLS_BG_THRESH)) / (
                float(cfg.CLS_FG_THRESH) - float(cfg.CLS_BG_THRESH))
            cls_labels = jnp.where(fg, 1.0, jnp.where(interval, soft, 0.0))
        else:
            raise NotImplementedError(cls_type)
        cls_labels = jnp.where(s_valid, cls_labels, -1.0)

        # canonical transform of gt into roi frame (reference :106-128)
        gt_of_rois_src = s_gt
        roi_center = s_rois[..., 0:3]
        roi_ry = common_utils.limit_period(s_rois[..., 6], 0.5, np.pi * 2)
        gt_local = s_gt[..., :7]
        shifted = gt_local.at[..., 0:3].set(gt_local[..., 0:3] - roi_center)
        shifted = shifted.at[..., 6].set(gt_local[..., 6] - roi_ry)
        bsz, r = shifted.shape[:2]
        rot = common_utils.rotate_points_along_z(
            shifted.reshape(-1, 1, 7), -roi_ry.reshape(-1)).reshape(bsz, r, 7)
        rot = rot.at[..., 6].set(
            common_utils.limit_period(rot[..., 6], 0.5, np.pi))

        return {
            "rois": s_rois,
            "roi_labels": s_labels,
            "roi_scores": s_scores,
            "gt_iou_of_rois": s_ious,
            "gt_of_rois": rot,
            "gt_of_rois_src": gt_of_rois_src,
            "reg_valid_mask": reg_valid_mask,
            "rcnn_cls_labels": cls_labels,
            "roi_sample_valid": s_valid,
        }

    # ------------------------------------------------------------------ #
    def get_loss(self, ret):
        cfg = self._cfg().LOSS_CONFIG
        coder = self._box_coder()
        code_size = coder.code_size
        lw = cfg.LOSS_WEIGHTS

        # cls loss (reference get_box_cls_layer_loss)
        rcnn_cls = ret["rcnn_cls"].reshape(-1).astype(jnp.float32)
        cls_labels = ret["rcnn_cls_labels"].reshape(-1)
        if cfg.CLS_LOSS == "BinaryCrossEntropy":
            p = jax.nn.sigmoid(rcnn_cls)
            bce = -(cls_labels * jnp.log(jnp.clip(p, 1e-7))
                    + (1 - cls_labels) * jnp.log(jnp.clip(1 - p, 1e-7)))
            valid = (cls_labels >= 0).astype(jnp.float32)
            cls_loss = jnp.sum(bce * valid) / jnp.clip(valid.sum(), 1.0)
        else:
            raise NotImplementedError(cfg.CLS_LOSS)
        cls_loss = cls_loss * lw["rcnn_cls_weight"]

        # reg loss (reference get_box_reg_layer_loss)
        reg_mask = ret["reg_valid_mask"].reshape(-1) > 0
        gt_ct = ret["gt_of_rois"][..., :code_size].reshape(-1, code_size)
        rois = ret["rois"].reshape(-1, code_size)
        rcnn_reg = ret["rcnn_reg"].reshape(-1, code_size).astype(jnp.float32)
        fg_sum = jnp.maximum(reg_mask.sum(), 1)

        rois_anchor = rois.at[:, 0:3].set(0.0).at[:, 6].set(0.0)
        reg_targets = coder.encode(gt_ct, rois_anchor)
        reg_loss_fn = getattr(loss_utils, cfg.REG_LOSS)(code_weights=lw["code_weights"])
        reg_l = reg_loss_fn(rcnn_reg[None], reg_targets[None])[0]  # (BR, code)
        reg_loss = jnp.sum(reg_l * reg_mask[:, None]) / fg_sum
        reg_loss = reg_loss * lw["rcnn_reg_weight"]

        tb = {"rcnn_loss_cls": cls_loss, "rcnn_loss_reg": reg_loss}
        total = cls_loss + reg_loss

        if cfg.get("CORNER_LOSS_REGULARIZATION", False):
            decoded = coder.decode(rcnn_reg, rois_anchor)
            roi_ry = rois[:, 6]
            decoded = common_utils.rotate_points_along_z(
                decoded[:, None, :], roi_ry)[:, 0, :]
            decoded = decoded.at[:, 0:3].add(rois[:, 0:3])
            gt_src = ret["gt_of_rois_src"][..., :7].reshape(-1, 7)
            corner = loss_utils.get_corner_loss_lidar(decoded[:, :7], gt_src)
            corner_loss = jnp.sum(corner * reg_mask) / fg_sum
            corner_loss = corner_loss * lw["rcnn_corner_weight"]
            total = total + corner_loss
            tb["rcnn_loss_corner"] = corner_loss
        tb["rcnn_loss"] = total
        return total, tb

    # ------------------------------------------------------------------ #
    def generate_predicted_boxes(self, rois, cls_preds, box_preds):
        """Reference generate_predicted_boxes (:233-263)."""
        coder = self._box_coder()
        code_size = coder.code_size
        b, r = rois.shape[:2]
        cls = cls_preds.reshape(b, r, -1).astype(jnp.float32)
        reg = box_preds.reshape(b, r, code_size).astype(jnp.float32)

        local_rois = rois[..., :code_size].at[..., 0:3].set(0.0)
        decoded = coder.decode(reg, local_rois).reshape(-1, code_size)
        roi_ry = rois[..., 6].reshape(-1)
        decoded = common_utils.rotate_points_along_z(
            decoded[:, None, :], roi_ry)[:, 0, :]
        decoded = decoded.at[:, 0:3].add(rois[..., 0:3].reshape(-1, 3))
        return cls, decoded.reshape(b, r, code_size)
