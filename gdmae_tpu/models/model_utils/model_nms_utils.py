"""NMS facades matching the reference API surface
(pcdet/models/model_utils/model_nms_utils.py) on top of ops/iou_nms.

The detector pipelines call ops/iou_nms directly; these wrappers keep the
reference's named entry points available for external users.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import iou_nms


def class_agnostic_nms(box_scores, box_preds, nms_config, score_thresh=None):
    """(N,) scores + (N, 7+) boxes -> fixed-K keep indices + mask + scores."""
    valid = None
    if score_thresh is not None:
        valid = box_scores >= score_thresh
    return iou_nms.nms_bev(
        box_preds[:, :7], box_scores, float(nms_config.NMS_THRESH),
        int(nms_config.NMS_PRE_MAXSIZE), int(nms_config.NMS_POST_MAXSIZE),
        valid=valid)


def multi_class_agnostic_nms(box_scores, box_ious, box_labels, box_preds,
                             nms_config):
    """IoU-rectified per-class NMS (reference :28-46).  Returns per-class
    fixed-capacity keeps concatenated."""
    rect = jnp.asarray(nms_config.IOU_RECTIFIER, jnp.float32)[box_labels]
    rect_scores = jnp.power(jnp.maximum(box_scores, 1e-9), 1 - rect) * \
        jnp.power(jnp.maximum(box_ious, 1e-9), rect)
    keeps = []
    for cls in range(len(nms_config.NMS_THRESH)):
        cls_valid = box_labels == cls
        keeps.append(iou_nms.nms_bev(
            box_preds[:, :7], rect_scores, float(nms_config.NMS_THRESH[cls]),
            int(nms_config.NMS_PRE_MAXSIZE[cls]),
            int(nms_config.NMS_POST_MAXSIZE[cls]), valid=cls_valid))
    keep_idx = jnp.concatenate([k[0] for k in keeps])
    keep_mask = jnp.concatenate([k[1] for k in keeps])
    keep_scores = jnp.concatenate([k[2] for k in keeps])
    return keep_idx, keep_mask, keep_scores


def multi_classes_nms(cls_scores, box_preds, nms_config, score_thresh=None):
    """Per-class NMS over (N, num_class) scores (reference :49-87)."""
    outs = []
    for c in range(cls_scores.shape[-1]):
        scores = cls_scores[:, c]
        valid = scores >= score_thresh if score_thresh is not None else None
        outs.append(iou_nms.nms_bev(
            box_preds[:, :7], scores, float(nms_config.NMS_THRESH),
            int(nms_config.NMS_PRE_MAXSIZE), int(nms_config.NMS_POST_MAXSIZE),
            valid=valid))
    keep_idx = jnp.concatenate([o[0] for o in outs])
    keep_mask = jnp.concatenate([o[1] for o in outs])
    keep_scores = jnp.concatenate([o[2] for o in outs])
    labels = jnp.concatenate([
        jnp.full_like(o[0], c) for c, o in enumerate(outs)])
    return keep_idx, keep_mask, keep_scores, labels
