"""Point-wise heads inherited from OpenPCDet (registered in the reference
but unused by shipped GD-MAE configs): PointHeadSimple, PointHeadBox,
PointIntraPartOffsetHead (reference pcdet/models/dense_heads/
point_head_{simple,box}.py, point_intra_part_head.py).

All operate on padded (B, N, C) point features with validity masks; target
assignment reuses point_head_vote.assign_point_targets.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...config import as_easy
from ...utils import box_coder_utils, loss_utils
from ..model_utils.blocks import MaskedBatchNorm
from .point_head_vote import assign_point_targets


class _FCStack(nn.Module):
    channels: Sequence[int]
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train=True):
        for i, c in enumerate(self.channels):
            x = nn.Dense(int(c), use_bias=False, dtype=self.dtype, name=f"fc{i}")(x)
            # reference point_head_template.make_fc_layers:42 uses
            # torch-default BatchNorm1d (eps=1e-5, momentum=0.1)
            x = MaskedBatchNorm(eps=1e-5, momentum=0.1, dtype=self.dtype,
                                name=f"bn{i}")(
                x, mask=mask, use_running_average=not train)
            x = nn.relu(x)
        return nn.Dense(self.out_channels, dtype=jnp.float32, name="out")(x)


class PointHeadSimple(nn.Module):
    """Foreground classification only (reference point_head_simple.py)."""

    model_cfg: Any
    input_channels: int
    num_class: int
    class_names: Sequence[str] = ()
    grid_size: Tuple[int, int] = (1, 1)
    point_cloud_range: Tuple[float, ...] = ()
    predict_boxes_when_training: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_dict, train: bool = True):
        cfg = as_easy(self.model_cfg)
        feats = batch_dict["point_features"]
        valid = batch_dict.get("point_valid",
                               jnp.ones(feats.shape[:2], bool))
        cls_preds = _FCStack(cfg.CLS_FC, self.num_class, dtype=self.dtype,
                             name="cls")(feats, mask=valid, train=train)
        batch_dict["point_cls_scores"] = jnp.max(
            jax.nn.sigmoid(cls_preds), axis=-1)

        if train:
            tgt = assign_point_targets(
                batch_dict["point_coords"][..., :3], valid,
                batch_dict["gt_boxes"], self.num_class,
                extend_width=cfg.TARGET_CONFIG.get("GT_EXTRA_WIDTH"),
                set_ignore_flag=True)
            labels = tgt["cls_labels"]
            pos = labels > 0
            neg = labels == 0
            w = (pos | neg).astype(jnp.float32)
            w = w / jnp.clip(pos.sum().astype(jnp.float32), 1.0)
            one_hot = jax.nn.one_hot(jnp.clip(labels, 0), self.num_class + 1)[..., 1:]
            loss_fn = loss_utils.SigmoidFocalClassificationLoss(alpha=0.25, gamma=2.0)
            loss = loss_fn(cls_preds, one_hot, weights=w).sum()
            loss = loss * cfg.LOSS_CONFIG.LOSS_WEIGHTS.get("point_cls_weight", 1.0)
            batch_dict["loss_point"] = loss
            batch_dict.setdefault("tb_dict", {})["point_cls_loss"] = loss
        return batch_dict


class PointHeadBox(nn.Module):
    """Per-point classification + box regression (reference
    point_head_box.py) — PointRCNN-style first stage."""

    model_cfg: Any
    input_channels: int
    num_class: int
    class_names: Sequence[str] = ()
    grid_size: Tuple[int, int] = (1, 1)
    point_cloud_range: Tuple[float, ...] = ()
    predict_boxes_when_training: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_dict, train: bool = True):
        cfg = as_easy(self.model_cfg)
        coder = getattr(box_coder_utils, cfg.TARGET_CONFIG.BOX_CODER)(
            **cfg.TARGET_CONFIG.get("BOX_CODER_CONFIG", {}))
        feats = batch_dict["point_features"]
        coords = batch_dict["point_coords"][..., :3]
        valid = batch_dict.get("point_valid", jnp.ones(feats.shape[:2], bool))

        cls_preds = _FCStack(cfg.CLS_FC, self.num_class, dtype=self.dtype,
                             name="cls")(feats, mask=valid, train=train)
        box_preds = _FCStack(cfg.REG_FC, coder.code_size, dtype=self.dtype,
                             name="box")(feats, mask=valid, train=train)
        batch_dict["point_cls_scores"] = jnp.max(jax.nn.sigmoid(cls_preds), -1)

        if train:
            tgt = assign_point_targets(
                coords, valid, batch_dict["gt_boxes"], self.num_class,
                box_coder=coder,
                extend_width=cfg.TARGET_CONFIG.get("GT_EXTRA_WIDTH"),
                set_ignore_flag=True)
            labels = tgt["cls_labels"]
            pos = labels > 0
            neg = labels == 0
            w = (pos | neg).astype(jnp.float32) / jnp.clip(
                pos.sum().astype(jnp.float32), 1.0)
            one_hot = jax.nn.one_hot(jnp.clip(labels, 0), self.num_class + 1)[..., 1:]
            cls_loss = loss_utils.SigmoidFocalClassificationLoss(0.25, 2.0)(
                cls_preds, one_hot, weights=w).sum()
            reg_w = pos.astype(jnp.float32) / jnp.clip(
                pos.sum().astype(jnp.float32), 1.0)
            reg_loss_fn = loss_utils.WeightedSmoothL1Loss(
                code_weights=cfg.LOSS_CONFIG.LOSS_WEIGHTS.get("code_weights"))
            reg_loss = reg_loss_fn(box_preds, tgt["box_labels"],
                                   weights=reg_w).sum()
            lw = cfg.LOSS_CONFIG.LOSS_WEIGHTS
            loss = cls_loss * lw.get("point_cls_weight", 1.0) \
                + reg_loss * lw.get("point_box_weight", 1.0)
            batch_dict["loss_point"] = loss
            batch_dict.setdefault("tb_dict", {}).update(
                {"point_cls_loss": cls_loss, "point_box_loss": reg_loss})

        if not train or self.predict_boxes_when_training:
            b, n = coords.shape[:2]
            pred_classes = jnp.argmax(cls_preds, -1) + 1
            boxes = coder.decode(
                box_preds.reshape(-1, coder.code_size), coords.reshape(-1, 3),
                pred_classes.reshape(-1)) if "mean_size" in str(
                    cfg.TARGET_CONFIG.get("BOX_CODER_CONFIG", {})) else \
                coder.decode(box_preds.reshape(-1, coder.code_size),
                             coords.reshape(-1, 3))
            batch_dict["batch_cls_preds"] = cls_preds
            batch_dict["batch_box_preds"] = boxes.reshape(b, n, -1)
            batch_dict["cls_preds_normalized"] = False
        return batch_dict


class PointIntraPartOffsetHead(nn.Module):
    """Per-point intra-object part locations (reference
    point_intra_part_head.py — Part-A2 style)."""

    model_cfg: Any
    input_channels: int
    num_class: int
    class_names: Sequence[str] = ()
    grid_size: Tuple[int, int] = (1, 1)
    point_cloud_range: Tuple[float, ...] = ()
    predict_boxes_when_training: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_dict, train: bool = True):
        cfg = as_easy(self.model_cfg)
        feats = batch_dict["point_features"]
        coords = batch_dict["point_coords"][..., :3]
        valid = batch_dict.get("point_valid", jnp.ones(feats.shape[:2], bool))

        cls_preds = _FCStack(cfg.CLS_FC, self.num_class, dtype=self.dtype,
                             name="cls")(feats, mask=valid, train=train)
        part_preds = _FCStack(cfg.PART_FC, 3, dtype=self.dtype,
                              name="part")(feats, mask=valid, train=train)
        batch_dict["point_cls_scores"] = jnp.max(jax.nn.sigmoid(cls_preds), -1)
        batch_dict["point_part_offset"] = jax.nn.sigmoid(part_preds)

        if train:
            from ...utils import common_utils

            tgt = assign_point_targets(
                coords, valid, batch_dict["gt_boxes"], self.num_class,
                extend_width=cfg.TARGET_CONFIG.get("GT_EXTRA_WIDTH"),
                set_ignore_flag=True)
            labels = tgt["cls_labels"]
            pos = labels > 0
            # intra-part labels: local coords normalized to [0, 1]
            gt = tgt["gt_box_of_points"]
            b, n = pos.shape
            local = coords - gt[..., :3]
            flat = common_utils.rotate_points_along_z(
                local.reshape(-1, 1, 3), -gt[..., 6].reshape(-1)).reshape(b, n, 3)
            part_labels = jnp.clip(
                flat / jnp.clip(gt[..., 3:6], 1e-4) + 0.5, 0.0, 1.0)

            w = pos.astype(jnp.float32) / jnp.clip(pos.sum().astype(jnp.float32), 1.0)
            one_hot = jax.nn.one_hot(jnp.clip(labels, 0), self.num_class + 1)[..., 1:]
            neg = labels == 0
            cw = (pos | neg).astype(jnp.float32) / jnp.clip(
                pos.sum().astype(jnp.float32), 1.0)
            cls_loss = loss_utils.SigmoidFocalClassificationLoss(0.25, 2.0)(
                cls_preds, one_hot, weights=cw).sum()
            bce = -(part_labels * jnp.log(jnp.clip(jax.nn.sigmoid(part_preds), 1e-7))
                    + (1 - part_labels) * jnp.log(
                        jnp.clip(1 - jax.nn.sigmoid(part_preds), 1e-7)))
            part_loss = (bce.sum(-1) * w).sum()
            lw = cfg.LOSS_CONFIG.LOSS_WEIGHTS
            loss = cls_loss * lw.get("point_cls_weight", 1.0) \
                + part_loss * lw.get("point_part_weight", 1.0)
            batch_dict["loss_point"] = loss
            batch_dict.setdefault("tb_dict", {}).update(
                {"point_cls_loss": cls_loss, "point_part_loss": part_loss})
        return batch_dict
