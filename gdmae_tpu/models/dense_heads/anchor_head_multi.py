"""Grouped multi-head anchor head (reference
pcdet/models/dense_heads/anchor_head_multi.py — registered in the reference
zoo; not used by any shipped GD-MAE config).

Each RPN head covers a subset of classes (RPN_HEAD_CFGS[*].HEAD_CLS_NAME)
with its own conv stack; target assignment and losses reuse the
AnchorHeadSingle machinery with the per-class anchors restricted to the
head's classes.
"""
from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import as_easy
from ..model_utils.blocks import MaskedBatchNorm
from .anchor_head import AnchorHeadSingle


class AnchorHeadMulti(AnchorHeadSingle):
    """Multi-head variant: shared 3x3 conv trunk, then one (cls, box, dir)
    conv group per RPN head.  The anchor/target/loss layout is identical to
    AnchorHeadSingle (class-major per location), so the template's
    assign_targets/get_loss apply unchanged; only the prediction convs are
    grouped."""

    def setup(self):
        super().setup()
        cfg = as_easy(self.model_cfg)
        self.shared_filters = int(cfg.get("SHARED_CONV_NUM_FILTER", 0))
        self.rpn_head_cfgs = [dict(c) for c in cfg.get("RPN_HEAD_CFGS", [])]

    def __call__(self, batch_dict, train: bool = True):
        cfg = as_easy(self.model_cfg)
        x = batch_dict["spatial_features_2d"]
        if self.shared_filters:
            x = nn.Conv(self.shared_filters, (3, 3), padding="SAME",
                        use_bias=False, dtype=self.dtype, name="shared_conv")(x)
            x = MaskedBatchNorm(dtype=self.dtype, name="shared_bn")(
                x, use_running_average=not train)
            x = nn.relu(x)

        # per-head conv groups; concatenated in global class order
        cls_list, box_list, dir_list = [], [], []
        code = self.box_coder.code_size
        cls_idx = 0
        for hi, head_cfg in enumerate(self.rpn_head_cfgs or
                                      [{"HEAD_CLS_NAME": list(self.class_names)}]):
            names = head_cfg["HEAD_CLS_NAME"]
            n_cls = len(names)
            n_anchor = sum(
                self.anchors_per_class[self.anchor_class_names.index(n)].shape[2]
                for n in names)
            y = x
            for li in range(int(cfg.get("NUM_MIDDLE_CONV", 0))):
                y = nn.Conv(int(cfg.get("NUM_MIDDLE_FILTER", x.shape[-1])),
                            (3, 3), padding="SAME", use_bias=False,
                            dtype=self.dtype, name=f"head{hi}_mid{li}")(y)
                # reference anchor_head_multi.py:35,56: torch-default BN2d
                y = MaskedBatchNorm(eps=1e-5, momentum=0.1, dtype=self.dtype,
                                    name=f"head{hi}_mid_bn{li}")(
                    y, use_running_average=not train)
                y = nn.relu(y)
            cls_list.append(nn.Conv(
                n_anchor * n_cls, (1, 1), dtype=self.dtype,
                bias_init=nn.initializers.constant(-math.log((1 - 0.01) / 0.01)),
                name=f"head{hi}_cls")(y))
            box_list.append(nn.Conv(
                n_anchor * code, (1, 1), dtype=self.dtype,
                kernel_init=nn.initializers.normal(0.001),
                name=f"head{hi}_box")(y))
            if self.use_dir:
                dir_list.append(nn.Conv(
                    n_anchor * int(cfg.NUM_DIR_BINS), (1, 1), dtype=self.dtype,
                    name=f"head{hi}_dir")(y))
            cls_idx += n_cls

        cls_preds = jnp.concatenate(cls_list, axis=-1)
        box_preds = jnp.concatenate(box_list, axis=-1)
        ret = {"cls_preds": cls_preds, "box_preds": box_preds}
        if self.use_dir:
            ret["dir_cls_preds"] = jnp.concatenate(dir_list, axis=-1)

        if train:
            ret.update(self.assign_targets(batch_dict["gt_boxes"]))
            loss, tb = self.get_loss(ret)
            batch_dict["loss_rpn"] = loss
            batch_dict.setdefault("tb_dict", {}).update(tb)
        if not train or self.predict_boxes_when_training:
            batch_cls, batch_box = self.generate_predicted_boxes(
                cls_preds, box_preds, ret.get("dir_cls_preds"))
            batch_dict["batch_cls_preds"] = batch_cls
            batch_dict["batch_box_preds"] = batch_box
            batch_dict["cls_preds_normalized"] = False
        batch_dict["dense_head_ret"] = ret
        return batch_dict
