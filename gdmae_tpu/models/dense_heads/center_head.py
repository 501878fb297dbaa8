"""CenterPoint head with optional IoU branch and multi-class rectified NMS.

TPU-native counterpart of reference
pcdet/models/dense_heads/center_head.py: separate per-class-group heads on a
shared conv trunk, gaussian heatmap targets assigned on device
(ops/centernet.assign_single_head — replacing the reference's per-sample
CPU loop at :209-214), focal/L1/IoU losses, and fixed-K heatmap decoding +
NMS (reference model_nms_utils.multi_class_agnostic_nms with IOU_RECTIFIER).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import as_easy
from ...ops import centernet, iou_nms
from ...utils import loss_utils
from ..model_utils.blocks import MaskedBatchNorm


class SeparateHead(nn.Module):
    """Reference SeparateHead (center_head.py:11-45): per-target conv stacks."""

    sep_head_dict: Any
    init_bias: float = -2.19
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        head_dict = as_easy(self.sep_head_dict)
        out = {}
        for name in head_dict:
            oc = int(head_dict[name]["out_channels"])
            nconv = int(head_dict[name]["num_conv"])
            y = x
            for k in range(nconv - 1):
                y = nn.Conv(x.shape[-1], (3, 3), padding="SAME",
                            use_bias=self.use_bias, dtype=self.dtype,
                            name=f"{name}_conv{k}")(y)
                # reference SeparateHead uses torch-default BN eps=1e-5
                # (center_head.py:24), unlike the 1e-3 of the rest
                y = MaskedBatchNorm(eps=1e-5, momentum=0.1, dtype=self.dtype,
                                    name=f"{name}_bn{k}")(
                    y, use_running_average=not train)
                y = nn.relu(y)
            bias_init = (nn.initializers.constant(self.init_bias)
                         if "hm" in name else nn.initializers.zeros)
            y = nn.Conv(oc, (3, 3), padding="SAME", use_bias=True,
                        bias_init=bias_init,
                        kernel_init=nn.initializers.he_normal(),
                        dtype=self.dtype, name=f"{name}_out")(y)
            out[name] = y
        return out


class CenterHead(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int
    class_names: Sequence[str]
    grid_size: Tuple[int, int]  # (nx, ny)
    point_cloud_range: Tuple[float, ...]
    voxel_size: Tuple[float, ...]
    predict_boxes_when_training: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        cfg = as_easy(self.model_cfg)
        self.feature_map_stride = int(
            cfg.TARGET_ASSIGNER_CONFIG.get("FEATURE_MAP_STRIDE", 1))
        names_each_head = []
        id_map_each_head = []
        for names in cfg.CLASS_NAMES_EACH_HEAD:
            kept = [n for n in names if n in self.class_names]
            names_each_head.append(kept)
            id_map_each_head.append(
                np.array([self.class_names.index(n) for n in kept], np.int32))
        self.class_names_each_head = names_each_head
        self.class_id_mapping_each_head = id_map_each_head

        self.shared_conv = nn.Conv(
            int(cfg.SHARED_CONV_CHANNEL), (3, 3), padding="SAME",
            use_bias=bool(cfg.get("USE_BIAS_BEFORE_NORM", False)),
            dtype=self.dtype, name="shared_conv")
        self.shared_bn = MaskedBatchNorm(
            eps=1e-5, momentum=0.1, dtype=self.dtype,
            name="shared_bn")  # ref :78 default

        heads = []
        for idx, names in enumerate(self.class_names_each_head):
            head_dict = dict(cfg.SEPARATE_HEAD_CFG.HEAD_DICT)
            head_dict["hm"] = {"out_channels": len(names),
                               "num_conv": int(cfg.NUM_HM_CONV)}
            heads.append(SeparateHead(
                sep_head_dict=head_dict,
                use_bias=bool(cfg.get("USE_BIAS_BEFORE_NORM", False)),
                dtype=self.dtype, name=f"head_{idx}"))
        self.heads_list = heads
        self.with_iou = "iou" in dict(cfg.SEPARATE_HEAD_CFG.HEAD_DICT)

    # ------------------------------------------------------------------ #
    def assign_targets(self, gt_boxes, hw):
        """gt_boxes: (B, M, C); returns per-head target dicts (batched)."""
        cfg = as_easy(self.model_cfg).TARGET_ASSIGNER_CONFIG
        target_dicts = []
        gt_cls = gt_boxes[..., -1].astype(jnp.int32)  # global 1-based
        gt_valid = jnp.any(jnp.abs(gt_boxes) > 1e-6, axis=-1)
        for names, id_map in zip(self.class_names_each_head,
                                 self.class_id_mapping_each_head):
            # remap global class -> local 1-based; others invalid
            local = jnp.zeros_like(gt_cls)
            for li, gi in enumerate(id_map):
                local = jnp.where(gt_cls == gi + 1, li + 1, local)
            valid = gt_valid & (local > 0)
            boxes_local = jnp.concatenate(
                [gt_boxes[..., :-1], local[..., None].astype(gt_boxes.dtype)],
                axis=-1)

            assign = jax.vmap(
                lambda b, v: centernet.assign_single_head(
                    b, v, len(names), hw, self.voxel_size,
                    self.point_cloud_range, self.feature_map_stride,
                    gaussian_overlap=float(cfg.GAUSSIAN_OVERLAP),
                    min_radius=int(cfg.MIN_RADIUS)))
            target_dicts.append(assign(boxes_local, valid))
        return target_dicts

    def get_loss(self, pred_dicts, target_dicts):
        cfg = as_easy(self.model_cfg)
        lw = cfg.LOSS_CONFIG.LOSS_WEIGHTS
        head_order = list(cfg.SEPARATE_HEAD_CFG.HEAD_ORDER)
        total = 0.0
        tb = {}
        for idx, (pred, tgt) in enumerate(zip(pred_dicts, target_dicts)):
            hm = jnp.clip(jax.nn.sigmoid(pred["hm"].astype(jnp.float32)),
                          1e-4, 1 - 1e-4)
            hm_t = tgt["heatmap"].transpose(0, 2, 3, 1)  # to NHWC
            hm_loss = loss_utils.neg_loss_cornernet(
                hm.transpose(0, 3, 1, 2), hm_t.transpose(0, 3, 1, 2))
            hm_loss = hm_loss * lw["cls_weight"]

            pred_boxes = jnp.concatenate(
                [pred[h].astype(jnp.float32) for h in head_order], axis=-1)
            b, h, w, c = pred_boxes.shape
            flat = pred_boxes.reshape(b, h * w, c)
            picked = jnp.take_along_axis(flat, tgt["inds"][..., None], axis=1)
            reg_loss = loss_utils.reg_loss_centernet(
                picked, tgt["target_boxes"], tgt["mask"])
            code_w = jnp.asarray(lw["code_weights"], jnp.float32)
            loc_loss = jnp.sum(reg_loss * code_w) * lw["loc_weight"]

            total = total + hm_loss + loc_loss
            tb[f"hm_loss_head_{idx}"] = hm_loss
            tb[f"loc_loss_head_{idx}"] = loc_loss

            if self.with_iou:
                iou_loss = self._iou_loss(pred, tgt, (h, w)) * lw["iou_weight"]
                total = total + iou_loss
                tb[f"iou_loss_head_{idx}"] = iou_loss
        return total, tb

    def _iou_loss(self, pred, tgt, hw):
        """Reference loss_utils.IoULossCenterNet: L1 between predicted iou
        (scaled 2*iou-1) and the true 3D IoU of decoded boxes vs gt."""
        h, w = hw
        center = pred["center"].astype(jnp.float32)
        center_z = pred["center_z"].astype(jnp.float32)
        dim = jnp.exp(jnp.clip(pred["dim"].astype(jnp.float32), -5, 5))
        rot = pred["rot"].astype(jnp.float32)
        angle = jnp.arctan2(rot[..., 1:2], rot[..., 0:1])
        ys = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
        xs = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
        xs = xs + center[..., 0:1]
        ys = ys + center[..., 1:2]
        xs = xs * self.feature_map_stride * self.voxel_size[0] + self.point_cloud_range[0]
        ys = ys * self.feature_map_stride * self.voxel_size[1] + self.point_cloud_range[1]
        boxes = jnp.concatenate([xs, ys, center_z, dim, angle], axis=-1)
        boxes = jax.lax.stop_gradient(boxes)

        b = boxes.shape[0]
        flat = boxes.reshape(b, h * w, 7)
        pred_box = jnp.take_along_axis(flat, tgt["inds"][..., None], axis=1)
        iou_flat = pred["iou"].astype(jnp.float32).reshape(b, h * w, -1)
        iou_pred = jnp.take_along_axis(iou_flat, tgt["inds"][..., None], axis=1)[..., 0]

        def diag_iou(pb, gb):
            return jax.vmap(
                lambda p, g: iou_nms.boxes_iou3d(p[None], g[None])[0, 0]
            )(pb, gb)

        target = jax.vmap(diag_iou)(pred_box, tgt["iou_boxes"])
        target = 2 * target - 1
        mask = tgt["mask"].astype(jnp.float32)
        loss = jnp.sum(jnp.abs(iou_pred - target) * mask)
        return loss / (jnp.sum(mask) + 1e-4)

    # ------------------------------------------------------------------ #
    def generate_predicted_boxes(self, pred_dicts):
        """Decode + NMS; returns fixed-capacity (B, K, ...) predictions."""
        pp = as_easy(self.model_cfg).POST_PROCESSING
        nms_cfg = pp.NMS_CONFIG
        head_order = list(as_easy(self.model_cfg).SEPARATE_HEAD_CFG.HEAD_ORDER)

        all_boxes, all_scores, all_labels, all_valid = [], [], [], []
        for idx, pred in enumerate(pred_dicts):
            hm = jax.nn.sigmoid(pred["hm"].astype(jnp.float32))
            iou_map = None
            if "iou" in pred:
                iou_map = jnp.clip(
                    (pred["iou"].astype(jnp.float32) + 1) * 0.5, 0, 1)
            boxes, scores, class_ids, ious, valid = centernet.decode_bbox_from_heatmap(
                heatmap=hm,
                rot_cos=pred["rot"].astype(jnp.float32)[..., 0:1],
                rot_sin=pred["rot"].astype(jnp.float32)[..., 1:2],
                center=pred["center"].astype(jnp.float32),
                center_z=pred["center_z"].astype(jnp.float32),
                dim=jnp.exp(jnp.clip(pred["dim"].astype(jnp.float32), -5, 5)),
                vel=pred.get("vel"),
                iou=iou_map,
                point_cloud_range=self.point_cloud_range,
                voxel_size=self.voxel_size,
                feature_map_stride=self.feature_map_stride,
                K=int(pp.MAX_OBJ_PER_SAMPLE),
                score_thresh=float(pp.SCORE_THRESH),
                post_center_limit_range=pp.POST_CENTER_LIMIT_RANGE,
            )
            id_map = jnp.asarray(self.class_id_mapping_each_head[idx])
            labels = id_map[class_ids]  # global 0-based

            if nms_cfg.NMS_TYPE == "nms_gpu":
                def per_sample(bx, sc, lb, vd):
                    keep_idx, keep_mask, keep_scores = iou_nms.nms_bev(
                        bx[:, :7], sc, float(nms_cfg.NMS_THRESH),
                        int(nms_cfg.NMS_PRE_MAXSIZE),
                        int(nms_cfg.NMS_POST_MAXSIZE), valid=vd)
                    safe = jnp.clip(keep_idx, 0)
                    return bx[safe], keep_scores, lb[safe], keep_mask

                fb, fs, fl, fv = jax.vmap(per_sample)(boxes, scores, labels, valid)
            elif nms_cfg.NMS_TYPE == "multi_class_nms":
                fb, fs, fl, fv = self._multi_class_nms(
                    boxes, scores, ious, labels, valid, nms_cfg)
            else:
                raise NotImplementedError(nms_cfg.NMS_TYPE)
            all_boxes.append(fb)
            all_scores.append(fs)
            all_labels.append(fl)
            all_valid.append(fv)

        boxes = jnp.concatenate(all_boxes, axis=1)
        scores = jnp.concatenate(all_scores, axis=1)
        labels = jnp.concatenate(all_labels, axis=1) + 1  # 1-based
        valid = jnp.concatenate(all_valid, axis=1)
        return boxes, scores, labels, valid

    def _multi_class_nms(self, boxes, scores, ious, labels, valid, nms_cfg):
        """Reference model_nms_utils.multi_class_agnostic_nms (:28-46):
        IoU-rectified scores, per-class thresholds, fixed per-class caps."""
        rect = jnp.asarray(nms_cfg.IOU_RECTIFIER, jnp.float32)[labels]
        rect_scores = jnp.power(jnp.maximum(scores, 1e-9), 1 - rect) * \
            jnp.power(jnp.maximum(ious, 1e-9), rect)
        n_cls = len(nms_cfg.NMS_THRESH)
        outs = []
        for cls in range(n_cls):
            def per_sample(bx, sc, lb, vd):
                cls_valid = vd & (lb == cls)
                keep_idx, keep_mask, keep_scores = iou_nms.nms_bev(
                    bx[:, :7], sc, float(nms_cfg.NMS_THRESH[cls]),
                    int(nms_cfg.NMS_PRE_MAXSIZE[cls]),
                    int(nms_cfg.NMS_POST_MAXSIZE[cls]), valid=cls_valid)
                safe = jnp.clip(keep_idx, 0)
                return bx[safe], keep_scores, lb[safe], keep_mask

            outs.append(jax.vmap(per_sample)(boxes, rect_scores, labels, valid))
        fb = jnp.concatenate([o[0] for o in outs], axis=1)
        fs = jnp.concatenate([o[1] for o in outs], axis=1)
        fl = jnp.concatenate([o[2] for o in outs], axis=1)
        fv = jnp.concatenate([o[3] for o in outs], axis=1)
        return fb, fs, fl, fv

    # ------------------------------------------------------------------ #
    @nn.compact
    def __call__(self, batch_dict, train: bool = True):
        x = batch_dict["spatial_features_2d"]
        y = self.shared_conv(x)
        y = self.shared_bn(y, use_running_average=not train)
        y = nn.relu(y)

        pred_dicts = [head(y, train=train) for head in self.heads_list]

        if train:
            hw = (x.shape[1], x.shape[2])
            target_dicts = self.assign_targets(batch_dict["gt_boxes"], hw)
            loss, tb = self.get_loss(pred_dicts, target_dicts)
            batch_dict["loss_rpn"] = loss
            batch_dict.setdefault("tb_dict", {}).update(tb)

        if not train or self.predict_boxes_when_training:
            boxes, scores, labels, valid = self.generate_predicted_boxes(pred_dicts)
            if self.predict_boxes_when_training:
                batch_dict["rois"] = boxes
                batch_dict["roi_scores"] = scores
                batch_dict["roi_labels"] = labels
                batch_dict["roi_valid"] = valid
                batch_dict["has_class_labels"] = True
            else:
                batch_dict["final_boxes"] = boxes[..., :7] * valid[..., None]
                batch_dict["final_scores"] = scores * valid
                batch_dict["final_labels"] = labels * valid
                batch_dict["final_valid"] = valid
                batch_dict["cls_preds_normalized"] = True
        return batch_dict
