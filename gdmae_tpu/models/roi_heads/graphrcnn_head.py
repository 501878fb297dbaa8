"""Graph R-CNN refinement head: DFVS RoI point pooling + attentive KNN-graph
(EdgeConv) refinement.

TPU-native counterpart of reference
pcdet/models/roi_heads/graphrcnn_head.py: the ``patch_ops_cuda`` DVS+FPS
point sampler becomes ops/pointnet.dvs_fps_sample (dense membership test +
sort-based voxel dedup + scanned FPS), and the AttnGNN layer is plain
batched dense compute (pairwise-distance kNN over 256 points per RoI).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import as_easy
from ...ops import pointnet
from ...utils import common_utils
from ..fusion_layers.point_sample import PointSample
from ..model_utils.blocks import MaskedBatchNorm
from .roi_head_template import RoIHeadTemplate


class AttnGNNLayer(nn.Module):
    """Reference AttnGNNLayer (graphrcnn_head.py:42-126): EdgeConv stack over
    a kNN graph, channel-calibration sigmoid gate, expansion + maxpool."""

    model_cfg: Any
    input_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, feats, valid, train: bool = True):
        """xyz: (G, K, 3); feats: (G, K, C); valid: (G, K) — G = B*M rois."""
        cfg = as_easy(self.model_cfg)
        k = int(cfg.K)
        g, kpts, _ = xyz.shape

        x = jnp.concatenate([xyz, feats], axis=-1)  # (G, K, 3+C)

        # kNN on coordinates (USE_FEATS_DIS False in all shipped configs)
        def knn_idx(pts, vd):
            d2 = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
            d2 = jnp.where(vd[None, :], d2, 1e10)
            _, idx = jax.lax.top_k(-d2, k)
            return idx

        idx = jax.vmap(knn_idx)(xyz, valid)  # (G, K, k)

        outs = []
        for li, mlp in enumerate([int(m) for m in cfg.MLPS]):
            # neighbor gather as C-contiguous ROW gathers: an index tensor
            # broadcast over the channel dim keeps XLA at row granularity.
            # The earlier per-element form (operand and index both expanded
            # to (G, K, k, C)) lowered to a scalar-granularity gather —
            # ~1.2 s of the Waymo batch-1 two-stage inference (r5 nognn
            # ablation) for what is ~100 MB of actual data movement.
            nbr = jnp.take_along_axis(
                x, idx.reshape(g, kpts * k)[..., None], axis=1
            ).reshape(g, kpts, k, x.shape[-1])
            center = x[:, :, None, :]
            edge = jnp.concatenate([nbr - center, jnp.broadcast_to(center, nbr.shape)],
                                   axis=-1)  # (G, K, k, 2C)
            edge = nn.Dense(mlp, use_bias=False, dtype=self.dtype,
                            name=f"edge_{li}")(edge)
            edge = MaskedBatchNorm(eps=1e-5, momentum=0.1, dtype=self.dtype, name=f"edge_bn_{li}")(
                edge, mask=valid[:, :, None] & jnp.ones_like(edge[..., 0], bool),
                use_running_average=not train)
            edge = nn.relu(edge)
            x = jnp.max(edge, axis=2)  # (G, K, mlp)
            x = x * valid[..., None].astype(x.dtype)
            outs.append(x)
        x = jnp.concatenate(outs, axis=-1)  # (G, K, sum(mlps))

        # channel calibration gate
        calib = nn.Dense(int(cfg.CALIB_DIM), use_bias=False, dtype=self.dtype,
                         name="calib_fc1")(x)
        calib = MaskedBatchNorm(eps=1e-5, momentum=0.1, dtype=self.dtype, name="calib_bn")(
            calib, mask=valid, use_running_average=not train)
        calib = nn.relu(calib)
        calib = nn.Dense(x.shape[-1], dtype=self.dtype, name="calib_fc2")(calib)
        x = jax.nn.sigmoid(calib) * x

        # expansion + max-pool over points
        for ei, ch in enumerate([int(m) for m in cfg.EXP_MLPS]):
            x = nn.Dense(ch, use_bias=False, dtype=self.dtype, name=f"exp_{ei}")(x)
            x = MaskedBatchNorm(eps=1e-5, momentum=0.1, dtype=self.dtype, name=f"exp_bn_{ei}")(
                x, mask=valid, use_running_average=not train)
            x = nn.relu(x)
        x = jnp.max(jnp.where(valid[..., None], x, -1e9), axis=1)  # (G, ch)
        x = jnp.where(jnp.any(valid, axis=1, keepdims=True), x, 0.0)

        if cfg.get("USE_REDUCTION", False):
            x = nn.Dense(int(cfg.OUT_DIM), use_bias=False, dtype=self.dtype,
                         name="reduction")(x)
            x = MaskedBatchNorm(eps=1e-5, momentum=0.1, dtype=self.dtype, name="reduction_bn")(
                x, use_running_average=not train)
            x = nn.relu(x)
        if cfg.get("USE_SHORT_CUT", False):
            # reference ShortcutLayer (dropout 0 at inference; post-norm FFN)
            y = x
            y = MaskedBatchNorm(eps=1e-5, momentum=0.1, dtype=self.dtype, name="sc_bn1")(
                y + y, use_running_average=not train)
            h = nn.Dense(int(cfg.OUT_DIM), dtype=self.dtype, name="sc_fc1")(y)
            h = nn.Dense(int(cfg.OUT_DIM), dtype=self.dtype, name="sc_fc2")(nn.relu(h))
            x = MaskedBatchNorm(eps=1e-5, momentum=0.1, dtype=self.dtype, name="sc_bn2")(
                y + h, use_running_average=not train)
        return x


class GraphRCNNHead(RoIHeadTemplate):
    """Reference GraphRCNNHead (graphrcnn_head.py:129-302) without the image
    branch (IMG_CONFIG adds PointSample fusion — Graph-VoI)."""

    point_cloud_range: Tuple[float, ...] = (0, -40, -3, 70.4, 40, 1)

    @nn.compact
    def __call__(self, batch_dict, train: bool = True):
        cfg = self._cfg()
        dfvs = cfg.DFVS_CONFIG

        nms_cfg = cfg.NMS_CONFIG["TRAIN" if train else "TEST"]
        batch_dict = self.proposal_layer(batch_dict, nms_cfg)
        if train:
            rng = self.make_rng("proposal_sampler")
            targets = self.assign_targets(batch_dict, rng)
            batch_dict["rois"] = targets["rois"]
            batch_dict["roi_labels"] = targets["roi_labels"]
            batch_dict["roi_valid"] = targets["roi_sample_valid"]

        rois = batch_dict["rois"][..., :7]
        b, m = rois.shape[:2]
        points = batch_dict["points"]  # (B, N, C)
        point_mask = batch_dict["point_mask"]

        num_fps = int(dfvs.NUM_FPS_POINTS)
        pool = jax.vmap(
            lambda pts, pm, bx: pointnet.dvs_fps_sample(
                pts[:, :3], pm, bx,
                num_candidates=int(dfvs.NUM_DVS_POINTS),
                num_fps=num_fps,
                lambda_=float(dfvs.LAMBDA), delta=float(dfvs.DELTA),
                pool_extra_width=tuple(dfvs.POOL_EXTRA_WIDTH)))
        idx, cnt = pool(points, point_mask, rois)  # (B, M, K), (B, M)

        # gather point features per roi
        feats = jax.vmap(lambda pts, ix: pts[ix])(points, idx)  # (B, M, K, C)
        pt_valid = (jnp.arange(num_fps)[None, None, :] <
                    jnp.maximum(cnt, 0)[..., None]) & (cnt > 0)[..., None]

        # canonical local coords (reference roipool3d_gpu :229-241)
        local = feats[..., :3] - rois[:, :, None, :3]
        flat_local = local.reshape(b * m, num_fps, 3)
        flat_local = common_utils.rotate_points_along_z(
            flat_local, -rois[..., 6].reshape(-1))
        local = flat_local.reshape(b, m, num_fps, 3)
        corners = jnp.concatenate([-rois[..., 3:6] / 2, rois[..., 3:6] / 2],
                                  axis=-1)  # (B, M, 6)
        extra = jnp.broadcast_to(corners[:, :, None, :], (b, m, num_fps, 6))
        pooled = jnp.concatenate([local, feats[..., 3:], extra], axis=-1)
        pooled = pooled * pt_valid[..., None].astype(pooled.dtype)

        img_cfg = cfg.get("IMG_CONFIG", None)
        if img_cfg is not None:
            img = batch_dict["image_features"]
            for li, ch in enumerate([int(c) for c in img_cfg.MLPS]):
                img = nn.Conv(ch, (1, 1), use_bias=False, dtype=self.dtype,
                              name=f"img_conv{li}")(img)
                img = MaskedBatchNorm(eps=1e-5, momentum=0.1, dtype=self.dtype, name=f"img_bn{li}")(
                    img, use_running_average=not train)
                img = nn.relu(img)
            batch_dict = dict(batch_dict)
            batch_dict["image_features"] = img
            # global (pre-canonical) point coords per roi
            glob = feats[..., :3].reshape(b, m * num_fps, 3)
            batch_dict["sampled_points"] = glob
            img_feats = PointSample(dtype=self.dtype, name="point_sample")(batch_dict)
            img_feats = img_feats.reshape(b, m, num_fps, -1)
            pooled = jnp.concatenate(
                [pooled, img_feats * pt_valid[..., None].astype(img_feats.dtype)],
                axis=-1)

        g = b * m
        gnn_cfg = dict(cfg.ATTN_GNN_CONFIG)
        in_dim = int(gnn_cfg.pop("IN_DIM"))
        pooled_flat = pooled.reshape(g, num_fps, -1)
        xyz = pooled_flat[..., :3]
        pfeats = pooled_flat[..., 3:]
        pooled_features = AttnGNNLayer(
            model_cfg=gnn_cfg, input_channels=in_dim, dtype=self.dtype,
            name="attn_gnn")(xyz, pfeats, pt_valid.reshape(g, num_fps),
                             train=train)  # (G, OUT)

        shared = nn.Dense(256, use_bias=False, dtype=self.dtype, name="shared_fc")(
            pooled_features)
        shared = MaskedBatchNorm(eps=1e-5, momentum=0.1, dtype=self.dtype, name="shared_bn")(
            shared, use_running_average=not train)
        shared = nn.relu(shared)

        rcnn_cls = nn.Dense(self.num_class, dtype=self.dtype, name="cls_layer")(shared)
        coder = self._box_coder()
        rcnn_reg = nn.Dense(
            coder.code_size, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001), name="reg_layer")(shared)

        if train:
            targets["rcnn_cls"] = rcnn_cls
            targets["rcnn_reg"] = rcnn_reg
            loss, tb = self.get_loss(targets)
            batch_dict["loss_rcnn"] = loss
            batch_dict.setdefault("tb_dict", {}).update(tb)
        else:
            batch_cls, batch_box = self.generate_predicted_boxes(
                rois, rcnn_cls, rcnn_reg)
            roi_scores = batch_dict["roi_scores"]
            if not batch_dict.get("cls_preds_normalized", False):
                roi_scores = jax.nn.sigmoid(roi_scores)
            fused = jnp.sqrt(jnp.clip(jax.nn.sigmoid(batch_cls[..., 0]), 1e-9)) * \
                jnp.sqrt(jnp.clip(roi_scores, 1e-9))
            batch_dict["batch_cls_preds"] = fused[..., None]
            batch_dict["batch_box_preds"] = batch_box
            batch_dict["cls_preds_normalized"] = True
        return batch_dict
