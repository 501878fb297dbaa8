"""VoteNet-style point head with bin-based box coding (3DSSD/SASA family).

TPU-native counterpart of reference
pcdet/models/dense_heads/point_head_vote.py + point_head_template.py
``assign_stack_targets``: points live on padded (B, N, ...) arrays with
validity masks, the per-sample target-assignment loop becomes a vmapped
points-in-box test, and all fg-indexed reductions become masked sums.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import as_easy
from ...utils import box_coder_utils, box_utils, common_utils, loss_utils
from ..backbones_3d.pointnet2_backbone import SAModuleMSG, SharedMLP
from ..model_utils.blocks import MaskedBatchNorm


def assign_point_targets(points, point_valid, gt_boxes, num_class,
                         box_coder=None, extend_width=None,
                         set_ignore_flag=False, use_ball_constraint=False,
                         central_radius=2.0):
    """Vectorized reference assign_stack_targets (point_head_template.py:52-157)
    for padded (B, N, 3) points.

    Returns dict of (B, N) cls labels (-1 ignored / 0 bg / c fg), the matched
    gt box per point (B, N, C), fg mask, and optional encoded box labels.
    """
    gt_valid = jnp.any(jnp.abs(gt_boxes) > 1e-6, axis=-1)

    def per_sample(pts, pv, gt, gv):
        idx = box_utils.points_in_boxes_first_idx(pts, gt[:, :7], gv)
        fg = (idx >= 0) & pv
        safe = jnp.clip(idx, 0)
        matched = gt[safe]
        labels = jnp.zeros(pts.shape[0], jnp.int32)
        ignore = jnp.zeros(pts.shape[0], bool)
        if extend_width is not None and set_ignore_flag:
            ext = box_utils.enlarge_box3d(gt[:, :7], extend_width)
            ext_idx = box_utils.points_in_boxes_first_idx(pts, ext, gv)
            ignore = (~fg) & (ext_idx >= 0) & pv
        if use_ball_constraint:
            d = jnp.linalg.norm(matched[:, :3] - pts, axis=-1)
            ball = d < central_radius
            ignore = fg & (~ball)
            fg = fg & ball
        cls = jnp.where(
            fg, 1 if num_class == 1 else matched[:, -1].astype(jnp.int32), 0)
        cls = jnp.where(ignore, -1, cls)
        return cls, matched, fg, safe

    cls, matched, fg, idx = jax.vmap(per_sample)(
        points, point_valid, gt_boxes, gt_valid)
    out = {"cls_labels": cls, "gt_box_of_points": matched, "fg_mask": fg,
           "gt_idx": idx}
    if box_coder is not None:
        b, n = fg.shape
        flat_pts = points.reshape(-1, 3)
        flat_gt = matched.reshape(-1, matched.shape[-1])
        enc = box_coder.encode(
            flat_gt[:, :7], flat_pts, flat_gt[:, -1].astype(jnp.int32))
        out["box_labels"] = (enc.reshape(b, n, -1)
                             * fg.reshape(b, n, 1).astype(enc.dtype))
    return out


class PointHeadVote(nn.Module):
    """Reference PointHeadVote: vote offsets from seeds, SA aggregation at
    votes, cls/box heads, aux/seed/vote losses."""

    model_cfg: Any
    input_channels: int
    num_class: int
    class_names: Sequence[str] = ()
    grid_size: Tuple[int, int] = (1, 1)
    point_cloud_range: Tuple[float, ...] = ()
    predict_boxes_when_training: bool = False
    dtype: Any = jnp.float32

    def _coder(self):
        cfg = as_easy(self.model_cfg).TARGET_CONFIG
        return getattr(box_coder_utils, cfg.BOX_CODER)(**cfg.BOX_CODER_CONFIG)

    @nn.compact
    def __call__(self, batch_dict, train: bool = True):
        cfg = as_easy(self.model_cfg)
        coder = self._coder()
        point_coords = batch_dict["point_coords"]  # (B, N, 3)
        point_feats = batch_dict["point_features"]  # (B, N, C)
        point_valid = batch_dict.get(
            "point_valid", jnp.ones(point_coords.shape[:2], bool))

        lo, hi = [int(v) for v in cfg.VOTE_CONFIG.SAMPLE_RANGE]
        seeds = point_coords[:, lo:hi]
        seed_feats = point_feats[:, lo:hi]
        seed_valid = point_valid[:, lo:hi]

        x = seed_feats
        for i, c in enumerate(cfg.VOTE_CONFIG.MLPS):
            x = nn.Dense(int(c), use_bias=False, dtype=self.dtype,
                         name=f"vote_fc{i}")(x)
            # all point_head_vote fc stacks use torch-default BatchNorm1d
            # (reference point_head_template.make_fc_layers:42)
            x = MaskedBatchNorm(eps=1e-5, momentum=0.1, dtype=self.dtype,
                                name=f"vote_bn{i}")(
                x, mask=seed_valid, use_running_average=not train)
            x = nn.relu(x)
        offsets = nn.Dense(3, dtype=jnp.float32, name="vote_out")(x)
        rng = jnp.asarray(cfg.VOTE_CONFIG.VOTE_XYZ_RANGE, jnp.float32)
        offsets = jnp.clip(offsets, -rng, rng)
        votes = seeds + offsets  # (B, K, 3)

        # SA aggregation at vote centers over ALL input points
        _, vote_feats, _ = self._vote_sa(
            cfg.VOTE_SA_CONFIG, point_coords, point_feats, point_valid,
            votes, seed_valid, train)

        y = vote_feats
        for i, c in enumerate(cfg.SHARED_FC):
            y = nn.Dense(int(c), use_bias=False, dtype=self.dtype,
                         name=f"shared_fc{i}")(y)
            y = MaskedBatchNorm(eps=1e-5, momentum=0.1, dtype=self.dtype,
                                name=f"shared_bn{i}")(
                y, mask=seed_valid, use_running_average=not train)
            y = nn.relu(y)

        def head(tag, fcs, out_ch):
            h = y
            for i, c in enumerate(fcs):
                h = nn.Dense(int(c), use_bias=False, dtype=self.dtype,
                             name=f"{tag}_fc{i}")(h)
                h = MaskedBatchNorm(eps=1e-5, momentum=0.1, dtype=self.dtype,
                                    name=f"{tag}_bn{i}")(
                    h, mask=seed_valid, use_running_average=not train)
                h = nn.relu(h)
            return nn.Dense(out_ch, dtype=jnp.float32, name=f"{tag}_out")(h)

        vote_cls_preds = head("cls", cfg.CLS_FC, self.num_class)  # (B, K, nc)
        vote_box_preds = head("box", cfg.REG_FC, coder.code_size)

        if train:
            loss, tb = self._get_loss(
                cfg, coder, batch_dict, votes, seeds, seed_valid,
                vote_cls_preds, vote_box_preds)
            batch_dict["loss_point"] = loss
            batch_dict.setdefault("tb_dict", {}).update(tb)

        if (not train) or self.predict_boxes_when_training or \
                cfg.LOSS_CONFIG.get("PREDICT_BOXES", False):
            b, k = votes.shape[:2]
            flat_votes = votes.reshape(-1, 3)
            pred_classes = jnp.argmax(
                vote_cls_preds.reshape(-1, self.num_class), axis=-1) + 1
            boxes = coder.decode(
                vote_box_preds.reshape(-1, coder.code_size), flat_votes,
                pred_classes=pred_classes)
            batch_dict["batch_cls_preds"] = vote_cls_preds
            batch_dict["batch_box_preds"] = boxes.reshape(b, k, -1)
            batch_dict["batch_pred_valid"] = seed_valid
            batch_dict["cls_preds_normalized"] = False
        batch_dict["votes"] = votes
        return batch_dict

    def _vote_sa(self, vote_sa, xyz, feats, valid, new_xyz, new_valid, train):
        """SA grouping at given centers (reference vote_SA_module call with
        new_xyz provided)."""
        from ...ops import pointnet as pn

        outs = []
        for gi, (radius, nsample, mlp) in enumerate(
                zip(vote_sa.RADIUS, vote_sa.NSAMPLE, vote_sa.MLPS)):
            idx, cnt = jax.vmap(lambda x, v, q, qv: pn.ball_query(
                float(radius), int(nsample), x, v, q, qv))(
                xyz, valid, new_xyz, new_valid)
            grouped_xyz = jnp.take_along_axis(
                xyz[:, :, None, :], idx[..., None].repeat(3, axis=-1), axis=1)
            grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]
            grouped_f = jnp.take_along_axis(
                feats[:, :, None, :],
                idx[..., None].repeat(feats.shape[-1], axis=-1), axis=1)
            g = jnp.concatenate([grouped_xyz, grouped_f], axis=-1)
            tok_mask = (cnt > 0)[..., None] & jnp.ones_like(idx, bool)
            g = SharedMLP(tuple(int(c) for c in mlp), dtype=self.dtype,
                          name=f"vote_sa_mlp_{gi}")(g, mask=tok_mask, train=train)
            g = g * (cnt > 0)[..., None, None].astype(g.dtype)
            outs.append(jnp.max(g, axis=2))
        return None, jnp.concatenate(outs, axis=-1), None

    # ------------------------------------------------------------------ #
    def _get_loss(self, cfg, coder, batch_dict, votes, seeds, seed_valid,
                  vote_cls_preds, vote_box_preds):
        lw = cfg.LOSS_CONFIG.LOSS_WEIGHTS
        gt_boxes = batch_dict["gt_boxes"]
        b = gt_boxes.shape[0]
        tb = {}

        # vote targets: ball-constrained in-box assignment
        tcfg = cfg.TARGET_CONFIG
        vote_tgt = assign_point_targets(
            votes, seed_valid, gt_boxes, self.num_class, box_coder=coder,
            use_ball_constraint=True,
            central_radius=float(tcfg.get("GT_CENTRAL_RADIUS", 2.0)))

        # seed targets: enlarged boxes
        ext_seed = box_utils.enlarge_box3d(
            gt_boxes.reshape(-1, gt_boxes.shape[-1])[:, :7],
            tcfg.GT_EXTRA_WIDTH).reshape(b, -1, 7)
        ext_gt = jnp.concatenate([ext_seed, gt_boxes[..., 7:]], axis=-1)
        seed_tgt = assign_point_targets(
            seeds, seed_valid, ext_gt, self.num_class)

        # --- seed reg loss: votes should move toward matched gt centers
        fg_seed = seed_tgt["fg_mask"]
        center_lbl = seed_tgt["gt_box_of_points"][..., :3]
        diff = loss_utils.smooth_l1(votes - center_lbl, 1.0 / 9.0).sum(-1)
        denom = jnp.clip(fg_seed.sum(), 1)
        seed_reg_loss = jnp.sum(diff * fg_seed) / denom
        seed_reg_loss = seed_reg_loss * lw["seed_reg_weight_list"][0]
        tb["seed_reg_loss_0"] = seed_reg_loss

        # --- vote cls loss (with centerness scaling)
        cls_labels = vote_tgt["cls_labels"]
        positives = cls_labels > 0
        negatives = cls_labels == 0
        cls_weights = (positives | negatives).astype(jnp.float32)
        pos_norm = positives.sum().astype(jnp.float32) \
            if cfg.LOSS_CONFIG.get("CLS_POS_NORM", False) else cls_weights.sum()
        cls_weights = cls_weights / jnp.clip(pos_norm, 1.0)
        one_hot = jax.nn.one_hot(
            jnp.clip(cls_labels, 0), self.num_class + 1)[..., 1:]
        if "WithCenterness" in cfg.LOSS_CONFIG.CLS_LOSS:
            ctr = box_utils.generate_centerness_mask(
                jax.lax.stop_gradient(votes).reshape(-1, 3),
                vote_tgt["gt_box_of_points"].reshape(-1, gt_boxes.shape[-1])[:, :7])
            ctr = ctr.reshape(positives.shape) * positives
            one_hot = one_hot * ctr[..., None]
        cls_loss_fn = loss_utils.WeightedBinaryCrossEntropyLoss()
        vote_cls_loss = cls_loss_fn(
            vote_cls_preds, one_hot, weights=cls_weights).sum()
        vote_cls_loss = vote_cls_loss * lw["vote_cls_weight"]
        tb["vote_cls_loss"] = vote_cls_loss

        # --- vote reg loss: xyzlwh smooth-l1 + angle bin ce + bin residual
        fg = positives
        reg_w = fg.astype(jnp.float32) / jnp.clip(fg.sum(), 1.0)
        box_lbl = vote_tgt["box_labels"]
        preds = vote_box_preds
        nbins = coder.angle_bin_num
        l_xyzlwh = (loss_utils.smooth_l1(
            preds[..., :6] - box_lbl[..., :6], 1.0 / 9.0)
            * reg_w[..., None]).sum()
        dir_logits = preds[..., 6:6 + nbins]
        dir_lbl = box_lbl[..., 6:6 + nbins]
        ce = -jax.nn.log_softmax(dir_logits) * dir_lbl
        l_dir_cls = (ce.sum(-1) * reg_w).sum()
        res_preds = (preds[..., 6 + nbins:6 + 2 * nbins] * dir_lbl).sum(-1)
        res_lbl = (box_lbl[..., 6 + nbins:6 + 2 * nbins] * dir_lbl).sum(-1)
        l_dir_res = (loss_utils.smooth_l1(res_preds - res_lbl, 1.0 / 9.0)
                     * reg_w).sum()
        vote_reg_loss = (l_xyzlwh + l_dir_cls + l_dir_res) * lw["vote_reg_weight"]
        tb["vote_reg_loss"] = vote_reg_loss

        # --- corner loss on decoded boxes
        flat_votes = votes.reshape(-1, 3)
        pred_cls_for_decode = jnp.argmax(
            vote_cls_preds.reshape(-1, self.num_class), axis=-1) + 1
        decoded = coder.decode(preds.reshape(-1, coder.code_size), flat_votes,
                               pred_classes=pred_cls_for_decode)
        corner = loss_utils.get_corner_loss_lidar(
            decoded[:, :7],
            vote_tgt["gt_box_of_points"].reshape(-1, gt_boxes.shape[-1])[:, :7],
            p=int(cfg.LOSS_CONFIG.get("CORNER_LOSS_TYPE", 1)))
        fg_flat = fg.reshape(-1)
        corner_loss = jnp.sum(corner * fg_flat) / jnp.clip(fg_flat.sum(), 1)
        corner_loss = corner_loss * lw["vote_corner_weight"]
        tb["vote_corner_loss"] = corner_loss

        # --- aux point cls losses (from SAMSG backbone scores, if present)
        aux_loss = 0.0
        total = (seed_reg_loss + vote_cls_loss + vote_reg_loss + corner_loss
                 + aux_loss)
        return total, tb
