"""Sparse Pyramid Transformer backbone on a dense BEV canvas.

TPU-native re-design of the reference SPT backbone
(pcdet/models/backbones_3d/spt_backbone.py ``SSTBlockV1`` / ``SPTBackbone``
and pcdet/models/backbones_3d/spt_backbone_mae.py ``SPTBackboneMAE``).

Key mapping (reference -> here):
  * spconv.SparseConvTensor            -> dense (B, Ny, Nx, C) canvas + occupancy
  * spconv2D stride-2 conv_down        -> masked dense conv + dilated occupancy
  * submanifold conv_out               -> masked dense conv (occ unchanged)
  * SSTInputLayer window partition     -> ops.window.build_bucket_plan
  * BasicShiftBlockV2 transformer      -> model_utils.sst_layers.CanvasShiftBlock
  * .dense() + deconv FPN fusion       -> dense ConvTranspose stack (unmasked,
                                          exactly like the reference's dense path)
  * MAE random pillar masking          -> ops.scatter.random_masking on the
                                          pillar list before canvas scatter
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import as_easy
from ...ops import scatter as scatter_ops
from ...ops import window as window_ops
from ...utils import common_utils
from ..model_utils.blocks import ConvBNReLU, MaskedBatchNorm, dilate_occupancy
from ..model_utils.sst_layers import CanvasShiftBlock


def scatter_pillars_to_canvas(pillar_features, pillar_coords, pillar_mask, grid_hw):
    """(B, M, C) pillar list -> (B, Ny, Nx, C) canvas + (B, Ny, Nx) occupancy.

    The C-wide feature placement is a gather through an int32 inverse index
    (one narrow scatter builds the index; TPU scatters serialize, gathers
    don't)."""
    b, m, c = pillar_features.shape
    ny, nx = grid_hw
    flat_idx = pillar_coords[..., 0] * nx + pillar_coords[..., 1]  # (B, M)
    flat_idx = jnp.where(pillar_mask, flat_idx, ny * nx)  # trash cell

    def one(feats, idx, mask):
        inv = jnp.full((ny * nx + 1,), m, jnp.int32)
        inv = inv.at[idx].set(jnp.arange(m, dtype=jnp.int32), mode="drop")
        inv = inv.at[ny * nx].set(m)
        inv = inv[:-1]
        occ = inv < m
        feats_pad = jnp.concatenate([feats, jnp.zeros((1, c), feats.dtype)], 0)
        canvas = feats_pad[inv]
        return canvas.reshape(ny, nx, c), occ.reshape(ny, nx)

    return jax.vmap(one)(pillar_features, flat_idx, pillar_mask)


def gather_canvas_at(canvas, coords, grid_hw):
    """canvas (B, Ny, Nx, C) sampled at per-sample (M, 2) [iy, ix] coords."""
    ny, nx = grid_hw
    b, m, _ = coords.shape
    flat = canvas.reshape(b, ny * nx, -1)
    idx = (coords[..., 0] * nx + coords[..., 1]).clip(0, ny * nx - 1)
    return jnp.take_along_axis(flat, idx[..., None], axis=1)


class SSTBlock(nn.Module):
    """One pyramid stage: optional stride-2 down conv, window-transformer
    encoder, residual, submanifold out conv (reference SSTBlockV1,
    spt_backbone.py:197-264)."""

    block_cfg: Any
    grid_hw: Tuple[int, int]  # input grid (Ny, Nx)
    win_caps: Tuple[int, ...]
    remat: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, canvas, occ, train: bool = True):
        blk = as_easy(self.block_cfg)
        enc = blk.ENCODER
        pre = blk.PREPROCESS
        d_model = int(enc.D_MODEL)
        stride = int(enc.STRIDE)
        ny, nx = self.grid_hw

        if stride > 1:
            occ_out = dilate_occupancy(occ, kernel=3, stride=stride)
            canvas = ConvBNReLU(
                d_model, kernel=3, stride=stride, dtype=self.dtype, name="conv_down"
            )(canvas, occ_out=occ_out, train=train)
            occ = occ_out
            ny, nx = occ.shape[1], occ.shape[2]

        window = (int(pre.WINDOW_SHAPE[1]), int(pre.WINDOW_SHAPE[0]))  # (wy, wx)
        drop_specs = window_ops.drop_specs_from_cfg(
            pre.DROP_INFO["train" if train else "test"]
        )
        plans = [
            window_ops.build_bucket_plan(
                occ, (ny, nx), window, shift, drop_specs, self.win_caps
            )
            for shift in ((0, 0), (window[0] // 2, window[1] // 2))
        ]
        # cells covered by both shifts participate in the encoder; others
        # (bucket overflow only) keep their input features, mirroring the
        # reference's token-drop residual (spt_backbone.py:260-262)
        b = occ.shape[0]
        participate = None
        for plan in plans:
            cover = window_ops.covered_mask(plan, b, ny, nx)
            participate = cover if participate is None else (participate & cover)

        x = canvas
        # remat trades ~1 extra forward in the backward pass for O(layers)
        # canvas activations of HBM; disable via TPU_REMAT: false when the
        # batch fits (faster steps)
        shift_block_cls = nn.remat(CanvasShiftBlock, static_argnums=()) \
            if self.remat else CanvasShiftBlock
        for bi in range(int(enc.NUM_BLOCKS)):
            x = shift_block_cls(
                d_model=d_model,
                nhead=int(enc.NHEAD),
                dim_feedforward=int(enc.DIM_FEEDFORWARD),
                window=window,
                pos_temperature=float(pre.POS_TEMPERATURE),
                normalize_pos=bool(pre.NORMALIZE_POS),
                activation=str(enc.ACTIVATION),
                cosine=bool(enc.get("LAYER_CFG", {}).get("cosine", False)),
                tau_min=float(enc.get("LAYER_CFG", {}).get("tau_min", 0.01)),
                dtype=self.dtype,
                name=f"shift_block_{bi}",
            )(x, plans)
        mask = (participate & occ)[..., None].astype(canvas.dtype)
        x = canvas + x * mask
        x = ConvBNReLU(d_model, kernel=3, dtype=self.dtype, name="conv_out")(
            x, occ_out=occ, train=train
        )
        return x, occ


class DeconvFuse(nn.Module):
    """FPN-style deconv fusion of the pyramid to a stride-1 dense map
    (reference SPTBackbone deblocks + conv_out, spt_backbone.py:283-303).
    Dense (unmasked) convs/BN, exactly like the reference's dense path."""

    fuse_cfg: Any  # model_cfg.FUSE_LAYER
    sources: Sequence[str]  # model_cfg.FEATURES_SOURCE
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_maps: Dict[str, jnp.ndarray], train: bool = True):
        ups = []
        total = 0
        fuse_cfg = as_easy(self.fuse_cfg)
        for i, src in enumerate(self.sources):
            cfg = fuse_cfg[src]
            stride = int(cfg.UPSAMPLE_STRIDE)
            nf = int(cfg.NUM_UPSAMPLE_FILTER)
            x = feature_maps[src]
            x = nn.ConvTranspose(
                nf, (stride, stride), strides=(stride, stride), use_bias=False,
                dtype=self.dtype, name=f"deblock_{i}",
            )(x)
            x = MaskedBatchNorm(dtype=self.dtype, name=f"deblock_bn_{i}")(
                x, use_running_average=not train
            )
            ups.append(nn.relu(x))
            total += nf
        out_ch = total // len(ups)
        x = jnp.concatenate(ups, axis=-1)
        x = nn.Conv(out_ch, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv_out")(x)
        x = MaskedBatchNorm(dtype=self.dtype, name="conv_out_bn")(
            x, use_running_average=not train
        )
        return nn.relu(x)


class SPTBackbone(nn.Module):
    """Reference SPTBackbone (spt_backbone.py:267-347): SST pyramid + FPN
    deconv fusion to a dense stride-1 BEV feature map."""

    model_cfg: Any
    input_channels: int
    grid_size: Tuple[int, int]  # (nx, ny)
    voxel_size: Tuple[float, ...]
    point_cloud_range: Tuple[float, ...]
    max_pillars: int
    dtype: Any = jnp.float32

    def block_grids(self):
        """Static (Ny, Nx) per pyramid stage (input grid of each block)."""
        ny, nx = int(self.grid_size[1]), int(self.grid_size[0])
        grids = []
        for blk in as_easy(self.model_cfg).SST_BLOCK_LIST:
            grids.append((ny, nx))
            s = int(blk.ENCODER.STRIDE)
            ny, nx = -(-ny // s), -(-nx // s)
        return grids

    def stage_caps(self, batch_size: int):
        cfg = as_easy(self.model_cfg)
        caps_cfg = cfg.get("TPU_WINDOW_CAPS", None)
        grids = self.block_grids()
        out = []
        for i, blk in enumerate(cfg.SST_BLOCK_LIST):
            if caps_cfg is not None:
                # configured caps are PER-SAMPLE; buckets are global
                out.append(tuple(int(c) * batch_size for c in caps_cfg[i]))
                continue
            s = int(blk.ENCODER.STRIDE)
            ny, nx = grids[i]
            ny, nx = -(-ny // s), -(-nx // s)
            drop_specs = window_ops.drop_specs_from_cfg(blk.PREPROCESS.DROP_INFO["train"])
            window = (int(blk.PREPROCESS.WINDOW_SHAPE[1]), int(blk.PREPROCESS.WINDOW_SHAPE[0]))
            out.append(window_ops.default_win_caps(
                (ny, nx), window, self.max_pillars, drop_specs, batch_size))
        return out

    @nn.compact
    def __call__(self, batch_dict, train: bool = True):
        ny, nx = int(self.grid_size[1]), int(self.grid_size[0])
        b = batch_dict["pillar_features"].shape[0]
        canvas, occ = scatter_pillars_to_canvas(
            batch_dict["pillar_features"].astype(self.dtype),
            batch_dict["pillar_coords"],
            batch_dict["pillar_mask"],
            (ny, nx),
        )

        cfg = as_easy(self.model_cfg)
        grids = self.block_grids()
        caps = self.stage_caps(b)
        feature_maps, occs, strides = {}, {}, {}
        stride = 1
        for i, blk in enumerate(cfg.SST_BLOCK_LIST):
            canvas, occ = SSTBlock(
                block_cfg=blk, grid_hw=grids[i], win_caps=caps[i],
                remat=bool(cfg.get("TPU_REMAT", True)),
                dtype=self.dtype, name=f"sst_block_{i}",
            )(canvas, occ, train=train)
            stride *= int(blk.ENCODER.STRIDE)
            feature_maps[f"x_conv{i+1}"] = canvas
            occs[f"x_conv{i+1}"] = occ
            strides[f"x_conv{i+1}"] = stride

        spatial_features = DeconvFuse(
            fuse_cfg=cfg.FUSE_LAYER,
            sources=cfg.FEATURES_SOURCE,
            dtype=self.dtype, name="fuse",
        )(feature_maps, train=train)

        batch_dict["multi_scale_2d_features"] = feature_maps
        batch_dict["multi_scale_2d_occupancy"] = occs
        batch_dict["multi_scale_2d_strides"] = strides
        batch_dict["spatial_features"] = spatial_features  # (B, Ny, Nx, C)
        batch_dict["spatial_features_stride"] = 1
        return batch_dict

    @property
    def num_point_features(self):
        cfg = as_easy(self.model_cfg)
        total = sum(
            int(cfg.FUSE_LAYER[s].NUM_UPSAMPLE_FILTER)
            for s in cfg.FEATURES_SOURCE
        )
        return total // len(cfg.FEATURES_SOURCE)


class SPTBackboneMAE(nn.Module):
    """Reference SPTBackboneMAE (spt_backbone_mae.py): mask pillars, encode
    the kept ones through the SST pyramid, densify through the generative
    decoder, and regress each pillar's point set (Chamfer loss)."""

    model_cfg: Any
    input_channels: int
    grid_size: Tuple[int, int]
    voxel_size: Tuple[float, ...]
    point_cloud_range: Tuple[float, ...]
    max_pillars: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_dict, train: bool = True):
        cfg = as_easy(self.model_cfg)
        mask_cfg = cfg.get("MASK_CONFIG", None)
        mask_ratio = float(mask_cfg.RATIO) if mask_cfg is not None else 0.0
        num_prd = int(mask_cfg.NUM_PRD_POINTS)
        num_gt = int(mask_cfg.NUM_GT_POINTS)

        pillar_mask = batch_dict["pillar_mask"]  # (B, M)
        b, m = pillar_mask.shape

        # per-sample random masking, ratio as in reference (:96-100)
        rng = self.make_rng("mae_mask")
        keys = jax.random.split(rng, b)
        mae_mask = jax.vmap(
            lambda k, v: scatter_ops.random_masking(k, v, mask_ratio)
        )(keys, pillar_mask)  # 1.0 = masked
        batch_dict["pillar_mae_mask"] = mae_mask

        kept = pillar_mask & (mae_mask == 0.0)

        ny, nx = int(self.grid_size[1]), int(self.grid_size[0])
        canvas, occ = scatter_pillars_to_canvas(
            batch_dict["pillar_features"].astype(self.dtype),
            batch_dict["pillar_coords"],
            kept,
            (ny, nx),
        )

        encoder = SPTBackbone(
            model_cfg=cfg,
            input_channels=self.input_channels,
            grid_size=self.grid_size,
            voxel_size=self.voxel_size,
            point_cloud_range=self.point_cloud_range,
            max_pillars=self.max_pillars,
            dtype=self.dtype,
            name="encoder",
        )
        # run pyramid + generative decoder (deconv fuse) on the kept pillars
        sub_dict = {
            "pillar_features": batch_dict["pillar_features"],
            "pillar_coords": batch_dict["pillar_coords"],
            "pillar_mask": kept,
        }
        sub_dict = encoder(sub_dict, train=train)
        spatial_features = sub_dict["spatial_features"]  # (B, Ny, Nx, C)

        batch_dict["spatial_features"] = spatial_features
        batch_dict["spatial_features_stride"] = 1
        batch_dict["multi_scale_2d_features"] = sub_dict["multi_scale_2d_features"]

        # gather decoded features at ALL pillar coords (masked + visible)
        all_feats = gather_canvas_at(
            spatial_features, batch_dict["pillar_coords"], (ny, nx)
        )  # (B, M, C)

        # per-pillar point-set prediction
        pred = nn.Dense(num_prd * 3, dtype=jnp.float32, name="decoder_pred")(
            all_feats.astype(jnp.float32)
        ).reshape(b, m, num_prd, 3)

        # GT point sets: first NUM_GT_POINTS points of each pillar,
        # wrap-repeated (reference sst_ops group_inner_inds)
        points = batch_dict["points"]
        res = batch_dict["pillarize_result"]
        gt_points = jax.vmap(
            lambda v, r: scatter_ops.group_points_wrap(v, r, num_gt)
        )(points[..., :3], res)  # (B, M, num_gt, 3)

        centers = jnp.stack(
            [
                (batch_dict["pillar_coords"][..., 1].astype(jnp.float32) + 0.5)
                * self.voxel_size[0] + self.point_cloud_range[0],
                (batch_dict["pillar_coords"][..., 0].astype(jnp.float32) + 0.5)
                * self.voxel_size[1] + self.point_cloud_range[1],
                jnp.full((b, m), 0.5 * self.voxel_size[2] + self.point_cloud_range[2],
                         jnp.float32),
            ],
            axis=-1,
        )
        norm_gt = gt_points - centers[:, :, None, :]

        batch_dict["mae_pred_points"] = pred
        batch_dict["mae_gt_points"] = norm_gt
        batch_dict["mae_gt_counts"] = res.pillar_count
        # loss weight: masked AND real pillars (reference weights by
        # voxel_mae_mask, spt_backbone_mae.py:88)
        batch_dict["mae_loss_mask"] = mae_mask * pillar_mask.astype(jnp.float32)
        return batch_dict

    @property
    def num_point_features(self):
        cfg = as_easy(self.model_cfg)
        total = sum(
            int(cfg.FUSE_LAYER[s].NUM_UPSAMPLE_FILTER)
            for s in cfg.FEATURES_SOURCE
        )
        return total // len(cfg.FEATURES_SOURCE)
