"""2D BEV backbones.

``SSTBEVBackbone`` mirrors the reference
pcdet/models/backbones_2d/sst_bev_backbone.py: a plain conv stack with an
additive shortcut over selected layers.  ``BaseBEVBackbone`` mirrors
pcdet/models/backbones_2d/base_bev_backbone.py: multi-scale conv blocks with
deconv upsampling and concat fusion.  Both operate on NHWC dense maps —
pure MXU work, no masking needed (the reference's versions are dense too).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...config import as_easy
from ..model_utils.blocks import MaskedBatchNorm, kaiming_conv_init


class SSTBEVBackbone(nn.Module):
    model_cfg: Any
    input_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_dict, train: bool = True):
        x = batch_dict["spatial_features"].astype(self.dtype)
        cfgd = as_easy(self.model_cfg)
        conv_kwargs = cfgd.get("CONV_KWARGS", [])
        shortcut_idx = set(cfgd.get("CONV_SHORTCUT", []))
        num_filter = int(cfgd.get("NUM_FILTER", x.shape[-1]))

        for i, ck in enumerate(conv_kwargs):
            out_ch = int(ck["out_channels"])
            k = int(ck["kernel_size"])
            d = int(ck.get("dilation", 1))
            s = int(ck.get("stride", 1))
            p = int(ck.get("padding", d * (k // 2)))
            y = nn.Conv(
                out_ch, (k, k), strides=(s, s), kernel_dilation=(d, d),
                padding=((p, p), (p, p)), use_bias=False, dtype=self.dtype,
                kernel_init=kaiming_conv_init(), name=f"conv_{i}",
            )(x)
            y = MaskedBatchNorm(dtype=self.dtype, name=f"bn_{i}")(
                y, use_running_average=not train
            )
            y = nn.relu(y)
            # per-layer residual when shapes agree (reference
            # sst_bev_backbone.py:36-40)
            if i in shortcut_idx and y.shape == x.shape:
                x = y + x
            else:
                x = y

        batch_dict["spatial_features_2d"] = x
        return batch_dict

    @property
    def num_bev_features(self):
        cfgd = as_easy(self.model_cfg)
        conv_kwargs = cfgd.get("CONV_KWARGS", [])
        if conv_kwargs:
            return int(conv_kwargs[-1]["out_channels"])
        return int(cfgd.get("NUM_FILTER", self.input_channels))


class BaseBEVBackbone(nn.Module):
    """Reference base_bev_backbone.py:6-112 — LAYER_NUMS conv blocks with
    stride LAYER_STRIDES, deconv upsample UPSAMPLE_STRIDES, concat."""

    model_cfg: Any
    input_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_dict, train: bool = True):
        x = batch_dict["spatial_features"].astype(self.dtype)
        cfg = as_easy(self.model_cfg)
        layer_nums = [int(v) for v in cfg.get("LAYER_NUMS", [])]
        strides = [int(v) for v in cfg.get("LAYER_STRIDES", [])]
        filters = [int(v) for v in cfg.get("NUM_FILTERS", [])]
        up_strides = [int(v) for v in cfg.get("UPSAMPLE_STRIDES", [])]
        up_filters = [int(v) for v in cfg.get("NUM_UPSAMPLE_FILTERS", [])]

        ups = []
        for i, n in enumerate(layer_nums):
            for j in range(n + 1):
                s = strides[i] if j == 0 else 1
                x = nn.Conv(filters[i], (3, 3), strides=(s, s), padding="SAME",
                            use_bias=False, dtype=self.dtype,
                            kernel_init=kaiming_conv_init(),
                            name=f"block{i}_conv{j}")(x)
                x = MaskedBatchNorm(dtype=self.dtype, name=f"block{i}_bn{j}")(
                    x, use_running_average=not train)
                x = nn.relu(x)
            if i < len(up_strides):
                us = up_strides[i]
                if us >= 1:
                    # ConvTranspose(kernel=stride=s) == 1x1 conv to s^2*nf
                    # channels + depth-to-space: same function space, but
                    # the matmul/BN/ReLU run at low resolution and XLA's
                    # transposed-conv lowering is avoided (see DeconvFuse)
                    b, h, w, _ = x.shape
                    nf = up_filters[i]
                    y = nn.Conv(us * us * nf, (1, 1), use_bias=False,
                                dtype=self.dtype, name=f"deblock_{i}")(x)
                    y = y.reshape(b, h, w, us * us, nf)
                    y = MaskedBatchNorm(dtype=self.dtype, name=f"deblock_bn_{i}")(
                        y, use_running_average=not train)
                    y = nn.relu(y)
                    y = y.reshape(b, h, w, us, us, nf)
                    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
                        b, h * us, w * us, nf)
                else:
                    ds = int(round(1 / us))
                    y = nn.Conv(up_filters[i], (ds, ds), strides=(ds, ds),
                                use_bias=False, dtype=self.dtype,
                                name=f"deblock_{i}")(x)
                    y = MaskedBatchNorm(dtype=self.dtype, name=f"deblock_bn_{i}")(
                        y, use_running_average=not train)
                    y = nn.relu(y)
                ups.append(y)
        if len(ups) > 1:
            x = jnp.concatenate(ups, axis=-1)
        elif len(ups) == 1:
            x = ups[0]

        batch_dict["spatial_features_2d"] = x
        return batch_dict

    @property
    def num_bev_features(self):
        cfg = as_easy(self.model_cfg)
        up_filters = [int(v) for v in cfg.get("NUM_UPSAMPLE_FILTERS", [])]
        if up_filters:
            return sum(up_filters)
        filters = [int(v) for v in cfg.get("NUM_FILTERS", [])]
        return filters[-1] if filters else self.input_channels
