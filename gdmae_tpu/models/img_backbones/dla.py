"""DLA-34 image backbone with deformable-conv upsampling (DLASeg).

TPU-native counterpart of reference pcdet/models/img_backbones/dla.py
(DLA-34 tree + DLAUp/IDAUp with DCNv2), used by the Graph-VoI camera branch
(cfgs/kitti_models/graph_rcnn_voi.yaml).  Deformable conv runs via
ops/deform_conv (bilinear gather + MXU matmul).  ImageNet-pretrained
torchvision weights are not fetchable in this environment; weights
initialize randomly — load them via checkpoint partial-restore when
available.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import as_easy
from ...ops.deform_conv import modulated_deform_conv2d
from ..model_utils.blocks import MaskedBatchNorm


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        # torch symmetric padding k//2 (SAME misaligns stride-2 on even
        # sizes; reference dla.py convs all use padding=k//2)
        pd = self.dilation * (self.kernel // 2)
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=((pd, pd), (pd, pd)), use_bias=False,
                    dtype=self.dtype)(x)
        x = MaskedBatchNorm(eps=1e-5, momentum=0.1, dtype=self.dtype)(
            x, use_running_average=not train)
        return nn.relu(x) if self.relu else x


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train=True):
        if residual is None:
            residual = x
        y = ConvBN(self.planes, 3, self.stride, self.dilation,
                   dtype=self.dtype, name="conv1")(x, train)
        y = ConvBN(self.planes, 3, 1, self.dilation, relu=False,
                   dtype=self.dtype, name="conv2")(y, train)
        return nn.relu(y + residual)


class Root(nn.Module):
    out_channels: int
    kernel: int = 1
    residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, *children, train=True):
        x = jnp.concatenate(children, axis=-1)
        x = ConvBN(self.out_channels, self.kernel, relu=False,
                   dtype=self.dtype, name="conv")(x, train)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    levels: int
    in_channels: int
    out_channels: int
    stride: int = 1
    level_root: bool = False
    root_dim: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, children=None, train=True):
        children = [] if children is None else children
        root_dim = self.root_dim or 2 * self.out_channels
        if self.level_root:
            root_dim += self.in_channels

        bottom = nn.max_pool(x, (self.stride, self.stride),
                             strides=(self.stride, self.stride)) \
            if self.stride > 1 else x
        if self.in_channels != self.out_channels:
            proj = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                           dtype=self.dtype, name="project")(bottom)
            proj = MaskedBatchNorm(eps=1e-5, momentum=0.1, dtype=self.dtype,
                                  name="project_bn")(
                proj, use_running_average=not train)
            residual = proj
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = BasicBlock(self.out_channels, self.stride, dtype=self.dtype,
                            name="tree1")(x, residual, train)
            x2 = BasicBlock(self.out_channels, 1, dtype=self.dtype,
                            name="tree2")(x1, None, train)
            return Root(self.out_channels, dtype=self.dtype, name="root")(
                x2, x1, *children, train=train)
        x1 = Tree(self.levels - 1, self.in_channels, self.out_channels,
                  self.stride, dtype=self.dtype, name="tree1")(
            x, residual, None, train)
        children.append(x1)
        return Tree(self.levels - 1, self.out_channels, self.out_channels,
                    root_dim=root_dim + self.out_channels, dtype=self.dtype,
                    name="tree2")(x1, None, children, train)


DLA34_LEVELS = (1, 1, 1, 2, 2, 1)
DLA34_CHANNELS = (16, 32, 64, 128, 256, 512)


class DLA(nn.Module):
    levels: Tuple[int, ...] = DLA34_LEVELS
    channels: Tuple[int, ...] = DLA34_CHANNELS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        ch = self.channels
        y = ConvBN(ch[0], 7, 1, dtype=self.dtype, name="base_layer")(x, train)
        outs = []
        y = ConvBN(ch[0], 3, 1, dtype=self.dtype, name="level0")(y, train)
        outs.append(y)
        y = ConvBN(ch[1], 3, 2, dtype=self.dtype, name="level1")(y, train)
        outs.append(y)
        y = Tree(self.levels[2], ch[1], ch[2], 2, level_root=False,
                 dtype=self.dtype, name="level2")(y, train=train)
        outs.append(y)
        y = Tree(self.levels[3], ch[2], ch[3], 2, level_root=True,
                 dtype=self.dtype, name="level3")(y, train=train)
        outs.append(y)
        y = Tree(self.levels[4], ch[3], ch[4], 2, level_root=True,
                 dtype=self.dtype, name="level4")(y, train=train)
        outs.append(y)
        y = Tree(self.levels[5], ch[4], ch[5], 2, level_root=True,
                 dtype=self.dtype, name="level5")(y, train=train)
        outs.append(y)
        return outs


class DeformConvBlock(nn.Module):
    """DCNv2 + BN + ReLU (reference DeformConv, dla.py:224-238)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        cin = x.shape[-1]
        # offset+mask conv initialized to zero (reference
        # ModulatedDeformConvPack.conv_offset_mask zero init)
        om = nn.Conv(3 * 9, (3, 3), padding="SAME",
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     dtype=jnp.float32, name="conv_offset_mask")(x)
        offset = om[..., :18]
        mask = nn.sigmoid(om[..., 18:])
        weight = self.param(
            "weight", nn.initializers.he_normal(), (3, 3, cin, self.out_channels),
            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_channels,), jnp.float32)
        y = modulated_deform_conv2d(
            x.astype(jnp.float32), offset, mask, weight, bias)
        y = MaskedBatchNorm(eps=1e-5, momentum=0.1, dtype=self.dtype, name="bn")(
            y.astype(self.dtype), use_running_average=not train)
        return nn.relu(y)


class IDAUp(nn.Module):
    """Iterative deep aggregation upsampling (reference IDAUp)."""

    out_channels: int
    up_factors: Tuple[int, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layers, startp, endp, train=True):
        layers = list(layers)
        for i in range(startp + 1, endp):
            f = int(self.up_factors[i - startp])
            y = DeformConvBlock(self.out_channels, dtype=self.dtype,
                                name=f"proj_{i - startp}")(layers[i], train)
            if f > 1:
                y = nn.ConvTranspose(
                    self.out_channels, (f * 2, f * 2), strides=(f, f),
                    use_bias=False, dtype=self.dtype,
                    name=f"up_{i - startp}")(y)
            # pad/crop to match the previous layer's spatial size
            th, tw = layers[i - 1].shape[1:3]
            y = y[:, :th, :tw]
            layers[i] = DeformConvBlock(
                self.out_channels, dtype=self.dtype,
                name=f"node_{i - startp}")(y + layers[i - 1], train)
        return layers


class DLASeg(nn.Module):
    """Reference DLASeg (dla.py:307-364): DLA-34 base + DLAUp + final IDAUp;
    emits image_features at 1/DOWN_RATIO resolution."""

    model_cfg: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_dict, train: bool = True):
        cfg = as_easy(self.model_cfg)
        down_ratio = int(cfg.get("DOWN_RATIO", 4))
        last_level = int(cfg.get("LAST_LEVEL", 5))
        first = int(np.log2(down_ratio))

        x = batch_dict["image"]  # (B, H, W, 3)
        levels = DLA(dtype=self.dtype, name="base")(x, train)

        # DLAUp over levels[first:] (reference DLAUp.forward, dla.py:287-294):
        # repeatedly aggregate the deepest levels upward, in place
        channels = list(DLA34_CHANNELS[first:])
        sc = np.array([2 ** i for i in range(len(channels))], dtype=int)
        layers = list(levels[first:])
        n = len(layers)
        out = [layers[-1]]
        for i in range(len(channels) - 1):
            j = -i - 2
            sub = IDAUp(channels[j], tuple((sc[j:] // sc[j]).tolist()),
                        dtype=self.dtype, name=f"ida_{i}")(
                layers, n - i - 2, n, train)
            layers = sub
            sc[j + 1:] = sc[j]
            out.insert(0, layers[-1])

        y = [out[i] for i in range(last_level - first)]
        y = IDAUp(channels[0],
                  tuple(2 ** i for i in range(last_level - first)),
                  dtype=self.dtype, name="final_ida")(y, 0, len(y), train)
        batch_dict["image_features"] = y[-1]
        return batch_dict
