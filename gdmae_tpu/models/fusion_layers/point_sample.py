"""PointSample: project LiDAR points into camera feature maps.

TPU-native counterpart of reference
pcdet/models/fusion_layers/point_sample.py: the recorded 3D world
augmentations are reversed on the sampled points (host-side parameters
captured by the augmentor), the points are projected with the calib
matrices, the recorded 2D image transforms are applied, and image features
are bilinearly sampled.  Operates on padded (B, N, 3) point batches.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.deform_conv import bilinear_sample
from ...utils import transform_utils


def sample_image_features(points_3d, img_feats, proj_mat,
                          trans_3d_list=None, trans_3d_params=None,
                          trans_2d_list=None, trans_2d_params=None,
                          img_shape=None):
    """One sample: (N, 3) lidar points -> (N, C) image features."""
    pts = points_3d
    if trans_3d_list:
        for key in trans_3d_list[::-1]:
            pts, _ = getattr(transform_utils, key)(
                trans_3d_params[key], reverse=True, points_3d=pts)
    pts2d = transform_utils.points_lidar2img(pts, proj_mat)
    if trans_2d_list:
        for key in trans_2d_list:
            pts2d, _ = getattr(transform_utils, key)(
                trans_2d_params[key], reverse=False, points_2d=pts2d)
    # image -> feature-map coords (feature map is img at some stride)
    h_f, w_f = img_feats.shape[0], img_feats.shape[1]
    if img_shape is not None:
        sy = h_f / img_shape[0]
        sx = w_f / img_shape[1]
    else:
        sy = sx = 1.0
    y = pts2d[:, 1] * sy
    x = pts2d[:, 0] * sx
    return bilinear_sample(img_feats, y, x)


class PointSample(nn.Module):
    """Batched module form used by GraphRCNNHead's image branch."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_dict):
        img_feats = batch_dict["image_features"]  # (B, Hf, Wf, C)
        points = batch_dict["sampled_points"]  # (B, N, 3)
        proj = batch_dict["trans_cam_to_img"] @ batch_dict["trans_lidar_to_cam"][:, :4]
        img_shape = batch_dict["image"].shape[1:3]

        t3l = batch_dict.get("transformation_3d_list")
        t3p = batch_dict.get("transformation_3d_params")
        t2l = batch_dict.get("transformation_2d_list")
        t2p = batch_dict.get("transformation_2d_params")

        outs = []
        b = points.shape[0]
        for i in range(b):
            outs.append(sample_image_features(
                points[i], img_feats[i], proj[i],
                trans_3d_list=t3l[i] if t3l else None,
                trans_3d_params=t3p[i] if t3p else None,
                trans_2d_list=t2l[i] if t2l else None,
                trans_2d_params=t2p[i] if t2p else None,
                img_shape=img_shape))
        return jnp.stack(outs, axis=0)
