import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdmae_tpu.config import EasyDict
from gdmae_tpu.models.pfe import VoxelSetAbstraction


def _cfg():
    return EasyDict({
        "NAME": "VoxelSetAbstraction",
        "NUM_KEYPOINTS": 32,
        "NUM_OUTPUT_FEATURES": 32,
        "FEATURES_SOURCE": ["bev", "raw_points", "x_conv3"],
        "SA_LAYER": {
            "raw_points": {
                "MLPS": [[8, 8], [8, 8]],
                "POOL_RADIUS": [0.4, 0.8],
                "NSAMPLE": [8, 8],
            },
            "x_conv3": {
                "DOWNSAMPLE_FACTOR": 4,
                "MLPS": [[8, 8]],
                "POOL_RADIUS": [1.2],
                "NSAMPLE": [8],
            },
        },
    })


def test_voxel_set_abstraction_shapes():
    rng = np.random.RandomState(0)
    b, n, v = 2, 256, 64
    pts = rng.uniform([0, -4, -3], [8, 4, 1], size=(b, n, 3)).astype(np.float32)
    feats = rng.randn(b, n, 1).astype(np.float32)
    points = np.concatenate([pts, feats], axis=-1)
    point_mask = np.ones((b, n), bool)
    point_mask[:, 200:] = False

    vcoords = np.stack([
        rng.randint(0, 2, (b, v)), rng.randint(0, 16, (b, v)),
        rng.randint(0, 16, (b, v))], axis=-1).astype(np.int32)
    vfeats = rng.randn(b, v, 16).astype(np.float32)
    vmask = np.ones((b, v), bool)
    vmask[:, 48:] = False

    batch = {
        "points": jnp.asarray(points),
        "point_mask": jnp.asarray(point_mask),
        "spatial_features": jnp.asarray(rng.randn(b, 16, 16, 8).astype(np.float32)),
        "spatial_features_stride": 4,
        "multi_scale_3d_features": {
            "x_conv3": (jnp.asarray(vfeats), jnp.asarray(vcoords),
                        jnp.asarray(vmask), 4),
        },
        "multi_scale_3d_strides": {"x_conv3": 4},
        "batch_size": b,
    }
    mod = VoxelSetAbstraction(
        model_cfg=_cfg(), voxel_size=(0.5, 0.5, 1.0),
        point_cloud_range=(0, -4, -3, 8, 4, 1))
    variables = mod.init(jax.random.PRNGKey(0), batch, train=False)
    out = mod.apply(variables, batch, train=False)

    assert out["point_features"].shape == (b, 32, 32)
    assert out["point_coords"].shape == (b, 32, 3)
    assert out["point_valid"].shape == (b, 32)
    assert np.isfinite(np.asarray(out["point_features"])).all()
    # bev(8) + raw 2 groups(8+8) + x_conv3(8) = 32 channels before fusion
    assert out["point_features_before_fusion"].shape == (b, 32, 32)
    # keypoints must be real points
    assert bool(np.asarray(out["point_valid"]).any())
