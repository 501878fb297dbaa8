"""Tests: roi pooling ops, deformable conv, transform replay, conv-BN fold."""
import numpy as np
import jax
import jax.numpy as jnp

from gdmae_tpu.ops import deform_conv, roi_pool
from gdmae_tpu.utils import transform_utils


def test_points_in_boxes():
    pts = np.array([[0, 0, 0], [3, 0, 0], [0.5, 0.5, 0.2]], np.float32)
    boxes = np.array([[0, 0, 0, 2, 2, 1, 0.0]], np.float32)
    idx = np.asarray(roi_pool.points_in_boxes(
        jnp.asarray(pts), jnp.asarray(boxes)))
    assert idx[0] == 0 and idx[1] == -1 and idx[2] == 0


def test_roiaware_pool():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    feats = rng.randn(200, 4).astype(np.float32)
    boxes = np.array([[0, 0, 0, 2, 2, 2, 0.0]], np.float32)
    pooled = np.asarray(roi_pool.roiaware_pool3d(
        jnp.asarray(pts), jnp.asarray(feats), jnp.ones(200, bool),
        jnp.asarray(boxes), (2, 2, 2), "max"))
    assert pooled.shape == (1, 2, 2, 2, 4)
    # max over the (+,+,+) octant equals brute force
    octant = (pts[:, 0] > 0) & (pts[:, 1] > 0) & (pts[:, 2] > 0)
    np.testing.assert_allclose(pooled[0, 1, 1, 1], feats[octant].max(0), rtol=1e-5)


def test_roipoint_pool():
    pts = np.array([[0, 0, 0], [0.1, 0, 0], [5, 5, 5]], np.float32)
    feats = np.arange(3, dtype=np.float32)[:, None]
    boxes = np.array([[0, 0, 0, 1, 1, 1, 0.0], [9, 9, 9, 1, 1, 1, 0.0]], np.float32)
    pooled, empty = roi_pool.roipoint_pool3d(
        jnp.asarray(pts), jnp.asarray(feats), jnp.ones(3, bool),
        jnp.asarray(boxes), num_sampled=4)
    pooled, empty = np.asarray(pooled), np.asarray(empty)
    assert not empty[0] and empty[1]
    # wrap-repeat of the 2 in-box points
    np.testing.assert_allclose(pooled[0, :, 3].tolist(), [0, 1, 0, 1])
    assert np.all(pooled[1] == 0)


def test_deform_conv_zero_offsets_equals_conv():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    w = rng.randn(3, 3, 3, 5).astype(np.float32)
    offset = np.zeros((1, 8, 8, 18), np.float32)
    mask = np.ones((1, 8, 8, 9), np.float32)
    out = np.asarray(deform_conv.modulated_deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask), jnp.asarray(w)))
    # oracle: plain conv with zero padding
    import jax.lax as lax
    ref = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_transform_roundtrip():
    rng = np.random.RandomState(2)
    pts = rng.randn(50, 3).astype(np.float32)
    p = pts.copy()
    p, _ = transform_utils.random_world_flip(["x"], False, points_3d=p)
    p, _ = transform_utils.random_world_rotation(0.5, False, points_3d=p)
    p, _ = transform_utils.random_world_scaling(1.04, False, points_3d=p)
    # reverse in opposite order
    p, _ = transform_utils.random_world_scaling(1.04, True, points_3d=p)
    p, _ = transform_utils.random_world_rotation(0.5, True, points_3d=p)
    p, _ = transform_utils.random_world_flip(["x"], True, points_3d=p)
    np.testing.assert_allclose(p, pts, atol=1e-5)


def test_conv_bn_fold():
    from flax import linen as nn

    from gdmae_tpu.models.model_utils.blocks import ConvBNReLU
    from gdmae_tpu.models.model_utils.fusion_utils import fuse_conv_bn

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    mod = ConvBNReLU(6)
    variables = mod.init(jax.random.PRNGKey(0), x, train=True)
    # run a few train steps to build nontrivial running stats
    vs = variables
    for _ in range(3):
        _, mut = mod.apply(vs, x, train=True, mutable=["batch_stats"])
        vs = {"params": vs["params"], "batch_stats": mut["batch_stats"]}
    ref = mod.apply(vs, x, train=False)
    fused_p, fused_s = fuse_conv_bn(vs["params"], vs["batch_stats"])
    got = mod.apply({"params": fused_p, "batch_stats": fused_s}, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-4)


def test_gelu_config_option(monkeypatch):
    """LAYER_CFG.exact_gelu is the recorded, yaml-level choice of gelu form
    (ADVICE r4: the env var alone left the production default uncovered).
    exact_gelu=True == erf regardless of the env var; None falls back to
    the GDMAE_EXACT_GELU process flag."""
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from gdmae_tpu.models.model_utils.sst_layers import gelu

    x = jnp.asarray(np.linspace(-3, 3, 101, dtype=np.float32))
    erf = nn.gelu(x, approximate=False)
    tanh = nn.gelu(x, approximate=True)

    monkeypatch.delenv("GDMAE_EXACT_GELU", raising=False)
    np.testing.assert_array_equal(np.asarray(gelu(x, True)), np.asarray(erf))
    np.testing.assert_array_equal(np.asarray(gelu(x, False)), np.asarray(tanh))
    np.testing.assert_array_equal(np.asarray(gelu(x)), np.asarray(tanh))
    monkeypatch.setenv("GDMAE_EXACT_GELU", "1")
    np.testing.assert_array_equal(np.asarray(gelu(x)), np.asarray(erf))
    # explicit config choice beats the env var
    np.testing.assert_array_equal(np.asarray(gelu(x, False)), np.asarray(tanh))

    # end-to-end: the config key reaches the encoder layer
    from gdmae_tpu.models.model_utils.sst_layers import BucketEncoderLayer

    monkeypatch.delenv("GDMAE_EXACT_GELU", raising=False)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(1, 2, 8, 16).astype(np.float32))
    pos = jnp.zeros_like(feats)
    valid = jnp.ones((1, 2, 8), bool)
    outs = {}
    for exact in (True, False):
        layer = BucketEncoderLayer(16, 4, 32, exact_gelu=exact)
        v = layer.init(jax.random.PRNGKey(0), feats, pos, valid)
        outs[exact] = np.asarray(layer.apply(v, feats, pos, valid))
    assert not np.array_equal(outs[True], outs[False])
    monkeypatch.setenv("GDMAE_EXACT_GELU", "1")
    layer = BucketEncoderLayer(16, 4, 32, exact_gelu=None)
    v = layer.init(jax.random.PRNGKey(0), feats, pos, valid)
    np.testing.assert_array_equal(
        np.asarray(layer.apply(v, feats, pos, valid)), outs[True])
