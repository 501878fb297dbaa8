"""End-to-end smoke tests: build from YAML config, forward, loss, grads.

Uses a shrunk point-cloud range (64 x 64 grid) + tiny capacities so CPU
compile stays tractable; the module structure is exactly the shipped
gd_mae.yaml / gd_mae_ssl.yaml graphs.
"""
import functools
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gdmae_tpu.config import cfg_from_yaml_file, EasyDict
from gdmae_tpu.models.detectors.detector3d_template import DatasetMeta, build_network

# full-model compiles: slow tier (deselect via pytest.ini addopts)
pytestmark = pytest.mark.slow


REPO = Path(__file__).resolve().parent.parent


def small_meta():
    return DatasetMeta(
        class_names=["Car", "Pedestrian", "Cyclist"],
        point_cloud_range=[0, -10.24, -3, 20.48, 10.24, 1],
        voxel_size=[0.32, 0.32, 4],
        grid_size=[64, 64],
        num_point_features=4,
        max_points=2048,
        max_pillars=1024,
    )


def synth_batch(rng, b=2, n=2048, num_gt=5, meta=None):
    meta = meta or small_meta()
    pts = np.zeros((b, n, 4), np.float32)
    pts[..., 0] = rng.uniform(0.5, 20.0, (b, n))
    pts[..., 1] = rng.uniform(-10.0, 10.0, (b, n))
    pts[..., 2] = rng.uniform(-2.5, 0.5, (b, n))
    pts[..., 3] = rng.uniform(0, 1, (b, n))
    mask = np.ones((b, n), bool)
    mask[:, -100:] = False  # padding tail
    gt = np.zeros((b, 8, 8), np.float32)
    for bi in range(b):
        for gi in range(num_gt):
            gt[bi, gi] = [
                rng.uniform(3, 18), rng.uniform(-8, 8), rng.uniform(-1.5, -0.5),
                rng.uniform(2, 4.5), rng.uniform(1.4, 1.8), 1.5,
                rng.uniform(-np.pi, np.pi), rng.randint(1, 4),
            ]
    return {
        "points": jnp.asarray(pts),
        "point_mask": jnp.asarray(mask),
        "gt_boxes": jnp.asarray(gt),
    }


@pytest.fixture(scope="module")
def det_cfg():
    cfg = cfg_from_yaml_file(str(REPO / "tools/cfgs/kitti_models/gd_mae.yaml"))
    return cfg


@pytest.fixture(scope="module")
def mae_cfg():
    cfg = cfg_from_yaml_file(str(REPO / "tools/cfgs/kitti_models/gd_mae_ssl.yaml"))
    return cfg


def test_detection_train_and_eval(det_cfg):
    meta = small_meta()
    model = build_network(det_cfg.MODEL, num_class=3, dataset=meta)
    rng = np.random.RandomState(0)
    batch = synth_batch(rng)

    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key}, batch, train=True)
    assert "params" in variables and "batch_stats" in variables

    out, mutated = model.apply(
        variables, batch, train=True, mutable=["batch_stats"])
    loss = out["loss"]
    assert np.isfinite(float(loss)), float(loss)
    assert float(loss) > 0

    # gradients flow to every parameter
    def loss_fn(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, mutable=["batch_stats"])
        return o["loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    total_norm = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total_norm > 0

    # eval path: NMS post-processing with fixed-K outputs
    out_eval = model.apply(variables, batch, train=False)
    k = int(det_cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE)
    assert out_eval["final_boxes"].shape == (2, k, 7)
    assert out_eval["final_scores"].shape == (2, k)
    assert out_eval["final_valid"].dtype == bool


def test_mae_pretrain_train(mae_cfg):
    meta = small_meta()
    model = build_network(mae_cfg.MODEL, num_class=3, dataset=meta)
    rng = np.random.RandomState(1)
    batch = synth_batch(rng)

    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "mae_mask": jax.random.PRNGKey(1)}, batch, train=True)
    out, _ = model.apply(
        variables, batch, train=True,
        rngs={"mae_mask": jax.random.PRNGKey(2)}, mutable=["batch_stats"])
    loss = float(out["loss"])
    assert np.isfinite(loss) and loss > 0
    # chamfer on raw coords of a ~20m scene: loss should be moderate
    assert loss < 1000

    # masked ratio sanity: ~85% of real pillars masked
    mm = np.asarray(out["pillar_mae_mask"])
    pm = np.asarray(out["pillar_mask"]) if "pillar_mask" in out else None
    if pm is not None:
        frac = (mm[pm] == 1.0).mean()
        assert 0.8 < frac < 0.9
