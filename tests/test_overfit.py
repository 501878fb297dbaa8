"""Single-batch overfit sanity: a few adam_onecycle steps must reduce the
loss on both the detection and MAE graphs (the reference's de-facto
integration test is train-then-eval; this is its fast unit-level analogue).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gdmae_tpu.config import EasyDict
from gdmae_tpu.runtime import optimization, train as train_lib
from tests.test_center_head import center_model_cfg, small_meta, synth_batch
from gdmae_tpu.models.detectors.detector3d_template import build_network

# full-model compiles: slow tier (deselect via pytest.ini addopts)
pytestmark = pytest.mark.slow



def run_steps(model, batch, n_steps=12, needs_rngs=False):
    params, batch_stats = train_lib.init_model(model, batch)
    cfg = EasyDict({
        "OPTIMIZER": "adam_onecycle", "LR": 0.003, "WEIGHT_DECAY": 0.01,
        "MOMENTUM": 0.9, "MOMS": [0.95, 0.85], "PCT_START": 0.4,
        "DIV_FACTOR": 10, "DECAY_STEP_LIST": [35, 45], "LR_DECAY": 0.1,
        "LR_CLIP": 1e-7, "GRAD_NORM_CLIP": 10.0,
    })
    tx, _ = optimization.build_optimizer(cfg, n_steps, 1)
    state = train_lib.TrainState.create(params, batch_stats, tx)
    step = train_lib.make_train_step(model, donate=False)
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(n_steps):
        # fixed rng so MAE masking is deterministic across steps
        state, metrics = step(state, batch, key)
        losses.append(float(metrics["loss"]))
    return losses


def test_centerpoint_overfits_single_batch():
    meta = small_meta()
    model = build_network(center_model_cfg(False), num_class=3, dataset=meta)
    rng = np.random.RandomState(0)
    batch = synth_batch(rng)
    losses = run_steps(model, batch)
    assert losses[-1] < losses[0] * 0.9, losses
    assert all(np.isfinite(l) for l in losses)


def test_mae_overfits_single_batch():
    from pathlib import Path

    from gdmae_tpu.config import cfg_from_yaml_file
    from gdmae_tpu.models.detectors.detector3d_template import DatasetMeta

    repo = Path(__file__).resolve().parent.parent
    cfg = cfg_from_yaml_file(str(repo / "tools/cfgs/kitti_models/gd_mae_ssl.yaml"))
    meta = DatasetMeta(
        class_names=["Car", "Pedestrian", "Cyclist"],
        point_cloud_range=[0, -10.24, -3, 20.48, 10.24, 1],
        voxel_size=[0.32, 0.32, 4],
        grid_size=[64, 64],
        num_point_features=4,
        max_points=1024,
        max_pillars=512,
    )
    model = build_network(cfg.MODEL, num_class=3, dataset=meta)
    rng = np.random.RandomState(1)
    batch = synth_batch(rng)
    batch = {"points": batch["points"], "point_mask": batch["point_mask"]}
    losses = run_steps(model, batch)
    assert losses[-1] < losses[0] * 0.9, losses
