"""Dev probe: time the fused lax.scan train loop vs the per-dispatch loop
with strict host readbacks bracketing every timing region."""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    import jax
    import jax.numpy as jnp

    from gdmae_tpu.config import cfg_from_yaml_file
    from gdmae_tpu.models.detectors.detector3d_template import (
        DatasetMeta, build_network,
    )
    from gdmae_tpu.runtime import optimization, train as train_lib

    cfg = cfg_from_yaml_file(str(REPO / "tools/cfgs/kitti_models/gd_mae_ssl.yaml"))
    cfg.MODEL.BACKBONE_3D.TPU_WINDOW_CAPS = [
        [160, 64, 32], [96, 48, 24], [64, 32, 16]]
    meta = DatasetMeta(
        class_names=cfg.CLASS_NAMES,
        point_cloud_range=cfg.DATA_CONFIG.POINT_CLOUD_RANGE,
        voxel_size=[0.32, 0.32, 4], grid_size=[216, 248],
        num_point_features=4, max_points=16384, max_pillars=8192)
    batch_size = 64
    model = build_network(cfg.MODEL, num_class=3, dataset=meta,
                          dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    n = meta.max_points
    pts = np.zeros((batch_size, n, 4), np.float32)
    pts[..., 0] = rng.uniform(0.5, 68.5, (batch_size, n))
    pts[..., 1] = rng.uniform(-39, 39, (batch_size, n))
    pts[..., 2] = rng.uniform(-2.5, 0.5, (batch_size, n))
    pts[..., 3] = rng.uniform(0, 1, (batch_size, n))
    batch = {"points": jnp.asarray(pts),
             "point_mask": jnp.ones((batch_size, n), bool)}

    params, batch_stats = train_lib.init_model(model, batch, seed=0)
    tx, _ = optimization.build_optimizer(cfg.OPTIMIZATION, 100, 30)
    key = jax.random.PRNGKey(0)
    # the loop phase donates its state (incl. these buffers) — keep copies
    # for the scan phase
    params2 = jax.tree_util.tree_map(jnp.copy, params)
    batch_stats2 = jax.tree_util.tree_map(jnp.copy, batch_stats)

    # --- per-dispatch loop -------------------------------------------- #
    state = train_lib.TrainState.create(params, batch_stats, tx)
    step = train_lib.make_train_step(model)
    state, metrics = step(state, batch, key)
    float(jnp.sum(metrics["loss"]))
    t0 = time.perf_counter()
    iters = 20
    for i in range(iters):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
    float(jnp.sum(metrics["loss"]))
    dt = time.perf_counter() - t0
    print(f"loop: {dt / iters * 1e3:.1f} ms/step, "
          f"{batch_size * iters / dt:.1f} scans/s", flush=True)
    del state

    # --- fused scan --------------------------------------------------- #
    inner = 10
    state2 = train_lib.TrainState.create(params2, batch_stats2, tx)
    scan_step = train_lib.make_scan_train_step(model)
    batches = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (inner,) + x.shape), batch)
    state2, metrics = scan_step(state2, batches, key)
    float(jnp.sum(metrics["loss"]))
    t0 = time.perf_counter()
    outer = 4
    for i in range(outer):
        state2, metrics = scan_step(state2, batches, jax.random.fold_in(key, i))
    float(jnp.sum(metrics["loss"]))
    dt = time.perf_counter() - t0
    total = inner * outer
    print(f"scan: {dt / total * 1e3:.1f} ms/step, "
          f"{batch_size * total / dt:.1f} scans/s", flush=True)


if __name__ == "__main__":
    main()
