"""Compile the MAE train fwd on the TPU backend and dump XLA cost analysis,
plus time backbone-only forward."""
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
    variables = {"params": params, "batch_stats": batch_stats}
    key = jax.random.PRNGKey(0)

    def fwd(v, b, k):
        out, _ = model.apply(v, b, train=True, mutable=["batch_stats"],
                             rngs={"mae_mask": k})
        return out["loss"]

    lowered = jax.jit(fwd).lower(variables, batch, key)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        for key_ in sorted(ca):
            v = ca[key_]
            if isinstance(v, (int, float)) and v > 1e6:
                print(f"cost[{key_}] = {v:.3e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print("cost_analysis unavailable:", e, flush=True)
    try:
        ma = compiled.memory_analysis()
        print("memory:", ma, flush=True)
    except Exception as e:  # noqa: BLE001
        print("memory_analysis unavailable:", e, flush=True)

    # time the compiled fwd with chained readbacks
    def timeit(fn, *args, iters=10):
        o = fn(*args)
        float(jnp.asarray(o).reshape(-1)[0])
        t0 = time.perf_counter()
        prev = 0.0
        for i in range(iters):
            k2 = jax.random.fold_in(key, i + int(prev * 0))
            o = fn(variables, batch, k2)
            prev = float(jnp.asarray(o).reshape(-1)[0])
        return (time.perf_counter() - t0) / iters * 1e3

    print(f"fwd: {timeit(compiled, variables, batch, key):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
