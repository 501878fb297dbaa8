"""Stage-level TPU timing for the MAE pretrain step (dev tool).

Times vfe-only, full forward, and the full train step at several batch
sizes so optimization effort goes where the milliseconds are.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def run(batch_size):
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
    dtype = jnp.bfloat16
    model = build_network(cfg.MODEL, num_class=3, dataset=meta, dtype=dtype)

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
    state = train_lib.TrainState.create(params, batch_stats, tx)
    step = train_lib.make_train_step(model)
    key = jax.random.PRNGKey(0)

    def timeit_chained(fn, iters=20):
        """fn(carry_scalar) -> scalar; iterations are data-dependent so the
        device cannot overlap or dedupe them.  float() readbacks bracket the
        timed region — block_until_ready alone returns early through the
        remote tunnel."""
        carry = fn(jnp.float32(0.0))
        float(carry)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = fn(carry)
        float(carry)
        return (time.perf_counter() - t0) / iters * 1e3

    variables = {"params": params, "batch_stats": batch_stats}

    @jax.jit
    def vfe_only(v, b, carry):
        def call(mdl, bd, train=False):
            return mdl.vfe(bd, train=train)
        b = dict(b)
        b["points"] = b["points"].at[0, 0, 3].add(carry * 1e-30)
        out = model.apply(v, b, train=False, method=call, rngs={})
        return jnp.sum(out["pillar_features"][0, 0]).astype(jnp.float32)

    @jax.jit
    def fwd(v, b, k, carry):
        b = dict(b)
        b["points"] = b["points"].at[0, 0, 3].add(carry * 1e-30)
        out = model.apply(v, b, train=True, mutable=["batch_stats"],
                          rngs={"mae_mask": k, "dropout": k})
        return out[0]["loss"].astype(jnp.float32)

    @jax.jit
    def full_step(s, b, k, carry):
        b = dict(b)
        b["points"] = b["points"].at[0, 0, 3].add(carry * 1e-30)
        _, metrics = step(s, b, k)
        return metrics["loss"].astype(jnp.float32)

    ms_vfe = timeit_chained(lambda c: vfe_only(variables, batch, c))
    ms_fwd = timeit_chained(lambda c: fwd(variables, batch, key, c))
    ms_step = timeit_chained(lambda c: full_step(state, batch, key, c))
    per_scan = ms_step / batch_size
    print(f"B={batch_size}: vfe {ms_vfe:.1f} ms | fwd {ms_fwd:.1f} ms | "
          f"step {ms_step:.1f} ms | {1000.0 / per_scan:.1f} scans/s", flush=True)


if __name__ == "__main__":
    import sys

    for b in [int(x) for x in (sys.argv[1:] or ["64", "96", "128"])]:
        run(b)
