"""Honest stage-level timing of the gd_mae_ssl train step on the TPU.

Methodology (see memory axon-tpu-timing-pitfalls): warmup + float() fence,
then a python loop whose iterations are chained through a data dependency
(an additive perturbation derived from the previous output), one float()
fence at the end.  No per-iteration readbacks (tunnel RTT would dominate).
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def timed(name, fn, args0, perturb, iters=10):
    import jax
    import jax.numpy as jnp

    out = fn(*args0)
    prev = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    args = args0
    for i in range(iters):
        args = perturb(args, prev * 1e-30 + i * 1e-30)
        out = fn(*args)
    prev = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


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
        voxel_size=[0.32, 0.32, 4],
        grid_size=[216, 248],
        num_point_features=4,
        max_points=16384,
        max_pillars=8192,
    )
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    batch_size = int(os.environ.get("GDMAE_BENCH_BATCH", 64)) if on_tpu else 2
    model = build_network(cfg.MODEL, num_class=3, dataset=meta, dtype=dtype)

    rng = np.random.RandomState(0)
    n = meta.max_points
    pts = np.zeros((batch_size, n, 4), np.float32)
    pts[..., 0] = rng.uniform(0.5, 68.5, (batch_size, n))
    pts[..., 1] = rng.uniform(-39, 39, (batch_size, n))
    pts[..., 2] = rng.uniform(-2.5, 0.5, (batch_size, n))
    pts[..., 3] = rng.uniform(0, 1, (batch_size, n))
    batch = {
        "points": jnp.asarray(pts),
        "point_mask": jnp.ones((batch_size, n), bool),
    }

    params, batch_stats = train_lib.init_model(model, batch, seed=0)
    variables = {"params": params, "batch_stats": batch_stats}
    key = jax.random.PRNGKey(0)

    def perturb_batch(args, eps):
        b = dict(args[0])
        b["points"] = b["points"] + jnp.float32(eps)
        return (b,) + args[1:]

    # --- stage splits (fwd only, train mode) ---
    vfe_name = "vfe"

    @jax.jit
    def f_vfe(batch):
        def run(m, bd):
            bd = dict(bd)
            return m.vfe(bd, train=True)
        out = model.apply(
            variables, batch, method=run,
            rngs={"mae_mask": key}, mutable=["batch_stats"])[0]
        return out["pillar_features"]

    timed("vfe fwd", f_vfe, (batch,), perturb_batch)

    @jax.jit
    def f_full(batch):
        out = model.apply(
            variables, batch, train=True,
            rngs={"mae_mask": key}, mutable=["batch_stats"])[0]
        return out["loss"]

    timed("full fwd (loss)", f_full, (batch,), perturb_batch)

    @jax.jit
    def f_grad(batch):
        def loss_fn(p):
            out = model.apply(
                {"params": p, "batch_stats": batch_stats}, batch, train=True,
                rngs={"mae_mask": key}, mutable=["batch_stats"])[0]
            return out["loss"]
        return jax.grad(loss_fn)(params)

    g = timed("fwd+bwd", f_grad, (batch,), perturb_batch, iters=6)

    # encoder only: VFE + backbone encoder, stop before decoder/loss —
    # approximate by running vfe + backbone_3d but returning spatial sum
    @jax.jit
    def f_spatial(batch):
        def run(m, bd):
            bd = dict(bd)
            bd = m.vfe(bd, train=True)
            bd = m.backbone_3d(bd, train=True)
            return bd["spatial_features"]
        return model.apply(
            variables, batch, method=run,
            rngs={"mae_mask": key}, mutable=["batch_stats"])[0]

    timed("vfe+backbone fwd (incl decoder)", f_spatial, (batch,), perturb_batch)


if __name__ == "__main__":
    main()
