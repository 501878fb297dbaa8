"""VFE cost breakdown at bench scale (batch 32, 16384 pts, 8192 pillars)."""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

B, N, M = 32, 16384, 8192


def timed(name, fn, args0, perturb, iters=8):
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

    from gdmae_tpu.ops import scatter as scatter_ops
    from gdmae_tpu.models.model_utils.blocks import LinearBNReLU

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    rng = np.random.RandomState(0)

    pts = np.zeros((B, N, 4), np.float32)
    pts[..., 0] = rng.uniform(0.5, 68.5, (B, N))
    pts[..., 1] = rng.uniform(-39, 39, (B, N))
    pts[..., 2] = rng.uniform(-2.5, 0.5, (B, N))
    points = jnp.asarray(pts)
    pmask = jnp.ones((B, N), bool)
    pc_range = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
    vsize = (0.32, 0.32, 4.0)

    def pert(args, eps):
        return (args[0] + jnp.asarray(eps, args[0].dtype),) + args[1:]

    pillarize = jax.jit(jax.vmap(
        lambda p, m: scatter_ops.dynamic_pillarize(
            p, m, pc_range, vsize, (216, 248), M)))

    timed("pillarize", lambda p: pillarize(p, pmask).pillar_coords,
          (points,), pert)

    res = pillarize(points, pmask)
    seg = (jnp.arange(B, dtype=jnp.int32)[:, None] * (M + 1)
           + res.point_pillar).reshape(-1)
    nseg = B * (M + 1)
    pt_valid = (res.point_pillar < M) & pmask

    # argsort alone
    pid = jnp.asarray(rng.randint(0, 53568, (B, N)).astype(np.int32))
    timed("argsort only", jax.jit(
        lambda p: jnp.argsort(p, axis=-1, stable=True)), (pid,), pert if False else (lambda a, e: a))

    pf128 = jnp.asarray(
        rng.standard_normal((B * N, 128)).astype(np.float32), dtype=dtype)

    timed("segment_max 524k x128 sorted", jax.jit(
        lambda v: scatter_ops.segment_max(
            v, seg, nseg, indices_are_sorted=True)), (pf128,), pert)

    @jax.jit
    def segmax_grad(v):
        def loss(x):
            return jnp.sum(scatter_ops.segment_max(
                x, seg, nseg, indices_are_sorted=True).astype(jnp.float32))
        return jax.grad(loss)(v)

    timed("segment_max fwd+bwd", segmax_grad, (pf128,), pert)

    timed("segment_mean 524k x4 sorted", jax.jit(
        lambda v: scatter_ops.segment_mean(
            v, seg, nseg, indices_are_sorted=True)),
        (points.reshape(B * N, 4),), pert)

    # gather-window max alternative (K first points per pillar, runs)
    K = 32

    @jax.jit
    def window_max(v):
        vv = v.reshape(B, N, -1)

        def one(vals, starts, counts):
            pad = jnp.concatenate(
                [vals, jnp.full((K, vals.shape[-1]), -jnp.inf, vals.dtype)], 0)
            blocks = jax.vmap(
                lambda s: jax.lax.dynamic_slice(
                    pad, (s, 0), (K, vals.shape[-1]))
            )(jnp.minimum(starts, N))
            mask = (jnp.arange(K)[None, :] < jnp.minimum(counts, K)[:, None])
            return jnp.max(
                jnp.where(mask[..., None], blocks, -jnp.inf), axis=1)

        return jax.vmap(one)(vv, res.pillar_start, res.pillar_count)

    timed(f"gather-window max K={K}", window_max, (pf128,), pert)

    # MLP only (no scatter)
    pf10 = jnp.asarray(
        rng.standard_normal((B, N, 10)).astype(np.float32), dtype=dtype)
    mlp0 = LinearBNReLU(64, dtype=dtype)
    v0 = mlp0.init(jax.random.PRNGKey(0), pf10, mask=pt_valid, train=True)
    mlp1 = LinearBNReLU(128, dtype=dtype)
    x64 = jnp.zeros((B, N, 64), dtype)
    v1 = mlp1.init(jax.random.PRNGKey(1), x64, mask=pt_valid, train=True)

    @jax.jit
    def f_mlp(x):
        h = mlp0.apply(v0, x, mask=pt_valid, train=True,
                       mutable=["batch_stats"])[0]
        return mlp1.apply(v1, h, mask=pt_valid, train=True,
                          mutable=["batch_stats"])[0]

    timed("mlp 10->64->128 fwd", f_mlp, (pf10,), pert)

    @jax.jit
    def f_mlp_grad(x):
        def loss(xx):
            return jnp.sum(f_mlp.__wrapped__(xx).astype(jnp.float32))
        return jax.grad(loss)(x)

    timed("mlp fwd+bwd", f_mlp_grad, (pf10,), pert)


if __name__ == "__main__":
    main()
