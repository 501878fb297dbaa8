"""Finer-grained TPU probes: pillarize, bucket plans, one shift block,
dense convs, chamfer — each timed with readback-bracketed chained calls."""
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

    from gdmae_tpu.ops import scatter as sc
    from gdmae_tpu.ops import window as window_ops

    B, N = 64, 16384
    rng = np.random.RandomState(0)
    pts = np.zeros((B, N, 4), np.float32)
    pts[..., 0] = rng.uniform(0.5, 68.5, (B, N))
    pts[..., 1] = rng.uniform(-39, 39, (B, N))
    pts[..., 2] = rng.uniform(-2.5, 0.5, (B, N))
    points = jnp.asarray(pts)
    pmask = jnp.ones((B, N), bool)

    def timeit(fn, iters=10):
        carry = fn(jnp.float32(0.0))
        float(carry)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = fn(carry)
        float(carry)
        return (time.perf_counter() - t0) / iters * 1e3

    pc_range = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
    vs = (0.32, 0.32, 4.0)
    grid = (216, 248)
    MP = 8192

    @jax.jit
    def pillarize(c):
        p = points.at[0, 0, 3].add(c * 1e-30)
        res = jax.vmap(lambda x, m: sc.dynamic_pillarize(
            x, m, pc_range, vs, grid, MP))(p, pmask)
        return jnp.sum(res.pillar_count[0].astype(jnp.float32))

    print(f"pillarize(B={B}): {timeit(pillarize):.1f} ms", flush=True)

    # bucket plan for stage-1 shift-0 at per-sample caps x batch
    caps = tuple(c * B for c in (160, 64, 32))
    drops = (window_ops.DropSpec(16, 0, 16), window_ops.DropSpec(32, 16, 32),
             window_ops.DropSpec(64, 32, 100000))
    res0 = jax.vmap(lambda x, m: sc.dynamic_pillarize(
        x, m, pc_range, vs, grid, MP))(points, pmask)
    grid_hw = (grid[1], grid[0])

    @jax.jit
    def occ_of(c):
        occ = jnp.zeros((B, grid_hw[0], grid_hw[1]), bool)
        coords = res0.pillar_coords
        occ = jax.vmap(lambda o, cd, m: o.at[cd[:, 0], cd[:, 1]].set(m))(
            occ, coords, res0.pillar_mask & (jnp.float32(1.0) + c * 0 > 0))
        return occ

    def plan_fn(c):
        occ2 = occ_of(c)
        plan = window_ops.build_bucket_plan(
            occ2, grid_hw, (8, 8), (0, 0), drops, caps)
        return jnp.sum(plan.tok_src[0].astype(jnp.float32)[:64])

    print(f"bucket_plan(B={B}): {timeit(jax.jit(plan_fn)):.1f} ms", flush=True)

    # one encoder layer on stage-1-sized buckets (level 0: W=160*B, T=16, C=128)
    from gdmae_tpu.models.model_utils.sst_layers import BucketEncoderLayer

    C = 128
    layer = BucketEncoderLayer(C, 8, 256, dtype=jnp.bfloat16)
    feats = jnp.asarray(rng.randn(caps[0], 16, C).astype(np.float32),
                        dtype=jnp.bfloat16)
    pos = jnp.zeros_like(feats)
    valid = jnp.asarray(rng.rand(caps[0], 16) > 0.2)
    lv = layer.init(jax.random.PRNGKey(0), feats, pos, valid)

    @jax.jit
    def enc(c):
        f = feats + (c * 1e-30).astype(feats.dtype)
        return jnp.sum(layer.apply(lv, f, pos, valid)[0, 0].astype(jnp.float32))

    print(f"encoder_layer(W={caps[0]},T=16,C={C}): {timeit(enc):.1f} ms",
          flush=True)

    # dense conv stack: 4x conv3x3 128ch on (B, 248, 216, 128)
    canvas = jnp.asarray(rng.randn(B, 248, 216, C).astype(np.float32),
                         dtype=jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.01,
                     dtype=jnp.bfloat16)

    @jax.jit
    def convs(c):
        x = canvas + (c * 1e-30).astype(canvas.dtype)
        for _ in range(4):
            x = jax.lax.conv_general_dilated(
                x, w1, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(x[0, 0, 0].astype(jnp.float32))

    print(f"conv3x3x4(B={B},248x216x{C}): {timeit(convs):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
