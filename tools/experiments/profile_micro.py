"""Isolated micro-benchmarks of gd_mae_ssl hot pieces (honest timing)."""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

B, N, M, K_GT = 64, 16384, 8192, 64


def timed(name, fn, args0, perturb, iters=8):
    import jax
    import jax.numpy as jnp

    f = jax.jit(fn)
    out = f(*args0)
    prev = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    args = args0
    for i in range(iters):
        args = perturb(args, prev * 1e-30 + (i + 1) * 1e-30)
        out = f(*args)
    prev = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from gdmae_tpu.ops import scatter as S
    from gdmae_tpu.ops import window as W
    from gdmae_tpu.utils import loss_utils

    rng = np.random.RandomState(0)
    pts = np.zeros((B, N, 4), np.float32)
    pts[..., 0] = rng.uniform(0.5, 68.5, (B, N))
    pts[..., 1] = rng.uniform(-39, 39, (B, N))
    pts[..., 2] = rng.uniform(-2.5, 0.5, (B, N))
    points = jnp.asarray(pts)
    pmask = jnp.ones((B, N), bool)

    pcr = (0, -39.68, -3, 69.12, 39.68, 1)
    vs = (0.32, 0.32, 4)
    gs = (216, 248)

    def pert_pts(args, eps):
        return (args[0] + jnp.float32(eps),) + tuple(args[1:])

    # 1. pillarize (sort-based unique)
    def f_pillarize(p):
        return jax.vmap(lambda q: S.dynamic_pillarize(q, pmask[0], pcr, vs, gs, M))(p).pillar_coords
    timed("pillarize (vmapped sort)", f_pillarize, (points[..., :3],), pert_pts)

    # fixed pillarization for downstream pieces
    res = jax.jit(jax.vmap(lambda q: S.dynamic_pillarize(q, pmask[0], pcr, vs, gs, M)))(points[..., :3])

    # 2. sorted segment max of (B*N, 128)
    order = res.point_order
    point_pillar = jnp.take_along_axis(res.point_pillar, order, axis=1)
    seg = (jnp.arange(B, dtype=jnp.int32)[:, None] * (M + 1) + point_pillar).reshape(-1)
    feats = jnp.asarray(rng.randn(B * N, 128).astype(np.float32), jnp.bfloat16)

    def f_segmax(f):
        return S.segment_max(f, seg, B * (M + 1), indices_are_sorted=True)
    timed("segment_max 1Mx128 sorted", f_segmax, (feats,),
          lambda a, e: (a[0] + jnp.bfloat16(e),))

    # 3. group_points_wrap (MAE gt sets)
    def f_group(p):
        return jax.vmap(lambda v, r: S.group_points_wrap(v, r, K_GT))(p, res)
    timed("group_points_wrap 8192x64", f_group, (points[..., :3],), pert_pts)

    # 4. chamfer
    pred = jnp.asarray(rng.randn(B * M, 16, 3).astype(np.float32))
    gt = jnp.asarray(rng.randn(B * M, K_GT, 3).astype(np.float32))
    wts = jnp.asarray(rng.rand(B * M).astype(np.float32))

    def f_chamfer(a, b):
        return loss_utils.chamfer_distance(a, b, weights=wts)
    timed("chamfer 524288x(16,64)", f_chamfer, (pred, gt),
          lambda a, e: (a[0] + jnp.float32(e), a[1]))

    # 5. bucket plan build (stage 1 geometry)
    occ = W.occupancy_from_coords(res.pillar_coords, res.pillar_mask, (248, 216))
    drops = (W.DropSpec(16, 0, 16), W.DropSpec(32, 16, 32), W.DropSpec(64, 32, 100000))

    def f_plan(o):
        p0 = W.build_bucket_plan(o, (248, 216), (8, 8), (0, 0), drops, (160, 64, 32))
        p1 = W.build_bucket_plan(o, (248, 216), (8, 8), (4, 4), drops, (160, 64, 32))
        return p0.inv_idx + p1.inv_idx
    timed("bucket plans x2 (stage1)", f_plan, (occ,),
          lambda a, e: (a[0] ^ (jnp.zeros_like(a[0]) > 0),))

    # 6. compact_occupancy (nonzero)
    def f_compact(o):
        return W.compact_occupancy(o, 4928)[0]
    timed("compact_occupancy 13392->4928", f_compact,
          (occ[:, ::2, ::2],), lambda a, e: (a[0],))

    # 7. scatter canvas + deconv-ish conv at full res
    feats_p = jnp.asarray(rng.randn(B, M, 128).astype(np.float32), jnp.bfloat16)
    from gdmae_tpu.models.backbones_3d.spt_backbone import scatter_pillars_to_canvas

    def f_canvas(f):
        c, _ = scatter_pillars_to_canvas(f, res.pillar_coords, res.pillar_mask, (248, 216))
        return c
    timed("scatter canvas (64,248,216,128)", f_canvas, (feats_p,),
          lambda a, e: (a[0] + jnp.bfloat16(e),))


if __name__ == "__main__":
    main()
