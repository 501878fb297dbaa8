"""Head-to-head timing of op variants on the TPU (honest timing)."""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

B, N, M = 64, 16384, 8192


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

    rng = np.random.RandomState(0)
    # sorted segment ids like the VFE's
    pp = np.sort(rng.randint(0, M, (B, N)).astype(np.int32), axis=1)
    seg = jnp.asarray((np.arange(B)[:, None] * (M + 1) + pp).reshape(-1))
    nseg = B * (M + 1)
    feats = jnp.asarray(rng.randn(B * N, 128).astype(np.float32), jnp.bfloat16)

    def pert_f(args, e):
        return (args[0] + jnp.bfloat16(e),) + tuple(args[1:])

    # fwd variants
    timed("segmax scatter fwd", lambda f: S.segment_max(f, seg, nseg), (feats,), pert_f)
    timed("segmax scan fwd",
          lambda f: S.segment_max(f, seg, nseg, indices_are_sorted=True),
          (feats,), pert_f)

    # fwd+bwd variants
    def g_scatter(f):
        return jax.grad(lambda x: S.segment_max(x.astype(jnp.float32), seg, nseg).sum())(f)
    def g_scan(f):
        return jax.grad(lambda x: S.segment_max(
            x.astype(jnp.float32), seg, nseg, indices_are_sorted=True).sum())(f)
    timed("segmax scatter fwd+bwd", g_scatter, (feats,), pert_f, iters=4)
    timed("segmax scan fwd+bwd", g_scan, (feats,), pert_f, iters=4)

    # group_points_wrap after mod fix
    pts = np.zeros((B, N, 4), np.float32)
    pts[..., 0] = rng.uniform(0.5, 68.5, (B, N))
    pts[..., 1] = rng.uniform(-39, 39, (B, N))
    pts[..., 2] = rng.uniform(-2.5, 0.5, (B, N))
    points = jnp.asarray(pts)
    pmask = jnp.ones((B, N), bool)
    pcr = (0, -39.68, -3, 69.12, 39.68, 1)
    vs = (0.32, 0.32, 4)
    gs = (216, 248)

    def pert_pts(args, e):
        return (args[0] + jnp.float32(e),) + tuple(args[1:])

    def f_pillarize(p):
        return jax.vmap(lambda q: S.dynamic_pillarize(q, pmask[0], pcr, vs, gs, M))(p).pillar_coords
    timed("pillarize (searchsorted tables)", f_pillarize, (points[..., :3],), pert_pts)

    res = jax.jit(jax.vmap(lambda q: S.dynamic_pillarize(q, pmask[0], pcr, vs, gs, M)))(points[..., :3])

    def f_group(p):
        return jax.vmap(lambda v, r: S.group_points_wrap(v, r, 64))(p, res)
    timed("group_points_wrap (float-div)", f_group, (points[..., :3],), pert_pts)

    # plans new
    occ = W.occupancy_from_coords(res.pillar_coords, res.pillar_mask, (248, 216))
    drops = (W.DropSpec(16, 0, 16), W.DropSpec(32, 16, 32), W.DropSpec(64, 32, 100000))

    def f_plan(o):
        p0 = W.build_bucket_plan(o, (248, 216), (8, 8), (0, 0), drops, (160, 64, 32))
        p1 = W.build_bucket_plan(o, (248, 216), (8, 8), (4, 4), drops, (160, 64, 32))
        return p0.inv_idx + p1.inv_idx
    timed("bucket plans x2 (sort-free)", f_plan, (occ,), lambda a, e: (a[0],))

    # canvas scatter new (fwd + bwd)
    feats_p = jnp.asarray(rng.randn(B, M, 128).astype(np.float32), jnp.bfloat16)
    from gdmae_tpu.models.backbones_3d.spt_backbone import (
        scatter_pillars_to_canvas, gather_canvas_at)

    def f_canvas(f):
        c, _ = scatter_pillars_to_canvas(f, res.pillar_coords, res.pillar_mask, (248, 216))
        return c
    timed("canvas place fwd (searchsorted)", f_canvas, (feats_p,),
          lambda a, e: (a[0] + jnp.bfloat16(e),))

    def f_canvas_grad(f):
        def loss(x):
            c, _ = scatter_pillars_to_canvas(x, res.pillar_coords, res.pillar_mask, (248, 216))
            t = gather_canvas_at(c * 2.0, res.pillar_coords, (248, 216), mask=res.pillar_mask)
            return jnp.sum(t.astype(jnp.float32))
        return jax.grad(loss)(f)
    timed("canvas place+gather fwd+bwd (custom vjp)", f_canvas_grad, (feats_p,),
          lambda a, e: (a[0] + jnp.bfloat16(e),), iters=4)

    # chamfer chunked
    from gdmae_tpu.utils import loss_utils
    pred = jnp.asarray(rng.randn(B * M, 16, 3).astype(np.float32))
    gt = jnp.asarray(rng.randn(B * M, 64, 3).astype(np.float32))
    wts = jnp.asarray(rng.rand(B * M).astype(np.float32))

    def f_chamfer_grad(a):
        return jax.grad(lambda x: loss_utils.chamfer_distance(x, gt, weights=wts))(a)
    timed("chamfer chunked fwd+bwd", f_chamfer_grad, (pred,),
          lambda a, e: (a[0] + jnp.float32(e),), iters=4)


if __name__ == "__main__":
    main()
