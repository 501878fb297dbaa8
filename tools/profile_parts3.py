"""Component-level timing of the gd_mae_ssl step at bench scale (batch 32).

Times each pipeline piece as its own jitted closure with the chained-args
methodology (see profile_stages2.py): warmup + float() fence, python loop
chained through a data dependency, one fence at the end.
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

B = int(os.environ.get("GDMAE_BENCH_BATCH", 32))
ITERS = int(os.environ.get("GDMAE_PROF_ITERS", 8))


def timed(name, fn, args0, perturb, iters=ITERS):
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
    from gdmae_tpu.ops import window as window_ops
    from gdmae_tpu.models.model_utils.sst_layers import CanvasShiftBlock
    from gdmae_tpu.models.model_utils.blocks import TokenConvBNReLU
    from gdmae_tpu.models.backbones_3d.spt_backbone import (
        DeconvFuse, gather_canvas_at, scatter_pillars_to_canvas)

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    rng = np.random.RandomState(0)

    N = 16384
    M = 8192           # pillar capacity
    M_ENC = 1232       # MAE visible token cap
    GRID1 = (248, 216)  # (Ny, Nx) KITTI 0.32 grid as (y, x): note bench uses
    # grid_size [216, 248] = (nx, ny) -> (ny, nx) = (248, 216)
    WINDOW = (8, 8)
    DROPS = window_ops.drop_specs_from_cfg({
        "0": {"max_tokens": 16, "drop_range": [0, 16]},
        "1": {"max_tokens": 32, "drop_range": [16, 32]},
        "2": {"max_tokens": 64, "drop_range": [32, 100000]},
    })
    CAPS1 = (160, 64, 32)
    CAPS2 = (96, 48, 24)
    CAPS3 = (64, 32, 16)

    # ---- synthetic points (KITTI-like) ----
    pts = np.zeros((B, N, 4), np.float32)
    pts[..., 0] = rng.uniform(0.5, 68.5, (B, N))
    pts[..., 1] = rng.uniform(-39, 39, (B, N))
    pts[..., 2] = rng.uniform(-2.5, 0.5, (B, N))
    points = jnp.asarray(pts)
    pmask = jnp.ones((B, N), bool)
    pc_range = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
    vsize = (0.32, 0.32, 4.0)

    def perturb_first(args, eps):
        return (args[0] + jnp.asarray(eps, args[0].dtype),) + args[1:]

    # ---- 1. dynamic pillarization ----
    @jax.jit
    def f_pillarize(points):
        return jax.vmap(
            lambda p, m: scatter_ops.dynamic_pillarize(
                p, m, pc_range, vsize, (216, 248), M)
        )(points, pmask).pillar_coords

    timed("pillarize", f_pillarize, (points,), perturb_first)

    # ---- fixed pillar list for downstream pieces ----
    res = jax.jit(jax.vmap(
        lambda p, m: scatter_ops.dynamic_pillarize(
            p, m, pc_range, vsize, (216, 248), M)
    ))(points, pmask)
    coords = np.asarray(res.pillar_coords)
    mask_np = np.asarray(res.pillar_mask)

    # visible subset (MAE keeps 15%) — just take the first M_ENC valid slots
    vis_coords = np.zeros((B, M_ENC, 2), np.int32)
    vis_mask = np.zeros((B, M_ENC), bool)
    for bi in range(B):
        vidx = np.nonzero(mask_np[bi])[0][:M_ENC]
        vis_coords[bi, : len(vidx)] = coords[bi][vidx]
        vis_mask[bi, : len(vidx)] = True
    vis_coords = jnp.asarray(vis_coords)
    vis_mask = jnp.asarray(vis_mask)
    ny, nx = GRID1
    # NOTE coords are (iy, ix) already per pillarize; grid (216,248) means
    # nx=216? bench uses grid_size=[216,248] (nx, ny); pillarize takes (nx, ny)
    # and coords (iy, ix) with iy<ny=248, ix<nx=216.
    occ1 = jax.jit(lambda c, m: window_ops.occupancy_from_coords(
        c, m, (248, 216)))(vis_coords, vis_mask)

    tokens1 = jnp.asarray(
        rng.standard_normal((B, M_ENC, 128)).astype(np.float32), dtype=dtype)

    # ---- 2. bucket planning (block 1: two shifts + token rewrite) ----
    @jax.jit
    def f_plan(occ, coords, mask):
        c2t = window_ops.build_cell2tok(coords, mask, (248, 216))
        tcell = window_ops.token_cell_index(coords, mask, (248, 216))
        plans = [
            window_ops.plan_to_tokens(
                window_ops.build_bucket_plan(
                    occ, (248, 216), WINDOW, shift, DROPS, CAPS1),
                c2t, tcell, M_ENC)
            for shift in ((0, 0), (4, 4))
        ]
        return plans[0].tok_src[0], plans[1].inv_idx

    def perturb_occ(args, eps):
        return args  # index-only op; occupancy fixed

    timed("plan block1 (2 shifts)", f_plan, (occ1, vis_coords, vis_mask),
          perturb_occ)

    # materialize plans for the layer timing
    def make_plans(occ, coords, mask, grid, caps, m):
        c2t = window_ops.build_cell2tok(coords, mask, grid)
        tcell = window_ops.token_cell_index(coords, mask, grid)
        return [
            window_ops.plan_to_tokens(
                window_ops.build_bucket_plan(
                    occ, grid, WINDOW, shift, DROPS, caps),
                c2t, tcell, m)
            for shift in ((0, 0), (4, 4))
        ]

    plans1 = jax.jit(
        lambda o, c, mk: make_plans(o, c, mk, (248, 216), CAPS1, M_ENC)
    )(occ1, vis_coords, vis_mask)

    # ---- 3. one CanvasShiftBlock fwd+bwd at block-1 sizes ----
    blk = CanvasShiftBlock(
        d_model=128, nhead=8, dim_feedforward=256, window=WINDOW,
        cosine=True, dtype=dtype)
    vars1 = blk.init(jax.random.PRNGKey(0), tokens1, plans1)

    @jax.jit
    def f_block1(tokens):
        return blk.apply(vars1, tokens, plans1)

    timed("shift_block1 fwd (2 enc layers)", f_block1, (tokens1,), perturb_first)

    @jax.jit
    def f_block1_grad(tokens):
        def loss(t):
            return jnp.sum(blk.apply(vars1, t, plans1).astype(jnp.float32))
        return jax.grad(loss)(tokens)

    timed("shift_block1 fwd+bwd", f_block1_grad, (tokens1,), perturb_first)

    # ---- 4. TokenConv stride-2 down (block1 -> block2 grid) ----
    from gdmae_tpu.models.model_utils.blocks import dilate_occupancy
    occ2 = jax.jit(lambda o: dilate_occupancy(o, kernel=3, stride=2))(occ1)
    M2 = 4 * M_ENC
    coords2, mask2 = jax.jit(
        lambda o: window_ops.compact_occupancy(o, M2))(occ2)

    tconv = TokenConvBNReLU(256, kernel=3, stride=2, dtype=dtype)
    c2t_in = jax.jit(lambda c, m: window_ops.build_cell2tok(
        c, m, (248, 216)))(vis_coords, vis_mask)
    tvars = tconv.init(jax.random.PRNGKey(1), tokens1, c2t_in, (248, 216),
                       coords2, mask2, coords_in=vis_coords, mask_in=vis_mask,
                       train=True)

    @jax.jit
    def f_tconv(tokens):
        out = tconv.apply(tvars, tokens, c2t_in, (248, 216), coords2, mask2,
                          coords_in=vis_coords, mask_in=vis_mask, train=True,
                          mutable=["batch_stats"])[0]
        return out

    timed("token_conv down s2 fwd", f_tconv, (tokens1,), perturb_first)

    @jax.jit
    def f_tconv_grad(tokens):
        def loss(t):
            out = tconv.apply(tvars, t, c2t_in, (248, 216), coords2, mask2,
                              coords_in=vis_coords, mask_in=vis_mask,
                              train=True, mutable=["batch_stats"])[0]
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(loss)(tokens)

    timed("token_conv down s2 fwd+bwd", f_tconv_grad, (tokens1,), perturb_first)

    # ---- 5. block-2 shift block at (B, 4*M_ENC, 256) ----
    tokens2 = jnp.asarray(
        rng.standard_normal((B, M2, 256)).astype(np.float32), dtype=dtype)
    plans2 = jax.jit(
        lambda o, c, mk: make_plans(o, c, mk, (124, 108), CAPS2, M2)
    )(occ2, coords2, mask2)
    blk2 = CanvasShiftBlock(
        d_model=256, nhead=8, dim_feedforward=512, window=WINDOW,
        cosine=True, dtype=dtype)
    vars2 = blk2.init(jax.random.PRNGKey(2), tokens2, plans2)

    @jax.jit
    def f_block2_grad(tokens):
        def loss(t):
            return jnp.sum(blk2.apply(vars2, t, plans2).astype(jnp.float32))
        return jax.grad(loss)(tokens)

    timed("shift_block2 fwd+bwd", f_block2_grad, (tokens2,), perturb_first)

    # ---- 6. deconv fuse (generative decoder) ----
    fuse_cfg = {
        "x_conv1": {"UPSAMPLE_STRIDE": 1, "NUM_FILTER": 128,
                     "NUM_UPSAMPLE_FILTER": 128},
        "x_conv2": {"UPSAMPLE_STRIDE": 2, "NUM_FILTER": 256,
                     "NUM_UPSAMPLE_FILTER": 128},
        "x_conv3": {"UPSAMPLE_STRIDE": 4, "NUM_FILTER": 256,
                     "NUM_UPSAMPLE_FILTER": 128},
    }
    fm = {
        "x_conv1": jnp.asarray(rng.standard_normal(
            (B, 248, 216, 128)).astype(np.float32), dtype=dtype),
        "x_conv2": jnp.asarray(rng.standard_normal(
            (B, 124, 108, 256)).astype(np.float32), dtype=dtype),
        "x_conv3": jnp.asarray(rng.standard_normal(
            (B, 62, 54, 256)).astype(np.float32), dtype=dtype),
    }
    fuse = DeconvFuse(fuse_cfg=fuse_cfg,
                      sources=["x_conv1", "x_conv2", "x_conv3"], dtype=dtype)
    fvars = fuse.init(jax.random.PRNGKey(3), fm, train=True)

    # canvases passed as ARGS (closed-over device constants would ship as
    # literals in the remote AOT compile body -> HTTP 413)
    @jax.jit
    def f_fuse_grad(x1, x2, x3):
        def loss(x):
            out = fuse.apply(
                fvars, {"x_conv1": x, "x_conv2": x2, "x_conv3": x3},
                train=True, mutable=["batch_stats"])[0]
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(loss)(x1)

    timed("deconv_fuse fwd+bwd", f_fuse_grad,
          (fm["x_conv1"], fm["x_conv2"], fm["x_conv3"]), perturb_first)

    # ---- chamfer loss fwd+bwd at MAE scale ----
    from gdmae_tpu.utils.loss_utils import chamfer_distance
    pred_pts = jnp.asarray(
        rng.standard_normal((B * M, 16, 3)).astype(np.float32))
    gt_pts = jnp.asarray(
        rng.standard_normal((B * M, 64, 3)).astype(np.float32))
    gt_m = jnp.asarray(rng.rand(B * M, 64) > 0.5)
    w = jnp.asarray(rng.rand(B * M).astype(np.float32))

    @jax.jit
    def f_chamfer(pred):
        def loss(p):
            return chamfer_distance(p, gt_pts, gt_mask=gt_m, weights=w)
        return jax.grad(loss)(pred)

    timed("chamfer fwd+bwd", f_chamfer, (pred_pts,), perturb_first)

    # ---- 7. MAE target grouping ----
    @jax.jit
    def f_group(points):
        order = res.point_order
        sorted_pts = jax.vmap(lambda v, o: v[o])(points[..., :3], order)
        gt, gm = jax.vmap(
            lambda v, r: scatter_ops.group_points_padded(v, r, 64)
        )(sorted_pts, res)
        return gt

    timed("group_points (gt sets)", f_group, (points,), perturb_first)

    # ---- 8. canvas scatter/gather roundtrip ----
    @jax.jit
    def f_canvas(tokens):
        canvas, occ = scatter_pillars_to_canvas(
            tokens, vis_coords, vis_mask, (248, 216))
        return gather_canvas_at(canvas, vis_coords, (248, 216), mask=vis_mask)

    timed("canvas scatter+gather", f_canvas, (tokens1,), perturb_first)


if __name__ == "__main__":
    main()
