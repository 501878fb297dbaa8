"""Micro-benchmarks for the two dominant costs found by profile_parts3:
dynamic_pillarize (argsort) and build_bucket_plan internals."""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

B = 32
N = 16384
NCELL = 248 * 216  # 53568


def timed(name, fn, args0, iters=8):
    import jax
    import jax.numpy as jnp

    out = fn(*args0)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(fn(*args0))
    for o in outs:
        jax.block_until_ready(o)
    leaf = jax.tree_util.tree_leaves(outs[-1])[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from gdmae_tpu.ops import window as window_ops

    rng = np.random.RandomState(0)
    pid = jnp.asarray(rng.randint(0, NCELL, (B, N)).astype(np.int32))
    vals = jnp.asarray(rng.standard_normal((B, N, 16)).astype(np.float32))

    timed("sort (B,N) i32", jax.jit(lambda x: jnp.sort(x, axis=-1)), (pid,))
    timed("argsort (B,N) i32", jax.jit(lambda x: jnp.argsort(x, axis=-1)), (pid,))
    timed("sort_pairs (B,N) key+i32", jax.jit(
        lambda x: jax.lax.sort(
            (x, jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), x.shape)),
            dimension=-1, num_keys=1)), (pid,))

    timed("hist scatter-add (B,NCELL)", jax.jit(
        lambda p: jnp.zeros((B, NCELL), jnp.int32).at[
            jnp.arange(B)[:, None], p].add(1)), (pid,))
    timed("occ scatter-max (B,NCELL)", jax.jit(
        lambda p: jnp.zeros((B, NCELL), jnp.bool_).at[
            jnp.arange(B)[:, None], p].max(True)), (pid,))

    occ_np = np.zeros((B, NCELL), bool)
    for b in range(B):
        occ_np[b, np.unique(np.asarray(pid[b]))[:1232]] = True
    occ = jnp.asarray(occ_np)
    timed("cumsum (B,NCELL) i32", jax.jit(
        lambda o: jnp.cumsum(o.astype(jnp.int32), axis=-1)), (occ,))

    srt = jnp.sort(pid, axis=-1)
    timed("searchsorted 53k queries in (B,N)", jax.jit(
        lambda s: jax.vmap(
            lambda r: jnp.searchsorted(r, jnp.arange(NCELL, dtype=jnp.int32)))(s)
        ), (srt,))

    # one-hot matmul histogram (MXU route): pid -> window id (0..836); count
    # tokens per window as onehot(win)^T @ ones
    G = 837
    win = pid % G
    timed("per-window count via segment-sum", jax.jit(
        lambda w: jax.vmap(lambda ww: jax.ops.segment_sum(
            jnp.ones((N,), jnp.float32), ww, num_segments=G))(w)), (win,))

    # ---- build_bucket_plan piecewise (single shift, block-1 scale) ----
    GRID = (248, 216)
    WINDOW = (8, 8)
    DROPS = window_ops.drop_specs_from_cfg({
        "0": {"max_tokens": 16, "drop_range": [0, 16]},
        "1": {"max_tokens": 32, "drop_range": [16, 32]},
        "2": {"max_tokens": 64, "drop_range": [32, 100000]},
    })
    CAPS = (160, 64, 32)

    timed("build_bucket_plan shift0", jax.jit(
        lambda o: window_ops.build_bucket_plan(
            o, GRID, WINDOW, (0, 0), DROPS, CAPS).inv_idx), (occ.reshape(B, *GRID),))

    # piecewise: the window compaction (cumsum+searchsorted comp) alone
    ny, nx = GRID
    wy, wx = WINDOW

    def comp_only(occ_flat):
        occ_pad = occ_flat.reshape(ny, nx)
        nwy, nwx = ny // wy, nx // wx
        g, cells = nwy * nwx, wy * wx
        occ_win = occ_pad.reshape(nwy, wy, nwx, wx).transpose(0, 2, 1, 3)
        occ_win = occ_win.reshape(g, cells)
        counts = occ_win.sum(axis=-1).astype(jnp.int32)
        c_occ = jnp.cumsum(occ_win.astype(jnp.int32), axis=-1)
        c_emp = jnp.cumsum(jnp.logical_not(occ_win).astype(jnp.int32), axis=-1)
        t_ids = jnp.arange(cells, dtype=jnp.int32)

        def _comp_row(co, ce, cnt_row):
            occ_kth = jnp.searchsorted(co, t_ids + 1, side="left")
            emp_kth = jnp.searchsorted(ce, t_ids - cnt_row + 1, side="left")
            return jnp.where(t_ids < cnt_row, occ_kth, emp_kth)

        return jax.vmap(_comp_row)(c_occ, c_emp, counts).astype(jnp.int32)

    timed("plan.comp (in-window compaction)", jax.jit(
        lambda o: jax.vmap(comp_only)(o)), (occ,))

    def levels_only(occ_flat):
        occ_pad = occ_flat.reshape(ny, nx)
        nwy, nwx = ny // wy, nx // wx
        g, cells = nwy * nwx, wy * wx
        occ_win = occ_pad.reshape(nwy, wy, nwx, wx).transpose(0, 2, 1, 3)
        occ_win = occ_win.reshape(g, cells)
        counts = occ_win.sum(axis=-1).astype(jnp.int32)
        level = jnp.full((g,), 3, jnp.int32)
        for li, spec in enumerate(DROPS):
            in_range = (counts >= max(spec.lower, 1)) & (counts < spec.upper)
            level = jnp.where(in_range, li, level)
        csum_l = [jnp.cumsum((level == li).astype(jnp.int32)) for li in range(3)]
        sels = []
        for li, spec in enumerate(DROPS):
            cap = CAPS[li]
            slot = jnp.arange(cap, dtype=jnp.int32)
            sels.append(jnp.searchsorted(csum_l[li], slot + 1, side="left"))
        return sels

    timed("plan.levels+selwin", jax.jit(
        lambda o: jax.vmap(levels_only)(o)), (occ,))

    # plan_to_tokens rewrite
    coords_list, mask_list = jax.jit(
        lambda o: window_ops.compact_occupancy(o.reshape(B, ny, nx), 1232))(occ)
    plan = jax.jit(lambda o: window_ops.build_bucket_plan(
        o, GRID, WINDOW, (0, 0), DROPS, CAPS))(occ.reshape(B, *GRID))

    @jax.jit
    def f_p2t(occ2d, coords, mask):
        c2t = window_ops.build_cell2tok(coords, mask, GRID)
        tcell = window_ops.token_cell_index(coords, mask, GRID)
        return window_ops.plan_to_tokens(plan, c2t, tcell, 1232).inv_idx

    timed("build_cell2tok+plan_to_tokens", f_p2t,
          (occ.reshape(B, *GRID), coords_list, mask_list))

    os.environ["GDMAE_C2T_SEARCHSORTED"] = "1"
    timed("build_cell2tok+p2t (searchsorted)", jax.jit(
        lambda o, c, m: f_p2t.__wrapped__(o, c, m)),
          (occ.reshape(B, *GRID), coords_list, mask_list))
    del os.environ["GDMAE_C2T_SEARCHSORTED"]


if __name__ == "__main__":
    main()
