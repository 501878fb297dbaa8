"""Isolate searchsorted alternatives and group_points_wrap internals."""
import sys, time
from pathlib import Path
import numpy as np
REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
B, N, M = 64, 16384, 8192

def timed(name, fn, args0, perturb, iters=8):
    import jax, jax.numpy as jnp
    f = jax.jit(fn)
    out = f(*args0)
    prev = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    args = args0
    for i in range(iters):
        args = perturb(args, i)
        out = f(*args)
    prev = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)

def manual_searchsorted(keys, q, side="left"):
    """keys (B,K) sorted, q (B,Q) -> (B,Q) insertion points; log-depth gathers."""
    import jax.numpy as jnp
    b, k = keys.shape
    lo = jnp.zeros(q.shape, jnp.int32)
    hi = jnp.full(q.shape, k, jnp.int32)
    steps = int(np.ceil(np.log2(k + 1))) + 1
    for _ in range(steps):
        mid = (lo + hi) // 2
        km = jnp.take_along_axis(keys, jnp.minimum(mid, k - 1), axis=1)
        if side == "left":
            go_right = km < q
        else:
            go_right = km <= q
        go_right = go_right & (mid < hi)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo

def main():
    import jax, jax.numpy as jnp
    rng = np.random.RandomState(0)
    # cell2tok shape: keys = 8192 sorted cells in [0, 53568], queries = arange(53568)
    ncell = 248 * 216
    keys = np.sort(rng.choice(ncell, (1, M), replace=False).repeat(B, 0) + 0, axis=1).astype(np.int32)
    keys = jnp.asarray(keys)
    q = jnp.broadcast_to(jnp.arange(ncell, dtype=jnp.int32)[None], (B, ncell))

    def pert(args, i): return args

    def f_jnp(k):
        return jax.vmap(lambda kk: jnp.searchsorted(kk, q[0]))(k)
    timed("jnp.searchsorted 53k q", f_jnp, (keys,), pert)

    def f_manual(k):
        return manual_searchsorted(k, q)
    timed("manual binsearch 53k q", f_manual, (keys,), pert)

    rows = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None], (B, M))
    def f_scatter_hinted(k):
        def one(fl):
            c2t = jnp.full((ncell + 1,), M, jnp.int32)
            return c2t.at[fl].set(rows[0], mode="drop", unique_indices=True,
                                  indices_are_sorted=True)[:-1]
        return jax.vmap(one)(k)
    timed("scatter hinted (sorted+unique)", f_scatter_hinted, (keys,), pert)

    # group_points_wrap internals
    from gdmae_tpu.ops import scatter as S
    pts = np.zeros((B, N, 3), np.float32)
    pts[..., 0] = rng.uniform(0.5, 68.5, (B, N))
    pts[..., 1] = rng.uniform(-39, 39, (B, N))
    pts[..., 2] = rng.uniform(-2.5, 0.5, (B, N))
    points = jnp.asarray(pts)
    pmask = jnp.ones((B, N), bool)
    res = jax.jit(jax.vmap(lambda p: S.dynamic_pillarize(
        p, pmask[0], (0,-39.68,-3,69.12,39.68,1), (0.32,0.32,4), (216,248), M)))(points)

    K = 64
    def pertp(args, i): return (args[0] + jnp.float32(1e-30),) + tuple(args[1:])

    def f_pos_only(p):
        def one(v, r):
            kk = jnp.arange(K, dtype=jnp.int32)[None, :]
            cnt = jnp.clip(r.pillar_count[:, None], 1, None)
            qq = (kk.astype(jnp.float32) * (1.0 / cnt.astype(jnp.float32))).astype(jnp.int32)
            rr = kk - qq * cnt
            rr = jnp.where(rr < 0, rr + cnt, rr)
            rr = jnp.where(rr >= cnt, rr - cnt, rr)
            return r.pillar_start[:, None] + rr
        return jax.vmap(one)(points, res)
    timed("group: pos compute only", f_pos_only, (points,), pertp)

    def f_gather1(p):
        def one(v, r):
            pos = r.pillar_start[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :] % 1
            gi = r.point_order[jnp.clip(pos, 0, N - 1)]
            return gi
        return jax.vmap(one)(points, res)
    timed("group: order gather only", f_gather1, (points,), pertp)

    def f_full(p):
        return jax.vmap(lambda v, r: S.group_points_wrap(v, r, K))(p, res)
    timed("group: full", f_full, (points,), pertp)

main()
