"""On-device fori_loop chained micro-benchmarks (clean per-iter numbers)."""
import sys, time
from pathlib import Path
import numpy as np
REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
B, N, M, K = 64, 16384, 8192, 64

def run(name, make_body, init_carry, iters=16):
    """make_body(carry, i) -> carry; chained on device."""
    import jax, jax.numpy as jnp
    @jax.jit
    def loop(c):
        return jax.lax.fori_loop(0, iters, lambda i, cc: make_body(cc, i), c)
    c = loop(init_carry)
    r0 = float(jnp.sum(jax.tree_util.tree_leaves(c)[0].astype(jnp.float32).ravel()[:4]))
    t0 = time.perf_counter()
    c = loop(c)
    r = float(jnp.sum(jax.tree_util.tree_leaves(c)[0].astype(jnp.float32).ravel()[:4]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)

def main():
    import jax, jax.numpy as jnp
    from gdmae_tpu.ops import scatter as S
    rng = np.random.RandomState(0)

    pts = np.zeros((B, N, 3), np.float32)
    pts[..., 0] = rng.uniform(0.5, 68.5, (B, N))
    pts[..., 1] = rng.uniform(-39, 39, (B, N))
    pts[..., 2] = rng.uniform(-2.5, 0.5, (B, N))
    points = jnp.asarray(pts)
    pmask = jnp.ones((B, N), bool)
    res = jax.jit(jax.vmap(lambda p: S.dynamic_pillarize(
        p, pmask[0], (0,-39.68,-3,69.12,39.68,1), (0.32,0.32,4), (216,248), M)))(points)

    # 1. pillarize chained (perturb points each iter)
    def body_pillarize(c, i):
        p = c
        r = jax.vmap(lambda q: S.dynamic_pillarize(
            q, pmask[0], (0,-39.68,-3,69.12,39.68,1), (0.32,0.32,4), (216,248), M))(p)
        return p + r.pillar_coords[0, 0, 0].astype(jnp.float32) * 1e-30
    run("pillarize", body_pillarize, points)

    # 2. group_points_wrap chained
    def body_group(c, i):
        p = c
        out = jax.vmap(lambda v, r: S.group_points_wrap(v, r, K))(p, res)
        return p + out[0, 0, 0, 0] * 1e-30
    run("group_points_wrap", body_group, points)

    # 3. canvas place chained
    from gdmae_tpu.models.backbones_3d.spt_backbone import scatter_pillars_to_canvas
    featsp = jnp.asarray(rng.randn(B, M, 128).astype(np.float32), jnp.bfloat16)
    def body_canvas(c, i):
        f = c
        cv, _ = scatter_pillars_to_canvas(f, res.pillar_coords, res.pillar_mask, (248, 216))
        return f + cv[0, 0, 0, 0] * jnp.bfloat16(1e-8)
    run("canvas place (searchsorted c2t)", body_canvas, featsp)

    # 4. segmax scatter chained
    pp = res.point_pillar  # (B, N) sorted
    seg = (jnp.arange(B, dtype=jnp.int32)[:, None] * (M + 1) + pp).reshape(-1)
    feats = jnp.asarray(rng.randn(B * N, 128).astype(np.float32), jnp.bfloat16)
    def body_segmax(c, i):
        f = c
        out = S.segment_max(f, seg, B * (M + 1), indices_are_sorted=True)
        return f + out[0, 0] * jnp.bfloat16(1e-8)
    run("segmax scatter", body_segmax, feats)

    # 5. jnp.searchsorted (cell2tok shape) chained
    cells = jnp.where(res.pillar_mask,
                      res.pillar_coords[..., 0] * 216 + res.pillar_coords[..., 1],
                      248 * 216)
    q = jnp.arange(248 * 216, dtype=jnp.int32)
    def body_ss(c, i):
        cl = c
        pos = jax.vmap(lambda kk: jnp.searchsorted(kk, q))(cl)
        return cl + (pos[0, 0] % 2).astype(jnp.int32) * 0
    run("jnp.searchsorted cell2tok", body_ss, cells)

    # 6. scatter-hinted cell2tok chained
    rows = jnp.arange(M, dtype=jnp.int32)
    def body_sc(c, i):
        cl = c
        def one(fl):
            c2t = jnp.full((248 * 216 + 1,), M, jnp.int32)
            return c2t.at[fl].set(rows, mode="drop", unique_indices=True,
                                  indices_are_sorted=True)[:-1]
        pos = jax.vmap(one)(cl)
        return cl + (pos[0, 0] % 2) * 0
    run("scatter-hinted cell2tok", body_sc, cells)

    # 7. elementwise baseline on (B, M, K)
    x = jnp.asarray(rng.randn(B, M, K).astype(np.float32))
    def body_ew(c, i):
        return c * 1.0000001 + 1e-9
    run("elementwise (B,M,64) f32 baseline", body_ew, x)

    # 8. float-div pos compute on (B, M, K)
    cnt = jnp.clip(res.pillar_count[:, :, None], 1, None)
    kk = jnp.arange(K, dtype=jnp.int32)[None, None, :]
    def body_pos(c, i):
        x = c
        qq = (kk.astype(jnp.float32) * (1.0 / cnt.astype(jnp.float32))).astype(jnp.int32)
        rr = kk - qq * cnt
        rr = jnp.where(rr < 0, rr + cnt, rr)
        rr = jnp.where(rr >= cnt, rr - cnt, rr)
        pos = res.pillar_start[:, :, None] + rr
        return x + pos[0, 0, 0].astype(jnp.float32) * 1e-30
    run("float-div pos compute", body_pos, x)

main()
