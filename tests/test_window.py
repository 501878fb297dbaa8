"""Window bucketing plan vs a numpy oracle of the reference SST semantics
(reference sst_utils.get_window_coors + SSTInputLayer drop/bucket logic)."""
import numpy as np
import jax
import jax.numpy as jnp

from gdmae_tpu.ops import window as W

DROPS = (W.DropSpec(16, 0, 16), W.DropSpec(32, 16, 32), W.DropSpec(64, 32, 100000))


def make_occ(b, ny, nx, density, seed):
    rng = np.random.RandomState(seed)
    return rng.rand(b, ny, nx) < density


def oracle_windows(occ, win, shift):
    """Map each occupied cell -> (window key, count per window)."""
    b, ny, nx = occ.shape
    wy, wx = win
    sy, sx = shift
    cells = {}
    for bi, yi, xi in zip(*np.where(occ)):
        wyi, wxi = (yi + sy) // wy, (xi + sx) // wx
        key = (bi, wyi, wxi)
        cells.setdefault(key, []).append((yi, xi))
    return cells


def check_plan(occ, win, shift, caps):
    ny, nx = occ.shape[1:]
    plan = W.build_bucket_plan(jnp.asarray(occ), (ny, nx), win, shift, DROPS, caps)
    oracle = oracle_windows(occ, win, shift)

    # expected level for each window
    def lvl(cnt):
        for li, d in enumerate(DROPS):
            if max(d.lower, 1) <= cnt < d.upper:
                return li
        raise AssertionError

    expect_by_level = {li: [] for li in range(3)}
    for key, members in oracle.items():
        expect_by_level[lvl(len(members))].append((key, sorted(members)))

    assert int(plan.overflow) == 0
    covered = set()
    b = occ.shape[0]
    for li in range(3):
        src = np.asarray(plan.tok_src[li])    # (B, W_l, T_l)
        valid = np.asarray(plan.tok_valid[li])
        got_windows = []
        for bi in range(b):
            for wi in range(src.shape[1]):
                toks = src[bi, wi][valid[bi, wi]]
                if len(toks) == 0:
                    continue
                cells = [(int(t) // nx, int(t) % nx) for t in toks]
                got_windows.append((bi, sorted(cells)))
                covered.update((bi, c[0], c[1]) for c in cells)
        expect = [(k[0], m) for k, m in expect_by_level[li]]
        assert sorted(got_windows) == sorted(expect), f"level {li} mismatch"

    # every occupied cell covered exactly once (no drops at 8x8 windows)
    all_occ = {(bi, yi, xi) for bi, yi, xi in zip(*np.where(occ))}
    assert covered == all_occ


def test_no_shift_sparse():
    occ = make_occ(2, 40, 48, 0.05, 0)
    check_plan(occ, (8, 8), (0, 0), (80, 16, 8))


def test_shift_dense():
    occ = make_occ(2, 40, 48, 0.6, 1)
    caps = W.default_win_caps((40, 48), (8, 8), int(occ.sum()), DROPS, batch_size=2)
    check_plan(occ, (8, 8), (4, 4), caps)


def test_nondivisible_grid_with_shift():
    occ = make_occ(1, 37, 29, 0.3, 2)
    caps = W.default_win_caps((37, 29), (8, 8), int(occ.sum()), DROPS)
    check_plan(occ, (8, 8), (4, 4), caps)


def test_gather_scatter_roundtrip():
    rng = np.random.RandomState(3)
    occ = make_occ(2, 24, 32, 0.2, 3)
    ny, nx = 24, 32
    caps = W.default_win_caps((ny, nx), (8, 8), int(occ.sum()), DROPS, batch_size=2)
    plan = W.build_bucket_plan(jnp.asarray(occ), (ny, nx), (8, 8), (4, 4), DROPS, caps)
    feats = jnp.asarray(rng.randn(2, ny, nx, 16).astype(np.float32))
    buckets = W.gather_buckets(feats, plan)
    # doubling bucket tokens then scattering back doubles occupied cells only
    out = W.scatter_buckets(feats, plan, [b * 2 for b in buckets])
    out = np.asarray(out)
    expect = np.where(occ[..., None], np.asarray(feats) * 2, np.asarray(feats))
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_overflow_counter():
    occ = make_occ(1, 32, 32, 0.5, 4)
    plan = W.build_bucket_plan(jnp.asarray(occ), (32, 32), (8, 8), (0, 0), DROPS, (1, 1, 1))
    oracle = oracle_windows(occ, (8, 8), (0, 0))
    per_level = [0, 0, 0]
    for members in oracle.values():
        cnt = len(members)
        for li, d in enumerate(DROPS):
            if max(d.lower, 1) <= cnt < d.upper:
                per_level[li] += 1
    assert int(plan.overflow) == sum(max(n - 1, 0) for n in per_level)


def test_pos_embed_shapes_and_range():
    yx = jnp.asarray(np.stack(np.meshgrid(np.arange(8), np.arange(8), indexing="ij"), -1).reshape(-1, 2))
    pe = np.asarray(W.sinusoidal_pos_embed(yx, (8, 8), 128))
    assert pe.shape == (64, 128)
    assert np.all(np.abs(pe) <= 1.0 + 1e-6)
    # distinct positions -> distinct embeddings
    assert len(np.unique(pe.round(4), axis=0)) == 64


def test_packed_shift_block_matches_per_level():
    """CanvasShiftBlock's packed 128-block path must match the per-level
    bucket path exactly (same plan, same params)."""
    import numpy as np
    from unittest import mock

    from gdmae_tpu.models.model_utils.sst_layers import CanvasShiftBlock
    from gdmae_tpu.ops import window as window_ops

    rng = np.random.RandomState(0)
    ny, nx, m = 32, 32, 64
    b = 2
    occ_np = np.zeros((b, ny, nx), bool)
    coords_list, mask_list = [], []
    for bi in range(b):
        cells = rng.choice(ny * nx, size=m - 5, replace=False)
        cells.sort()
        cy, cx = cells // nx, cells % nx
        for y, x in zip(cy, cx):
            occ_np[bi, y, x] = True
        coords = np.zeros((m, 2), np.int32)
        coords[: m - 5, 0] = cy
        coords[: m - 5, 1] = cx
        coords_list.append(coords)
        mask_list.append(np.arange(m) < m - 5)
    occ = jnp.asarray(occ_np)
    coords = jnp.asarray(np.stack(coords_list))
    mask = jnp.asarray(np.stack(mask_list))

    window = (8, 8)
    specs = window_ops.drop_specs_from_cfg({
        "0": {"max_tokens": 16, "drop_range": [0, 16]},
        "1": {"max_tokens": 32, "drop_range": [16, 32]},
        "2": {"max_tokens": 64, "drop_range": [32, 100000]},
    })
    caps = (16, 8, 4)  # 16*16=256, 8*32=256, 4*64=256 — all 128-aligned
    c2t = window_ops.build_cell2tok(coords, mask, (ny, nx))
    tcell = window_ops.token_cell_index(coords, mask, (ny, nx))
    plans = [
        window_ops.plan_to_tokens(
            window_ops.build_bucket_plan(
                occ, (ny, nx), window, shift, specs, caps),
            c2t, tcell, m)
        for shift in ((0, 0), (4, 4))
    ]
    assert window_ops.plan_block_ts(plans[0]) is not None

    rows = jnp.asarray(rng.randn(b, m, 64).astype(np.float32))
    blk = CanvasShiftBlock(d_model=64, nhead=4, dim_feedforward=128,
                           window=window)
    params = blk.init(jax.random.PRNGKey(0), rows, plans)
    packed = blk.apply(params, rows, plans)
    with mock.patch.object(window_ops, "plan_block_ts", lambda p: None):
        per_level = blk.apply(params, rows, plans)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(per_level),
                               rtol=2e-5, atol=2e-5)


def test_packing_specs_semantics():
    """pow2 packing refinement must keep drop semantics identical: every
    window count lands in exactly one refined level, keeps the same number
    of tokens, and every refined max_tokens divides 128 (packed path)."""
    specs = W.packing_specs(DROPS, 64)
    assert all(128 % s.max_tokens == 0 for s in specs)
    for cnt in range(1, 200):
        orig = [s for s in DROPS if max(s.lower, 1) <= cnt < s.upper]
        ref = [s for s in specs if max(s.lower, 1) <= cnt < s.upper]
        assert len(orig) == len(ref) == 1, cnt
        # kept tokens identical (window keeps min(count, max_tokens) either
        # way; the 64-cell window bounds counts at 64)
        c = min(cnt, 64)
        assert min(c, orig[0].max_tokens) == min(c, ref[0].max_tokens), cnt
        # refined padding never exceeds the original level's padding
        assert ref[0].max_tokens <= orig[0].max_tokens, cnt
    # sub-levels are ordered and contiguous within each original level
    for a, bspec in zip(specs, specs[1:]):
        assert a.upper == bspec.lower


def test_pack_pow2_block_equivalence():
    """Encoder output through pow2-refined packing levels must equal the
    unrefined drop levels bit-for-bit in f32 tolerance (same kept tokens,
    same attention sets; only the padded layout differs)."""
    from gdmae_tpu.models.model_utils.sst_layers import CanvasShiftBlock

    rng = np.random.RandomState(11)
    ny, nx, m = 40, 40, 96
    b = 2
    occ_np = np.zeros((b, ny, nx), bool)
    coords_list, mask_list = [], []
    for bi in range(b):
        # mix of sparse scatter + one dense 8x8 patch (exercises several
        # pow2 sub-levels AND the >32-count level)
        cells = set(rng.choice(ny * nx, size=40, replace=False).tolist())
        base = (rng.randint(0, 4) * 8) * nx + rng.randint(0, 4) * 8
        for dy in range(7):
            for dx in range(6):
                cells.add(base + dy * nx + dx)
        cells = np.sort(np.fromiter(cells, np.int64))[: m - 3]
        cy, cx = cells // nx, cells % nx
        occ_np[bi, cy, cx] = True
        coords = np.zeros((m, 2), np.int32)
        coords[: len(cells), 0] = cy
        coords[: len(cells), 1] = cx
        coords_list.append(coords)
        mask_list.append(np.arange(m) < len(cells))
    occ = jnp.asarray(occ_np)
    coords = jnp.asarray(np.stack(coords_list))
    mask = jnp.asarray(np.stack(mask_list))

    window = (8, 8)
    c2t = W.build_cell2tok(coords, mask, (ny, nx))
    tcell = W.token_cell_index(coords, mask, (ny, nx))

    def run(specs, caps):
        plans = [
            W.plan_to_tokens(
                W.build_bucket_plan(occ, (ny, nx), window, shift, specs, caps),
                c2t, tcell, m)
            for shift in ((0, 0), (4, 4))
        ]
        for p in plans:
            assert int(p.overflow) == 0
        rows = jnp.asarray(rng.randn(b, m, 64).astype(np.float32))
        blk = CanvasShiftBlock(d_model=64, nhead=4, dim_feedforward=128,
                               window=window)
        params = blk.init(jax.random.PRNGKey(0), rows, plans)
        return rows, params, blk.apply(params, rows, plans)

    rng_state = rng.get_state()
    caps0 = W.default_win_caps((ny, nx), window, m, DROPS)
    rows0, params0, out0 = run(DROPS, caps0)

    rng.set_state(rng_state)  # same token features
    packed_specs = W.packing_specs(DROPS, 64)
    caps1 = W.default_win_caps((ny, nx), window, m, packed_specs)
    rows1, params1, out1 = run(packed_specs, caps1)

    np.testing.assert_array_equal(np.asarray(rows0), np.asarray(rows1))
    jax.tree_util.tree_map(
        lambda a, c: np.testing.assert_array_equal(np.asarray(a), np.asarray(c)),
        params0, params1)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               rtol=2e-5, atol=2e-5)
