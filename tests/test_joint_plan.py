"""Oracle tests for joint-budget window packing (ops.window.JointPlan).

The joint plan must be semantically identical to the per-level BucketPlan
(same kept token set per window, same drop rule) while packing all windows
into one shared static budget; the packed layout must keep every window
inside a single 128-token attention block.
"""
import jax
import jax.numpy as jnp
import numpy as np

from gdmae_tpu.ops import window as W

SPECS = W.drop_specs_from_cfg({
    "0": {"max_tokens": 16, "drop_range": [0, 16]},
    "1": {"max_tokens": 32, "drop_range": [16, 32]},
    "2": {"max_tokens": 64, "drop_range": [32, 100000]},
})
PACKED = W.packing_specs(SPECS, 64, min_t=1)


def _rand_occ(rng, b, ny, nx, p=0.08):
    occ = rng.rand(b, ny, nx) < p
    occ[:, 0, 0] = True
    return jnp.asarray(occ)


def test_joint_plan_covers_and_aligns():
    rng = np.random.RandomState(0)
    b, ny, nx = 2, 40, 48
    occ = _rand_occ(rng, b, ny, nx)
    budget = 1024
    for shift in ((0, 0), (4, 4)):
        plan = W.build_joint_plan(occ, (ny, nx), (8, 8), shift, PACKED,
                                  budget)
        assert int(plan.overflow) == 0
        src = np.asarray(plan.tok_src)
        val = np.asarray(plan.tok_valid)
        wid = np.asarray(plan.wid)
        inv = np.asarray(plan.inv_idx)
        occ_np = np.asarray(occ).reshape(b, ny * nx)
        for bi in range(b):
            # every occupied cell appears exactly once in the stream
            cells = src[bi][val[bi]]
            assert len(set(cells.tolist())) == len(cells)
            assert set(cells.tolist()) == set(np.nonzero(occ_np[bi])[0].tolist())
            # inv is the exact inverse
            for cell in np.nonzero(occ_np[bi])[0]:
                pos = inv[bi, cell]
                assert pos < budget and src[bi, pos] == cell
            # window integrity: same window id for all slots of a window,
            # and the window's slot run never crosses a 128 boundary
            for w in set(wid[bi][val[bi]].tolist()):
                slots = np.nonzero(wid[bi] == w)[0]
                lo, hi = slots.min(), slots.max()
                assert hi - lo < 128 and lo // 128 == hi // 128, (w, lo, hi)
                # window ids map to one actual 8x8 window of the grid
                ys = cells_y = src[bi, slots][val[bi, slots]] // nx
                xs = src[bi, slots][val[bi, slots]] % nx
                assert len(set(((ys + shift[0]) // 8 * 100
                                + (xs + shift[1]) // 8).tolist())) == 1


def test_joint_plan_drop_semantics_match_bucket_plan():
    """Kept token set per cell must equal the per-level plan's (same drop
    rule: first min(count, T) cells in raster order)."""
    rng = np.random.RandomState(1)
    b, ny, nx = 2, 32, 32
    occ = _rand_occ(rng, b, ny, nx, p=0.5)  # dense: exercises drops
    caps = tuple(W.cap_align(min(s.max_tokens, 64)) * 6 for s in PACKED)
    bplan = W.build_bucket_plan(occ, (ny, nx), (8, 8), (0, 0), PACKED, caps)
    jplan = W.build_joint_plan(occ, (ny, nx), (8, 8), (0, 0), PACKED, 2048)
    assert int(bplan.overflow) == 0 and int(jplan.overflow) == 0
    cov_b = np.asarray(bplan.inv_idx < bplan.total_tokens)
    cov_j = np.asarray(jplan.inv_idx < jplan.total_tokens)
    np.testing.assert_array_equal(cov_b, cov_j)


def test_joint_overflow_counts_when_budget_small():
    rng = np.random.RandomState(2)
    occ = _rand_occ(rng, 1, 32, 32, p=0.6)
    plan = W.build_joint_plan(occ, (32, 32), (8, 8), (0, 0), PACKED, 128)
    assert int(plan.overflow) > 0


def test_joint_gather_scatter_roundtrip():
    rng = np.random.RandomState(3)
    b, ny, nx, m, c = 2, 32, 32, 80, 16
    coords = np.stack([rng.randint(0, ny, (b, m)),
                       rng.randint(0, nx, (b, m))], -1)
    mask = np.ones((b, m), bool)
    for bi in range(b):  # dedupe cells: duplicate rows become INVALID
        cells = coords[bi, :, 0] * nx + coords[bi, :, 1]
        _, first = np.unique(cells, return_index=True)
        keep = np.zeros(m, bool)
        keep[first] = True
        mask[bi] = keep
    coords_j, mask_j = jnp.asarray(coords), jnp.asarray(mask)
    occ = W.occupancy_from_coords(coords_j, mask_j, (ny, nx))
    c2t = W.build_cell2tok(coords_j, mask_j, (ny, nx))
    tcell = W.token_cell_index(coords_j, mask_j, (ny, nx))
    plan = W.joint_plan_to_tokens(
        W.build_joint_plan(occ, (ny, nx), (8, 8), (4, 4), PACKED, 512),
        c2t, tcell, m)
    rows = jnp.asarray(rng.randn(b, m, c).astype(np.float32))
    flat = W.joint_gather_rows(rows, plan)
    back = W.joint_scatter_rows(rows, plan, flat)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rows), rtol=1e-6)


def test_joint_canvas_shift_block_matches_bucket():
    """CanvasShiftBlock on joint plans == on per-level plans (same params),
    for tokens covered by both shifts in both packings."""
    from gdmae_tpu.models.model_utils.sst_layers import CanvasShiftBlock

    rng = np.random.RandomState(4)
    b, m, c = 2, 120, 64
    ny, nx = 32, 32
    coords = np.stack([rng.randint(0, ny, (b, m)),
                       rng.randint(0, nx, (b, m))], -1)
    for bi in range(b):
        cells = coords[bi, :, 0] * nx + coords[bi, :, 1]
        _, first = np.unique(cells, return_index=True)
        keep = np.zeros(m, bool)
        keep[first] = True
        coords[bi, ~keep, 0] = ny - 1
        coords[bi, ~keep, 1] = nx - 1
    mask = np.ones((b, m), bool)
    coords_j, mask_j = jnp.asarray(coords), jnp.asarray(mask)
    occ = W.occupancy_from_coords(coords_j, mask_j, (ny, nx))
    c2t = W.build_cell2tok(coords_j, mask_j, (ny, nx))
    tcell = W.token_cell_index(coords_j, mask_j, (ny, nx))
    caps = tuple(W.cap_align(min(s.max_tokens, 64)) * 4 for s in PACKED)
    shifts = ((0, 0), (4, 4))
    bplans = [W.plan_to_tokens(
        W.build_bucket_plan(occ, (ny, nx), (8, 8), sh, PACKED, caps),
        c2t, tcell, m) for sh in shifts]
    jplans = [W.joint_plan_to_tokens(
        W.build_joint_plan(occ, (ny, nx), (8, 8), sh, PACKED, 512),
        c2t, tcell, m) for sh in shifts]
    for p in bplans + jplans:
        assert int(p.overflow) == 0

    rows = jnp.asarray(rng.randn(b, m, c).astype(np.float32))
    blk = CanvasShiftBlock(d_model=c, nhead=4, dim_feedforward=96,
                           window=(8, 8), cosine=True, tau_min=0.01)
    variables = blk.init(jax.random.PRNGKey(0), rows, bplans)
    out_b = blk.apply(variables, rows, bplans)
    out_j = blk.apply(variables, rows, jplans)
    np.testing.assert_allclose(np.asarray(out_j), np.asarray(out_b),
                               rtol=3e-5, atol=3e-5)


def test_pos_fold_matches_materialized_pos():
    """TPU_POS_FOLD: folding the window pos-embed into the qkv projections
    (one (C, 3C) dot + table add, sst_layers.CosineMultiheadAttention) is
    numerically equivalent to materializing the packed pos and paying the
    separate (feats+pos) @ W_qk dot — values AND parameter gradients, same
    parameter tree."""
    from gdmae_tpu.models.model_utils.sst_layers import CanvasShiftBlock

    rng = np.random.RandomState(9)
    b, m, c = 2, 96, 64
    ny, nx = 32, 32
    coords = np.stack([rng.randint(0, ny, (b, m)),
                       rng.randint(0, nx, (b, m))], -1)
    for bi in range(b):
        cells = coords[bi, :, 0] * nx + coords[bi, :, 1]
        _, first = np.unique(cells, return_index=True)
        keep = np.zeros(m, bool)
        keep[first] = True
        coords[bi, ~keep, 0] = ny - 1
        coords[bi, ~keep, 1] = nx - 1
    mask = np.ones((b, m), bool)
    coords_j, mask_j = jnp.asarray(coords), jnp.asarray(mask)
    occ = W.occupancy_from_coords(coords_j, mask_j, (ny, nx))
    c2t = W.build_cell2tok(coords_j, mask_j, (ny, nx))
    tcell = W.token_cell_index(coords_j, mask_j, (ny, nx))
    jplans = [W.joint_plan_to_tokens(
        W.build_joint_plan(occ, (ny, nx), (8, 8), sh, PACKED, 512),
        c2t, tcell, m) for sh in ((0, 0), (4, 4))]
    for p in jplans:
        assert int(p.overflow) == 0

    rows = jnp.asarray(rng.randn(b, m, c).astype(np.float32))
    blk_ref = CanvasShiftBlock(d_model=c, nhead=4, dim_feedforward=96,
                               window=(8, 8), cosine=True, tau_min=0.01)
    blk_fold = CanvasShiftBlock(d_model=c, nhead=4, dim_feedforward=96,
                                window=(8, 8), cosine=True, tau_min=0.01,
                                pos_fold=True)
    variables = blk_ref.init(jax.random.PRNGKey(1), rows, jplans)
    ka = sorted(jax.tree_util.keystr(p) for p, _ in
                jax.tree_util.tree_flatten_with_path(
                    blk_fold.init(jax.random.PRNGKey(1), rows,
                                  jplans)["params"])[0])
    kb = sorted(jax.tree_util.keystr(p) for p, _ in
                jax.tree_util.tree_flatten_with_path(variables["params"])[0])
    assert ka == kb  # checkpoint-identical

    def loss(blk, params):
        out = blk.apply({"params": params}, rows, jplans)
        return (out.astype(jnp.float32) ** 2).sum(), out

    (l_r, out_r), g_r = jax.value_and_grad(
        lambda p: loss(blk_ref, p), has_aux=True)(variables["params"])
    (l_f, out_f), g_f = jax.value_and_grad(
        lambda p: loss(blk_fold, p), has_aux=True)(variables["params"])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)
    for (pa, ga), (pb, gb) in zip(
            jax.tree_util.tree_flatten_with_path(g_r)[0],
            jax.tree_util.tree_flatten_with_path(g_f)[0]):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(gb), np.asarray(ga), rtol=2e-4, atol=2e-4,
            err_msg=jax.tree_util.keystr(pa))


def test_joint_plan_dense_covers_and_aligns():
    """Dense (NFD) packing keeps every invariant of the pow2 layout:
    exact coverage, exact inverse, window integrity, and no window
    straddles a 128-token attention block."""
    rng = np.random.RandomState(5)
    b, ny, nx = 2, 40, 48
    occ = _rand_occ(rng, b, ny, nx)
    budget = 1024
    for shift in ((0, 0), (4, 4)):
        plan = W.build_joint_plan(occ, (ny, nx), (8, 8), shift, PACKED,
                                  budget, dense_pack=True)
        assert int(plan.overflow) == 0
        src = np.asarray(plan.tok_src)
        val = np.asarray(plan.tok_valid)
        wid = np.asarray(plan.wid)
        inv = np.asarray(plan.inv_idx)
        occ_np = np.asarray(occ).reshape(b, ny * nx)
        for bi in range(b):
            cells = src[bi][val[bi]]
            assert len(set(cells.tolist())) == len(cells)
            assert set(cells.tolist()) == \
                set(np.nonzero(occ_np[bi])[0].tolist())
            for cell in np.nonzero(occ_np[bi])[0]:
                pos = inv[bi, cell]
                assert pos < budget and src[bi, pos] == cell
            for wi in set(wid[bi][val[bi]].tolist()):
                slots = np.nonzero(wid[bi] == wi)[0]
                lo, hi = slots.min(), slots.max()
                assert hi - lo < 128 and lo // 128 == hi // 128, (wi, lo, hi)


def test_joint_dense_shift_block_matches_pow2():
    """CanvasShiftBlock outputs are IDENTICAL under dense and pow2 joint
    packing at zero overflow (the layout changes, the math does not)."""
    from gdmae_tpu.models.model_utils.sst_layers import CanvasShiftBlock

    rng = np.random.RandomState(6)
    b, ny, nx, m, c = 2, 32, 32, 96, 32
    coords = np.stack([rng.randint(0, ny, (b, m)),
                       rng.randint(0, nx, (b, m))], -1)
    mask = np.ones((b, m), bool)
    for bi in range(b):
        cells = coords[bi, :, 0] * nx + coords[bi, :, 1]
        _, first = np.unique(cells, return_index=True)
        keep = np.zeros(m, bool)
        keep[first] = True
        mask[bi] = keep
    coords_j, mask_j = jnp.asarray(coords), jnp.asarray(mask)
    occ = W.occupancy_from_coords(coords_j, mask_j, (ny, nx))
    c2t = W.build_cell2tok(coords_j, mask_j, (ny, nx))
    tcell = W.token_cell_index(coords_j, mask_j, (ny, nx))
    rows = jnp.asarray(rng.randn(b, m, c).astype(np.float32))

    outs = {}
    for dense in (False, True):
        plans = [
            W.joint_plan_to_tokens(
                W.build_joint_plan(occ, (ny, nx), (8, 8), s, PACKED, 512,
                                   dense_pack=dense), c2t, tcell, m)
            for s in ((0, 0), (4, 4))
        ]
        assert all(int(p.overflow) == 0 for p in plans)
        blk = CanvasShiftBlock(d_model=c, nhead=4, dim_feedforward=64,
                               window=(8, 8))
        import jax
        var = blk.init(jax.random.PRNGKey(0), rows, plans)
        outs[dense] = np.asarray(blk.apply(var, rows, plans))
    np.testing.assert_allclose(outs[False], outs[True], rtol=2e-5,
                               atol=2e-5)
