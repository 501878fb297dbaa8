"""Oracle tests: gather-based token conv == dense conv on the scattered
canvas; token-space bucket plans == canvas-space plans."""
import jax
import jax.numpy as jnp
import numpy as np

from gdmae_tpu.ops import token_conv, window as window_ops


def _random_sites(rng, b, m, ny, nx):
    """Unique per-sample active cells in raster order (the pipeline
    invariant: pillarization and occupancy compaction are raster-sorted),
    (B, M, 2) coords + (B, M) mask."""
    coords = np.zeros((b, m, 2), np.int32)
    mask = np.zeros((b, m), bool)
    for i in range(b):
        n = rng.randint(m // 2, m + 1)
        cells = np.sort(rng.choice(ny * nx, size=n, replace=False))
        coords[i, :n, 0] = cells // nx
        coords[i, :n, 1] = cells % nx
        mask[i, :n] = True
    return jnp.asarray(coords), jnp.asarray(mask)


def _dense_conv(canvas, w, stride):
    # torch-style symmetric padding k//2 (the production convention — see
    # blocks.ConvBNReLU; SAME == this at stride 1, misaligned at stride 2)
    p = w.shape[0] // 2
    return jax.lax.conv_general_dilated(
        canvas, w, (stride, stride), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_gather_conv2d_matches_dense_submanifold():
    rng = np.random.RandomState(0)
    b, m, ny, nx, cin, cout = 2, 40, 17, 13, 6, 5
    coords, mask = _random_sites(rng, b, m, ny, nx)
    tokens = jnp.asarray(rng.randn(b, m, cin).astype(np.float32))
    tokens = tokens * mask[..., None]
    w = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)

    from gdmae_tpu.models.backbones_3d.spt_backbone import (
        scatter_pillars_to_canvas)
    canvas, occ = scatter_pillars_to_canvas(tokens, coords, mask, (ny, nx))
    dense = _dense_conv(canvas, w, 1)
    # dense output sampled at the token sites
    flat = dense.reshape(b, ny * nx, cout)
    idx = coords[..., 0] * nx + coords[..., 1]
    want = jnp.take_along_axis(flat, idx[..., None], axis=1)
    want = want * mask[..., None]

    c2t = window_ops.build_cell2tok(coords, mask, (ny, nx))
    got = token_conv.gather_conv2d(
        tokens, c2t, (ny, nx), coords, mask, w, stride=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gather_conv2d_matches_dense_strided():
    rng = np.random.RandomState(1)
    for ny, nx in [(16, 12), (17, 13)]:  # even and odd grids
        b, m, cin, cout, s = 2, 30, 4, 7, 2
        coords, mask = _random_sites(rng, b, m, ny, nx)
        tokens = jnp.asarray(rng.randn(b, m, cin).astype(np.float32))
        tokens = tokens * mask[..., None]
        w = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)

        from gdmae_tpu.models.backbones_3d.spt_backbone import (
            scatter_pillars_to_canvas)
        from gdmae_tpu.models.model_utils.blocks import dilate_occupancy
        canvas, occ = scatter_pillars_to_canvas(tokens, coords, mask, (ny, nx))
        occ_out = dilate_occupancy(occ, 3, s)
        ny2, nx2 = occ_out.shape[1], occ_out.shape[2]
        coords_out, mask_out = window_ops.compact_occupancy(occ_out, ny2 * nx2)

        dense = _dense_conv(canvas, w, s)
        flat = dense.reshape(b, ny2 * nx2, cout)
        idx = (coords_out[..., 0] * nx2 + coords_out[..., 1]).clip(0, ny2 * nx2 - 1)
        want = jnp.take_along_axis(flat, idx[..., None], axis=1)
        want = want * mask_out[..., None]

        c2t = window_ops.build_cell2tok(coords, mask, (ny, nx))
        got = token_conv.gather_conv2d(
            tokens, c2t, (ny, nx), coords_out, mask_out, w, stride=s)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_compact_occupancy_roundtrip():
    rng = np.random.RandomState(2)
    occ = jnp.asarray(rng.rand(3, 9, 11) < 0.3)
    coords, mask = window_ops.compact_occupancy(occ, 40)
    # every active cell appears exactly once
    got = window_ops.occupancy_from_coords(coords, mask, (9, 11))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(occ))
    assert int(mask.sum()) == int(occ.sum())


def test_plan_to_tokens_matches_canvas_plan():
    rng = np.random.RandomState(3)
    b, m, ny, nx, c = 2, 60, 24, 16, 8
    coords, mask = _random_sites(rng, b, m, ny, nx)
    tokens = jnp.asarray(rng.randn(b, m, c).astype(np.float32))
    tokens = tokens * mask[..., None]
    occ = window_ops.occupancy_from_coords(coords, mask, (ny, nx))

    from gdmae_tpu.models.backbones_3d.spt_backbone import (
        scatter_pillars_to_canvas)
    canvas, _ = scatter_pillars_to_canvas(tokens, coords, mask, (ny, nx))

    drop = (window_ops.DropSpec(4, 0, 4), window_ops.DropSpec(16, 4, 100000))
    caps = (64, 32)
    for shift in ((0, 0), (4, 4)):
        plan = window_ops.build_bucket_plan(
            occ, (ny, nx), (8, 8), shift, drop, caps)
        c2t = window_ops.build_cell2tok(coords, mask, (ny, nx))
        tcell = window_ops.token_cell_index(coords, mask, (ny, nx))
        tplan = window_ops.plan_to_tokens(plan, c2t, tcell, m)

        # bucket contents must be identical
        canvas_buckets = window_ops.gather_buckets(canvas, plan)
        token_buckets = window_ops.gather_bucket_rows(tokens, tplan)
        for cb, tb, cv, tv in zip(canvas_buckets, token_buckets,
                                  plan.tok_valid, tplan.tok_valid):
            np.testing.assert_array_equal(np.asarray(cv), np.asarray(tv))
            np.testing.assert_allclose(np.asarray(cb), np.asarray(tb),
                                       rtol=1e-6, atol=1e-6)

        # writeback must agree at token rows
        upd = [bf * 2.0 + 1.0 for bf in canvas_buckets]
        for u, tv in zip(upd, plan.tok_valid):
            u = u * tv[..., None]
        canvas2 = window_ops.scatter_buckets(canvas, plan, upd)
        rows2 = window_ops.scatter_bucket_rows(tokens, tplan, upd)
        flat2 = canvas2.reshape(b, ny * nx, c)
        idx = coords[..., 0] * nx + coords[..., 1]
        want = jnp.take_along_axis(flat2, idx[..., None], axis=1)
        got = rows2
        sel = np.asarray(mask)
        np.testing.assert_allclose(np.asarray(got)[sel], np.asarray(want)[sel],
                                   rtol=1e-6, atol=1e-6)


def test_gather_conv2d_custom_vjp_matches_autodiff():
    rng = np.random.RandomState(5)
    for s in (1, 2):
        b, m, ny, nx, cin, cout = 2, 24, 13, 11, 4, 6
        coords, mask = _random_sites(rng, b, m, ny, nx)
        tokens = jnp.asarray(rng.randn(b, m, cin).astype(np.float32))
        tokens = tokens * mask[..., None]
        w = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)
        from gdmae_tpu.models.model_utils.blocks import dilate_occupancy
        occ = window_ops.occupancy_from_coords(coords, mask, (ny, nx))
        occ_out = dilate_occupancy(occ, 3, s)
        ny2, nx2 = occ_out.shape[1], occ_out.shape[2]
        coords_out, mask_out = window_ops.compact_occupancy(occ_out, ny2 * nx2)
        c2t = window_ops.build_cell2tok(coords, mask, (ny, nx))

        def f_custom(t, ww):
            y = token_conv.gather_conv2d(
                t, c2t, (ny, nx), coords_out, mask_out, ww, stride=s,
                coords_in=coords, mask_in=mask)
            return (y ** 2).sum()

        def f_plain(t, ww):
            y = token_conv.gather_conv2d(
                t, c2t, (ny, nx), coords_out, mask_out, ww, stride=s)
            return (y ** 2).sum()

        g1t, g1w = jax.grad(f_custom, argnums=(0, 1))(tokens, w)
        g2t, g2w = jax.grad(f_plain, argnums=(0, 1))(tokens, w)
        # plain path gradient includes masked-out token rows' contributions
        # through clipped indices only for invalid rows -> compare on valid
        sel = np.asarray(mask)
        np.testing.assert_allclose(np.asarray(g1t)[sel], np.asarray(g2t)[sel],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g1w), np.asarray(g2w),
                                   rtol=1e-4, atol=1e-5)


def test_canvas_place_gather_custom_vjp():
    rng = np.random.RandomState(6)
    b, m, ny, nx, c = 2, 20, 9, 8, 3
    coords, mask = _random_sites(rng, b, m, ny, nx)
    tokens = jnp.asarray(rng.randn(b, m, c).astype(np.float32))
    tokens = tokens * mask[..., None]
    from gdmae_tpu.models.backbones_3d import spt_backbone as SB

    def f(t):
        canvas, occ = SB.scatter_pillars_to_canvas(t, coords, mask, (ny, nx))
        canvas = canvas * 2.0 + 1.0
        back = SB.gather_canvas_at(canvas, coords, (ny, nx), mask=mask)
        return (back ** 2).sum() + (canvas ** 2).sum()

    def f_plain(t):
        m_ = m
        flat = coords[..., 0] * nx + coords[..., 1]
        flat = jnp.where(mask, flat, ny * nx)
        pad = jnp.concatenate([t, jnp.zeros((b, 1, c), t.dtype)], axis=1)
        inv = window_ops.build_cell2tok(coords, mask, (ny, nx))
        canvas = jnp.take_along_axis(pad, inv[..., None], axis=1)
        canvas = canvas * 2.0 + 1.0
        idx = (coords[..., 0] * nx + coords[..., 1]).clip(0, ny * nx - 1)
        back = jnp.take_along_axis(canvas, idx[..., None], axis=1)
        back = back * mask[..., None]
        return (back ** 2).sum() + (canvas ** 2).sum()

    g1 = jax.grad(f)(tokens)
    g2 = jax.grad(f_plain)(tokens)
    sel = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(g1)[sel], np.asarray(g2)[sel],
                               rtol=1e-5, atol=1e-6)


def test_canvas_scatter_unsorted_coords():
    """ADVICE r4 (high): PointPillarScatter passes FIRST-COME (non-raster)
    pillar coords with sorted_cells=False; the row-scatter path must not
    claim indices_are_sorted for them.  Oracle: per-cell numpy placement."""
    rng = np.random.RandomState(7)
    b, m, ny, nx, c = 2, 48, 11, 9, 5
    coords = np.zeros((b, m, 2), np.int32)
    mask = np.zeros((b, m), bool)
    for i in range(b):
        n = rng.randint(m // 2, m + 1)
        cells = rng.choice(ny * nx, size=n, replace=False)  # NOT sorted
        coords[i, :n, 0] = cells // nx
        coords[i, :n, 1] = cells % nx
        mask[i, :n] = True
    feats = rng.randn(b, m, c).astype(np.float32) * mask[..., None]

    from gdmae_tpu.models.backbones_3d.spt_backbone import (
        scatter_pillars_to_canvas)
    canvas, occ = scatter_pillars_to_canvas(
        jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(mask),
        (ny, nx), sorted_cells=False)

    want = np.zeros((b, ny, nx, c), np.float32)
    wocc = np.zeros((b, ny, nx), bool)
    for i in range(b):
        for j in range(m):
            if mask[i, j]:
                want[i, coords[i, j, 0], coords[i, j, 1]] = feats[i, j]
                wocc[i, coords[i, j, 0], coords[i, j, 1]] = True
    np.testing.assert_allclose(np.asarray(canvas), want, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(occ), wocc)

    # gradient path: cotangent at each cell must flow back to its token
    def f(t):
        cv, _ = scatter_pillars_to_canvas(
            t, jnp.asarray(coords), jnp.asarray(mask), (ny, nx),
            sorted_cells=False)
        return (cv ** 2).sum()

    g = np.asarray(jax.grad(f)(jnp.asarray(feats)))
    np.testing.assert_allclose(g[mask], 2.0 * feats[mask],
                               rtol=1e-6, atol=1e-6)
