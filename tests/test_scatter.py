"""Tests for fixed-capacity scatter/pillarization ops vs numpy oracles."""
import numpy as np
import jax
import jax.numpy as jnp

from gdmae_tpu.ops import scatter


def test_rank_within_group():
    rng = np.random.RandomState(0)
    n = 200
    gids = rng.randint(0, 20, n).astype(np.int32)
    valid = rng.rand(n) > 0.2
    ranks = np.asarray(scatter.rank_within_group(jnp.asarray(gids), jnp.asarray(valid)))
    # oracle: rank = number of previous valid elements with same group id
    seen = {}
    for i in range(n):
        if not valid[i]:
            assert ranks[i] == n
            continue
        g = gids[i]
        assert ranks[i] == seen.get(g, 0)
        seen[g] = seen.get(g, 0) + 1


def test_dynamic_pillarize_matches_numpy_unique():
    rng = np.random.RandomState(1)
    n, cap = 500, 512
    pts = rng.uniform(-5, 75, (n, 3)).astype(np.float32)
    pts[:, 1] = rng.uniform(-45, 45, n)
    pts[:, 2] = rng.uniform(-4, 2, n)
    mask = rng.rand(n) > 0.1
    pc_range = np.array([0, -39.68, -3, 69.12, 39.68, 1], np.float32)
    vsz = np.array([0.32, 0.32, 4], np.float32)
    grid = (216, 248)

    res = scatter.dynamic_pillarize(jnp.asarray(pts), jnp.asarray(mask), pc_range, vsz, grid, cap)

    ix = np.floor((pts[:, 0] - pc_range[0]) / vsz[0]).astype(int)
    iy = np.floor((pts[:, 1] - pc_range[1]) / vsz[1]).astype(int)
    iz = np.floor((pts[:, 2] - pc_range[2]) / vsz[2]).astype(int)
    in_range = (ix >= 0) & (ix < grid[0]) & (iy >= 0) & (iy < grid[1]) & (iz == 0) & mask
    lin = iy[in_range] * grid[0] + ix[in_range]
    uniq = np.unique(lin)

    num = int(res.num_pillars)
    assert num == len(uniq)
    got_coords = np.asarray(res.pillar_coords)[np.asarray(res.pillar_mask)]
    got_lin = got_coords[:, 0] * grid[0] + got_coords[:, 1]
    np.testing.assert_array_equal(np.sort(got_lin), uniq)

    # point -> pillar mapping consistent (point_pillar is in sorted order;
    # res.point_order maps sorted position -> original index)
    pp_sorted = np.asarray(res.point_pillar)
    pp = np.empty(n, np.int64)
    pp[np.asarray(res.point_order)] = pp_sorted
    for i in range(n):
        if in_range[i]:
            slot = pp[i]
            assert slot < cap
            assert got_lin[slot] if False else True
            c = np.asarray(res.pillar_coords)[slot]
            assert c[0] == iy[i] and c[1] == ix[i]
        else:
            assert pp[i] == cap

    # counts
    cnt = np.asarray(res.pillar_count)
    for slot in range(num):
        c = np.asarray(res.pillar_coords)[slot]
        expect = np.sum(in_range & (iy == c[0]) & (ix == c[1]))
        assert cnt[slot] == expect


def test_group_points_wrap():
    rng = np.random.RandomState(2)
    n, cap, k = 100, 128, 8
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = rng.uniform(0, 69, n)
    pts[:, 1] = rng.uniform(-39, 39, n)
    pts[:, 2] = rng.uniform(-2.9, 0.9, n)
    mask = np.ones(n, bool)
    pc_range = np.array([0, -39.68, -3, 69.12, 39.68, 1], np.float32)
    vsz = np.array([0.32, 0.32, 4], np.float32)
    res = scatter.dynamic_pillarize(jnp.asarray(pts), jnp.asarray(mask), pc_range, vsz, (216, 248), cap)
    vals = rng.randn(n, 3).astype(np.float32)
    out = np.asarray(scatter.group_points_wrap(jnp.asarray(vals), res, k))

    pp = np.empty(n, np.int64)
    pp[np.asarray(res.point_order)] = np.asarray(res.point_pillar)
    for slot in range(int(res.num_pillars)):
        members = np.where(pp == slot)[0]  # in original order
        expect = vals[members[np.arange(k) % len(members)]]
        np.testing.assert_allclose(out[slot], expect, rtol=1e-6)


def test_dynamic_pillarize_overflow_goes_to_trash():
    rng = np.random.RandomState(4)
    n, cap = 400, 16  # far fewer slots than pillars
    pts = rng.uniform(1, 60, (n, 3)).astype(np.float32)
    pts[:, 1] = rng.uniform(-30, 30, n)
    pts[:, 2] = -1.0
    pc_range = np.array([0, -39.68, -3, 69.12, 39.68, 1], np.float32)
    vsz = np.array([0.32, 0.32, 4], np.float32)
    res = scatter.dynamic_pillarize(
        jnp.asarray(pts), jnp.ones(n, bool), pc_range, vsz, (216, 248), cap)
    pp = np.asarray(res.point_pillar)
    assert int(res.num_pillars) > cap  # overflow detectable by caller
    assert pp.max() == cap  # spilled points land in the trash slot
    assert np.asarray(res.pillar_mask).sum() == cap


def test_random_masking_exact_count():
    key = jax.random.PRNGKey(0)
    valid = jnp.asarray(np.concatenate([np.ones(80, bool), np.zeros(20, bool)]))
    m = scatter.random_masking(key, valid, 0.85)
    m = np.asarray(m)
    # keep floor(80*0.15)=12
    assert np.sum(m[:80] == 0.0) == 12
    assert np.all(m[80:] == 1.0)


def test_segment_mean_max():
    rng = np.random.RandomState(3)
    vals = rng.randn(50, 4).astype(np.float32)
    ids = rng.randint(0, 10, 50)
    mean = np.asarray(scatter.segment_mean(jnp.asarray(vals), jnp.asarray(ids), 12))
    mx = np.asarray(scatter.segment_max(jnp.asarray(vals), jnp.asarray(ids), 12))
    for s in range(12):
        sel = vals[ids == s]
        if len(sel):
            np.testing.assert_allclose(mean[s], sel.mean(0), rtol=1e-5)
            np.testing.assert_allclose(mx[s], sel.max(0), rtol=1e-5)
        else:
            np.testing.assert_allclose(mx[s], 0.0)


def test_sorted_segment_ops_match_unsorted_and_grads():
    rng = np.random.RandomState(7)
    n, nseg, c = 300, 40, 5
    seg = np.sort(rng.randint(0, nseg, n)).astype(np.int32)
    vals = rng.randn(n, c).astype(np.float32)
    jseg = jnp.asarray(seg)

    for name, sorted_fn, ref_fn in [
        ("sum",
         lambda v: scatter.segment_sum(v, jseg, nseg, indices_are_sorted=True),
         lambda v: scatter.segment_sum(v, jseg, nseg)),
        ("mean",
         lambda v: scatter.segment_mean(v, jseg, nseg, indices_are_sorted=True),
         lambda v: scatter.segment_mean(v, jseg, nseg)),
        ("max",
         lambda v: scatter.segment_max(v, jseg, nseg, indices_are_sorted=True),
         lambda v: scatter.segment_max(v, jseg, nseg)),
    ]:
        got = np.asarray(sorted_fn(jnp.asarray(vals)))
        want = np.asarray(ref_fn(jnp.asarray(vals)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=name)
        # gradient parity (random floats -> no ties)
        import jax
        g1 = jax.grad(lambda v: (sorted_fn(v) ** 2).sum())(jnp.asarray(vals))
        g2 = jax.grad(lambda v: (ref_fn(v) ** 2).sum())(jnp.asarray(vals))
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_group_points_padded_matches_first_k():
    rng = np.random.RandomState(9)
    n, cap, k = 120, 64, 8
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = rng.uniform(0, 69, n)
    pts[:, 1] = rng.uniform(-39, 39, n)
    pts[:, 2] = rng.uniform(-2.9, 0.9, n)
    pc_range = np.array([0, -39.68, -3, 69.12, 39.68, 1], np.float32)
    vsz = np.array([0.32, 0.32, 4], np.float32)
    res = scatter.dynamic_pillarize(
        jnp.asarray(pts), jnp.ones(n, bool), pc_range, vsz, (216, 248), cap)
    # values in SORTED order (as the VFE provides them)
    vals_sorted = jnp.asarray(pts)[res.point_order]
    out, mask = scatter.group_points_padded(vals_sorted, res, k)
    out, mask = np.asarray(out), np.asarray(mask)

    pp = np.empty(n, np.int64)
    pp[np.asarray(res.point_order)] = np.asarray(res.point_pillar)
    for slot in range(min(int(res.num_pillars), cap)):
        members = np.where(pp == slot)[0]  # original order
        take = min(len(members), k)
        np.testing.assert_allclose(out[slot, :take], pts[members[:take]],
                                   rtol=1e-6)
        assert mask[slot, :take].all()
        assert not mask[slot, take:].any()
        np.testing.assert_allclose(out[slot, take:], 0.0)


def test_segment_max_grad_routes_ties_to_first(monkeypatch):
    """GDMAE_SEGMAX_BWD=exact (the torch-parity opt-in, pinned by the
    trajectory suites): the VJP sends each segment's cotangent to the FIRST
    element attaining the max (torch_scatter argmax-backward semantics,
    reference dyn_vfe.py:107-113)."""
    monkeypatch.setenv("GDMAE_SEGMAX_BWD", "exact")
    vals = jnp.asarray([[0., 1.], [0., 1.], [1., 0.], [0., 0.], [0., 0.]])
    seg = jnp.asarray([0, 0, 0, 1, 1], jnp.int32)

    g = jax.grad(
        lambda v: scatter.segment_max(v, seg, 3, indices_are_sorted=True).sum()
    )(vals)
    expect = np.array([[0., 1.],   # seg0 col1: tie 1.0 at idx 0 and 1 -> idx 0
                       [0., 0.],
                       [1., 0.],   # seg0 col0: unique max
                       [1., 1.],   # seg1: tie 0.0 at idx 3 and 4 -> idx 3
                       [0., 0.]], np.float32)
    np.testing.assert_array_equal(np.asarray(g), expect)


def test_segment_max_grad_default_splits_ties(monkeypatch):
    """Runtime default: the cotangent splits evenly across tied maxima
    (5 ms/step cheaper on v5e; identical to first-winner whenever the max
    is unique — which is always, on realistic continuous features:
    test_train_trajectory.py::test_segmax_split_gradient_deviation)."""
    monkeypatch.delenv("GDMAE_SEGMAX_BWD", raising=False)
    vals = jnp.asarray([[0., 1.], [0., 1.], [1., 0.], [0., 0.], [0., 0.]])
    seg = jnp.asarray([0, 0, 0, 1, 1], jnp.int32)

    g = jax.grad(
        lambda v: scatter.segment_max(v, seg, 3, indices_are_sorted=True).sum()
    )(vals)
    expect = np.array([[0., 0.5],
                       [0., 0.5],
                       [1., 0.],
                       [0.5, 0.5],
                       [0.5, 0.5]], np.float32)
    np.testing.assert_array_equal(np.asarray(g), expect)
