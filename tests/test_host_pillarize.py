"""Host (numpy) pillarize + MAE target build must match the device path.

The loader precomputes the MAE mask and GT point groups positionally
(datasets.processor.host_pillarize), so pillar slot order, point order
within pillars, capacity clipping, and the decode-set enumeration must be
IDENTICAL to ops.scatter.dynamic_pillarize + SPTBackboneMAE's device
fallback grouping.
"""
import numpy as np
import jax.numpy as jnp

from gdmae_tpu.datasets.processor.host_pillarize import (
    mae_host_targets, pillarize_np,
)
from gdmae_tpu.ops import scatter

PC_RANGE = np.array([0, -39.68, -3, 69.12, 39.68, 1], np.float32)
VOXEL = np.array([0.32, 0.32, 4], np.float32)
GRID = (216, 248)


def _clustered_scan(rng, n):
    """LiDAR-like clustered points, some out of range, some padding."""
    centers = rng.uniform([5, -30, -2], [60, 30, 0], size=(12, 3))
    idx = rng.randint(0, 12, n)
    pts = centers[idx] + rng.randn(n, 3) * [2.0, 2.0, 0.4]
    pts[: n // 20] = rng.uniform([-5, -45, -4], [75, 45, 2], (n // 20, 3))
    mask = np.ones(n, bool)
    mask[-n // 10:] = False
    return pts.astype(np.float32), mask


def test_pillarize_np_matches_device():
    rng = np.random.RandomState(3)
    n, cap = 4096, 512  # cap < pillar count on this scan -> clipping covered
    pts, mask = _clustered_scan(rng, n)
    host = pillarize_np(pts, mask, PC_RANGE, VOXEL, GRID, cap)
    assert host["num_pillars"] > cap, "want capacity clipping exercised"
    dev = scatter.dynamic_pillarize(
        jnp.asarray(pts), jnp.asarray(mask), PC_RANGE, VOXEL, GRID, cap)
    np.testing.assert_array_equal(host["order"], np.asarray(dev.point_order))
    np.testing.assert_array_equal(
        host["point_pillar"], np.asarray(dev.point_pillar))
    np.testing.assert_array_equal(
        host["pillar_coords"], np.asarray(dev.pillar_coords))
    np.testing.assert_array_equal(
        host["pillar_mask"], np.asarray(dev.pillar_mask))
    np.testing.assert_array_equal(
        host["pillar_start"], np.asarray(dev.pillar_start))
    np.testing.assert_array_equal(
        host["pillar_count"], np.asarray(dev.pillar_count))


def test_mae_host_targets_match_device_grouping():
    """Host GT sets == the device fallback grouping at the same mask."""
    rng = np.random.RandomState(7)
    b, n, cap, num_gt, m_dec = 2, 2048, 1024, 16, 808
    pts = np.stack([_clustered_scan(rng, n)[0] for _ in range(b)])
    pmask = np.ones((b, n), bool)
    host = mae_host_targets(pts, pmask, PC_RANGE, VOXEL, GRID, cap,
                            mask_ratio=0.75, num_gt=num_gt, m_dec=m_dec,
                            rng=np.random.default_rng(0))
    mae_mask = host["host_mae_mask"]

    for s in range(b):
        res = scatter.dynamic_pillarize(
            jnp.asarray(pts[s]), jnp.asarray(pmask[s]), PC_RANGE, VOXEL,
            GRID, cap)
        valid = np.asarray(res.pillar_mask)
        # mask semantics: invalid slots masked, keep count = floor(n*(1-r))
        assert (mae_mask[s][~valid] == 1.0).all()
        n_valid = int(valid.sum())
        assert int((mae_mask[s][valid] == 0).sum()) == int(n_valid * 0.25)

        # device fallback grouping (as in SPTBackboneMAE.compact_dec)
        sorted_pts = jnp.asarray(pts[s])[res.point_order]
        full, full_mask = scatter.group_points_padded(sorted_pts, res, num_gt)
        dec = np.nonzero((mae_mask[s] > 0) & valid)[0][:m_dec]
        # host GT ships pillar-center-RELATIVE f16 (the exact quantity the
        # chamfer consumes; ±few m offsets -> f16 atol ≲5e-3)
        coords = np.asarray(res.pillar_coords)[dec]
        centers = np.stack([
            (coords[:, 1] + 0.5) * VOXEL[0] + PC_RANGE[0],
            (coords[:, 0] + 0.5) * VOXEL[1] + PC_RANGE[1],
            np.full(len(dec), 0.5 * VOXEL[2] + PC_RANGE[2]),
        ], axis=-1).astype(np.float32)
        fm = np.asarray(full_mask)[dec]
        expect = (np.asarray(full)[dec] - centers[:, None, :]) * fm[..., None]
        np.testing.assert_allclose(
            host["host_mae_gt_rel"][s, : len(dec)].astype(np.float32),
            expect, rtol=0, atol=6e-3)
        np.testing.assert_array_equal(
            host["host_mae_gt_mask"][s, : len(dec)], fm)
        np.testing.assert_array_equal(host["host_mae_dec_idx"][s, :len(dec)],
                                      dec)
        # padding rows past the real decode count stay zero/false
        assert not host["host_mae_gt_mask"][s, len(dec):].any()


def test_dynvfe_host_pillarize_matches_device():
    """DynVFE with loader-precomputed tables == the all-device path."""
    import jax
    from gdmae_tpu.datasets.processor.host_pillarize import pillarize_batch_np
    from gdmae_tpu.models.vfe.dyn_vfe import DynVFE

    rng = np.random.RandomState(5)
    b, n, cap = 2, 1024, 512
    pts4 = np.zeros((b, n, 4), np.float32)
    pmask = np.ones((b, n), bool)
    for s in range(b):
        xyz, msk = _clustered_scan(rng, n)
        pts4[s, :, :3] = xyz
        pts4[s, :, 3] = rng.rand(n)
        pmask[s] = msk

    cfg = {"TYPE": "mean", "MLPS": [[16, 32]], "AGGREGATION_MLPS": [32],
           "USE_ABSLOTE_XYZ": True, "USE_CLUSTER_XYZ": True}
    vfe = DynVFE(model_cfg=cfg, num_point_features=4,
                 point_cloud_range=tuple(PC_RANGE), voxel_size=tuple(VOXEL),
                 grid_size=GRID, max_pillars=cap)

    dev_batch = {"points": jnp.asarray(pts4), "point_mask": jnp.asarray(pmask)}
    variables = vfe.init({"params": jax.random.PRNGKey(0)},
                         dict(dev_batch), train=False)
    out_dev = vfe.apply(variables, dict(dev_batch), train=False)

    tabs, pts_s, pm_s = pillarize_batch_np(
        pts4, pmask, PC_RANGE, VOXEL, GRID, cap)
    host_batch = {"points": jnp.asarray(pts_s),
                  "point_mask": jnp.asarray(pm_s)}
    host_batch.update({k: jnp.asarray(v) for k, v in tabs.items()})
    out_host = vfe.apply(variables, host_batch, train=False)

    for key in ("pillar_features", "pillar_coords", "pillar_mask", "points",
                "point_pillar", "point_valid"):
        np.testing.assert_allclose(
            np.asarray(out_dev[key]), np.asarray(out_host[key]),
            rtol=1e-6, atol=1e-6, err_msg=key)


def test_dynvfe_host_features_match_device():
    """DynVFE fed loader-precomputed per-point MLP features
    (vfe_host_features) == the in-graph feature build, including the
    WITH_DISTANCE branch and train-mode BN statistics."""
    import jax
    from gdmae_tpu.datasets.processor.host_pillarize import (
        pillarize_batch_np, vfe_host_features_cfg)
    from gdmae_tpu.models.vfe.dyn_vfe import DynVFE

    rng = np.random.RandomState(11)
    b, n, cap = 2, 1024, 512
    pts4 = np.zeros((b, n, 4), np.float32)
    pmask = np.ones((b, n), bool)
    for s in range(b):
        xyz, msk = _clustered_scan(rng, n)
        pts4[s, :, :3] = xyz
        pts4[s, :, 3] = rng.rand(n)
        pmask[s] = msk

    cfg = {"TYPE": "mean", "MLPS": [[16, 32]],
           "USE_ABSLOTE_XYZ": True, "USE_CLUSTER_XYZ": True,
           "WITH_DISTANCE": True}
    vfe = DynVFE(model_cfg=cfg, num_point_features=4,
                 point_cloud_range=tuple(PC_RANGE), voxel_size=tuple(VOXEL),
                 grid_size=GRID, max_pillars=cap)

    tabs, pts_s, pm_s = pillarize_batch_np(
        pts4, pmask, PC_RANGE, VOXEL, GRID, cap)
    base = {"points": jnp.asarray(pts_s), "point_mask": jnp.asarray(pm_s)}
    base.update({k: jnp.asarray(v) for k, v in tabs.items()})
    variables = vfe.init({"params": jax.random.PRNGKey(0)},
                         dict(base), train=False)

    hostf = vfe_host_features_cfg(cfg, pts_s, pm_s, tabs, PC_RANGE, VOXEL)
    assert set(hostf) == {"host_vfe_pf"}
    with_pf = dict(base)
    with_pf.update({k: jnp.asarray(v) for k, v in hostf.items()})

    # train=True so the masked-BN batch statistics (which see the pf
    # tensor directly) are covered as well as the outputs
    out_dev, stats_dev = vfe.apply(
        variables, dict(base), train=True, mutable=["batch_stats"])
    out_host, stats_host = vfe.apply(
        variables, with_pf, train=True, mutable=["batch_stats"])

    for key in ("pillar_features", "pillar_coords", "pillar_mask",
                "point_pillar", "point_valid"):
        np.testing.assert_allclose(
            np.asarray(out_dev[key]), np.asarray(out_host[key]),
            rtol=1e-5, atol=1e-5, err_msg=key)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-5),
        stats_dev, stats_host)

    # opt-out gate
    assert vfe_host_features_cfg(
        {"TYPE": "mean", "MLPS": [[16]], "TPU_HOST_VFE": False},
        pts_s, pm_s, tabs, PC_RANGE, VOXEL) == {}
    # non-mean sampling keeps the in-graph build
    assert vfe_host_features_cfg(
        {"TYPE": "nearest", "MLPS": [[16]]},
        pts_s, pm_s, tabs, PC_RANGE, VOXEL) == {}
