"""Host (numpy) window-plan builders must match the in-graph jax builders
bit-exactly (ops/window_host.py vs ops/window.py), and the model must
produce IDENTICAL outputs when fed loader-precomputed plans."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gdmae_tpu.config import EasyDict, cfg_from_yaml_file
from gdmae_tpu.ops import window as w
from gdmae_tpu.ops import window_host as wh


def _occ(rng, b, ny, nx, density=0.08):
    occ = rng.rand(b, ny, nx) < density
    occ[:, : ny // 4, : nx // 4] |= rng.rand(b, ny // 4, nx // 4) < 0.5
    return occ


@pytest.mark.parametrize("shift", [(0, 0), (4, 4), (3, 5)])
def test_joint_plan_exact(shift):
    rng = np.random.RandomState(0)
    ny, nx = 40, 56
    occ = _occ(rng, 3, ny, nx)
    specs = w.packing_specs(
        (w.DropSpec(16, 1, 8), w.DropSpec(32, 8, 33), w.DropSpec(64, 33, 65)),
        64)
    budget = 1024
    jp = w.build_joint_plan(jnp.asarray(occ), (ny, nx), (8, 8), shift,
                            specs, budget)
    hp = wh.build_joint_plan_np(occ, (ny, nx), (8, 8), shift, specs, budget)
    np.testing.assert_array_equal(np.asarray(jp.tok_src), hp["tok_src"])
    np.testing.assert_array_equal(np.asarray(jp.tok_valid), hp["tok_valid"])
    np.testing.assert_array_equal(np.asarray(jp.tok_incell),
                                  hp["tok_incell"])
    np.testing.assert_array_equal(np.asarray(jp.wid), hp["wid"])
    np.testing.assert_array_equal(np.asarray(jp.inv_idx), hp["inv_idx"])
    assert int(jp.overflow) == int(hp["overflow"])


def test_joint_plan_overflow_exact():
    rng = np.random.RandomState(1)
    occ = _occ(rng, 2, 32, 32, density=0.6)
    specs = (w.DropSpec(64, 1, 65),)
    jp = w.build_joint_plan(jnp.asarray(occ), (32, 32), (8, 8), (0, 0),
                            specs, 256)  # small budget -> overflow
    hp = wh.build_joint_plan_np(occ, (32, 32), (8, 8), (0, 0), specs, 256)
    assert int(jp.overflow) == int(hp["overflow"]) > 0
    np.testing.assert_array_equal(np.asarray(jp.tok_src), hp["tok_src"])
    np.testing.assert_array_equal(np.asarray(jp.inv_idx), hp["inv_idx"])


def test_occupancy_helpers_exact():
    from gdmae_tpu.models.model_utils.blocks import dilate_occupancy

    rng = np.random.RandomState(2)
    occ = _occ(rng, 2, 30, 44)
    for stride in (1, 2):
        d_j = np.asarray(dilate_occupancy(jnp.asarray(occ), 3, stride))
        d_n = wh.dilate_occupancy_np(occ, 3, stride)
        np.testing.assert_array_equal(d_j, d_n)
    cj, mj = w.compact_occupancy(jnp.asarray(occ), 64)
    cn, mn = wh.compact_occupancy_np(occ, 64)
    np.testing.assert_array_equal(np.asarray(mj), mn)
    np.testing.assert_array_equal(np.asarray(cj)[mn], cn[mn])
    c2t_j = np.asarray(w.build_cell2tok(cj, mj, (30, 44)))
    c2t_n = wh.cell2tok_np(cn, mn, (30, 44))
    np.testing.assert_array_equal(c2t_j, c2t_n)


def test_mae_graph_identical_with_host_plans():
    """Full gd_mae_ssl forward+loss with loader plans == without (the plans
    are the same indices, so the graphs must agree bit-for-bit on CPU)."""
    from pathlib import Path
    from gdmae_tpu.models.detectors.detector3d_template import (
        DatasetMeta, build_network)
    from gdmae_tpu.runtime import train as train_lib
    from gdmae_tpu.datasets.processor.host_pillarize import (
        pillarize_batch_np, mae_host_targets)
    from gdmae_tpu.models.backbones_3d.spt_backbone import (
        mae_dec_cap, mae_enc_cap)

    repo = Path(__file__).resolve().parent.parent
    cfg = cfg_from_yaml_file(
        str(repo / "tools/cfgs/kitti_models/gd_mae_ssl.yaml"))
    b3d = cfg.MODEL.BACKBONE_3D
    b3d.pop("TPU_WINDOW_CAPS", None)
    b3d.TPU_WINDOW_MODE = "joint"
    b3d.TPU_JOINT_BUDGETS = [256, 256, 128]
    b3d.TPU_PACK_POW2 = True
    meta = DatasetMeta(
        class_names=["Car", "Pedestrian", "Cyclist"],
        point_cloud_range=[0, -10.24, -3, 20.48, 10.24, 1],
        voxel_size=[0.32, 0.32, 4],
        grid_size=[64, 64],
        num_point_features=4,
        max_points=2048,
        max_pillars=1024,
    )
    rng = np.random.RandomState(3)
    pts = np.zeros((1, 2048, 4), np.float32)
    pts[..., 0] = rng.uniform(0.5, 20, (1, 2048))
    pts[..., 1] = rng.uniform(-10, 10, (1, 2048))
    pts[..., 2] = rng.uniform(-2.5, 0.5, (1, 2048))
    pts[..., 3] = rng.uniform(0, 1, (1, 2048))
    pmask = np.ones((1, 2048), bool)
    tabs, pts_s, pmask_s = pillarize_batch_np(
        pts, pmask, meta.point_cloud_range, meta.voxel_size,
        meta.grid_size, meta.max_pillars)
    host = mae_host_targets(
        pts_s, pmask_s, meta.point_cloud_range, meta.voxel_size,
        meta.grid_size, meta.max_pillars, float(b3d.MASK_CONFIG.RATIO),
        int(b3d.MASK_CONFIG.NUM_GT_POINTS),
        mae_dec_cap(b3d, meta.max_pillars), np.random.default_rng(0),
        m_enc=mae_enc_cap(b3d, meta.max_pillars))
    base = {"points": jnp.asarray(pts_s), "point_mask": jnp.asarray(pmask_s)}
    base.update({k: jnp.asarray(v) for k, v in tabs.items()})
    base.update({k: jnp.asarray(v) for k, v in host.items()})

    model = build_network(cfg.MODEL, num_class=3, dataset=meta)
    params, bs = train_lib.init_model(model, dict(base), seed=0)

    def loss_of(batch):
        out, _ = model.apply(
            {"params": params, "batch_stats": bs}, batch, train=True,
            rngs={"mae_mask": jax.random.PRNGKey(0)},
            mutable=["batch_stats"])
        return out["loss"], out["mae_pred_points"]

    # side A: device derives ALL indices itself (no host shortcuts)
    batch_a = {k: v for k, v in base.items()
               if k not in ("host_mae_dec_idx", "host_mae_keep_idx")}
    l0, p0 = loss_of(batch_a)

    plans = wh.mae_host_plans(
        b3d, tabs["host_pillar_coords"], tabs["host_pillar_mask"],
        host["host_mae_mask"], (64, 64))
    assert any(k.startswith("host_win") for k in plans)
    batch2 = dict(base)
    batch2.update({k: jnp.asarray(v) for k, v in plans.items()
                   if not np.isscalar(v) and np.ndim(v) > 0})
    l1, p1 = loss_of(batch2)

    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    assert float(l0) == float(l1)


@pytest.mark.parametrize("shift", [(0, 0), (4, 4), (3, 5)])
def test_joint_plan_dense_exact(shift):
    """TPU_JOINT_PACK: dense — host NFD layout == device lax.scan layout,
    bit-exact (including the vectorized per-size-group closed form)."""
    rng = np.random.RandomState(4)
    ny, nx = 40, 56
    occ = _occ(rng, 3, ny, nx, density=0.15)
    specs = w.packing_specs(
        (w.DropSpec(16, 1, 8), w.DropSpec(32, 8, 33), w.DropSpec(64, 33, 65)),
        64)
    budget = 1024
    jp = w.build_joint_plan(jnp.asarray(occ), (ny, nx), (8, 8), shift,
                            specs, budget, dense_pack=True)
    hp = wh.build_joint_plan_np(occ, (ny, nx), (8, 8), shift, specs, budget,
                                dense_pack=True)
    np.testing.assert_array_equal(np.asarray(jp.tok_src), hp["tok_src"])
    np.testing.assert_array_equal(np.asarray(jp.tok_valid), hp["tok_valid"])
    np.testing.assert_array_equal(np.asarray(jp.tok_incell),
                                  hp["tok_incell"])
    np.testing.assert_array_equal(np.asarray(jp.wid), hp["wid"])
    np.testing.assert_array_equal(np.asarray(jp.inv_idx), hp["inv_idx"])
    assert int(jp.overflow) == int(hp["overflow"])
    # dense really is denser: strictly more valid tokens per used block
    hp2 = wh.build_joint_plan_np(occ, (ny, nx), (8, 8), shift, specs,
                                 budget)
    used = lambda p: int(np.asarray(p["inv_idx"]).max())
    assert used(hp) <= used(hp2)
