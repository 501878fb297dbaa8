"""Flagship-scale MAE-pretrain benchmark: the Waymo 468x468 grid.

Standalone so a TPU-worker crash (the tunneled chip hard-crashes instead
of raising RESOURCE_EXHAUSTED when a program over-commits HBM) kills only
THIS process — bench.py runs it via subprocess over a batch-size ladder.

Geometry from the reference tools/cfgs/dataset_configs/waymo_dataset.yaml:
POINT_CLOUD_RANGE ±74.88, voxel 0.32 -> 468x468 grid; 163840-point scans,
32768 pillar capacity; remat as the waymo yaml ships it (default on).

Usage: python tools/bench_waymo.py [batch] — prints ONE JSON line.
Env knobs mirror bench.py: GDMAE_BENCH_PACK / GDMAE_BENCH_WAYMO_MODE /
GDMAE_BENCH_WAYMO_REMAT / GDMAE_BENCH_WAYMO_SPCONV / GDMAE_BENCH_HOST_*.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    import jax
    import jax.numpy as jnp

    from gdmae_tpu.config import cfg_from_yaml_file
    from gdmae_tpu.models.detectors.detector3d_template import (
        DatasetMeta, build_network,
    )
    from gdmae_tpu.runtime import optimization, train as train_lib
    from tools.bench_common import (
        WAYMO_GEOM, joint_budgets_for, synth_scan_waymo, window_caps_for,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    wcfg = cfg_from_yaml_file(
        str(REPO / "tools/cfgs/waymo_models/gd_mae_ssl.yaml"))
    wmeta = DatasetMeta(
        class_names=wcfg.CLASS_NAMES,
        point_cloud_range=wcfg.DATA_CONFIG.POINT_CLOUD_RANGE,
        voxel_size=[0.32, 0.32, 6.0],
        grid_size=[468, 468],
        num_point_features=4,
        max_points=163840,
        max_pillars=32768,
    )
    wb3d = wcfg.MODEL.BACKBONE_3D
    wcap_pts = synth_scan_waymo(np.random.RandomState(3), 2, wmeta.max_points)
    wdrop_specs = None
    if os.environ.get("GDMAE_BENCH_PACK", "1") != "0":
        from gdmae_tpu.ops import window as window_ops

        wb3d.TPU_PACK_POW2 = True
        wb3d.TPU_PACK_MIN_T = int(os.environ.get("GDMAE_PACK_MIN_T", "1"))
        wdrop_specs = window_ops.packing_specs(
            window_ops.drop_specs_from_cfg(
                wb3d.SST_BLOCK_LIST[0].PREPROCESS.DROP_INFO["train"]),
            64, min_t=wb3d.TPU_PACK_MIN_T)
    wb3d.TPU_WINDOW_CAPS = [
        list(c) for c in window_caps_for(
            wcap_pts, drop_specs=wdrop_specs, geom=WAYMO_GEOM)]
    if os.environ.get("GDMAE_BENCH_WAYMO_MODE", "joint") == "joint":
        wb3d.TPU_WINDOW_MODE = "joint"
        # dense NFD packing by default (TPU_JOINT_PACK, r5: 139.4 ->
        # 124.5 ms at the KITTI workload); budgets re-derived per layout
        pack = os.environ.get("GDMAE_BENCH_PACK_MODE",
                              wb3d.get("TPU_JOINT_PACK", "dense"))
        wb3d.TPU_JOINT_PACK = pack
        wb3d.TPU_JOINT_BUDGETS = joint_budgets_for(
            wcap_pts, drop_specs=wdrop_specs, geom=WAYMO_GEOM, pack=pack)
        print(f"waymo joint budgets ({pack}): {wb3d.TPU_JOINT_BUDGETS}",
              file=sys.stderr, flush=True)
    wremat_env = os.environ.get("GDMAE_BENCH_WAYMO_REMAT")
    if wremat_env is not None:
        wb3d.TPU_REMAT = wremat_env != "0"
    wspconv = os.environ.get("GDMAE_BENCH_WAYMO_SPCONV")
    if wspconv:
        wb3d.TPU_SPARSE_CONV = [bool(int(v)) for v in wspconv.split(",")]
    hy = os.environ.get("GDMAE_BENCH_HYBRID")
    if hy is not None:
        wb3d.TPU_HYBRID_DECODE = hy != "0"

    wmodel = build_network(wcfg.MODEL, num_class=3, dataset=wmeta, dtype=dtype)
    wpts = synth_scan_waymo(np.random.RandomState(4), batch_size,
                            wmeta.max_points)
    wmask = np.ones((batch_size, wmeta.max_points), bool)
    wbatch = {"points": jnp.asarray(wpts), "point_mask": jnp.asarray(wmask)}
    wpts_h, wmask_h = wpts, wmask
    if os.environ.get("GDMAE_BENCH_HOST_PIL", "1") != "0":
        from gdmae_tpu.datasets.processor.host_pillarize import (
            pillarize_batch_np,
        )

        tabs, wpts_h, wmask_h = pillarize_batch_np(
            wpts, wmask, wmeta.point_cloud_range, wmeta.voxel_size,
            wmeta.grid_size, wmeta.max_pillars)
        wbatch = {"points": jnp.asarray(wpts_h),
                  "point_mask": jnp.asarray(wmask_h)}
        wbatch.update({k: jnp.asarray(v) for k, v in tabs.items()})
        if os.environ.get("GDMAE_BENCH_HOST_VFE", "1") != "0":
            from gdmae_tpu.datasets.processor.host_pillarize import (
                vfe_host_features_cfg,
            )
            wbatch.update({k: jnp.asarray(v) for k, v in
                           vfe_host_features_cfg(
                               wcfg.MODEL.VFE, wpts_h, wmask_h, tabs,
                               wmeta.point_cloud_range,
                               wmeta.voxel_size).items()})
    if os.environ.get("GDMAE_BENCH_HOST_GT", "1") != "0":
        from gdmae_tpu.datasets.processor.host_pillarize import (
            mae_host_targets,
        )
        from gdmae_tpu.models.backbones_3d.spt_backbone import (
            mae_dec_cap, mae_enc_cap)

        host = mae_host_targets(
            wpts_h, wmask_h, wmeta.point_cloud_range, wmeta.voxel_size,
            wmeta.grid_size, wmeta.max_pillars,
            float(wb3d.MASK_CONFIG.RATIO),
            int(wb3d.MASK_CONFIG.NUM_GT_POINTS),
            mae_dec_cap(wb3d, wmeta.max_pillars),
            np.random.default_rng(0),
            m_enc=mae_enc_cap(wb3d, wmeta.max_pillars),
            tables=(wbatch if "host_pillar_start" in wbatch else None))
        wbatch.update({k: jnp.asarray(v) for k, v in host.items()})
        if (os.environ.get("GDMAE_BENCH_HOST_PLANS", "1") != "0"
                and os.environ.get("GDMAE_BENCH_HOST_PIL", "1") != "0"
                and wb3d.get("TPU_WINDOW_MODE") == "joint"):
            from gdmae_tpu.ops.window_host import mae_host_plans

            plans = mae_host_plans(
                wb3d, np.asarray(wbatch["host_pillar_coords"]),
                np.asarray(wbatch["host_pillar_mask"]),
                host["host_mae_mask"], (468, 468))
            wbatch.update({k: jnp.asarray(v) for k, v in plans.items()})

    wparams, wbs = train_lib.init_model(wmodel, wbatch, seed=0)
    wtx, _ = optimization.build_optimizer(wcfg.OPTIMIZATION, 100, 30)
    wstate = train_lib.TrainState.create(wparams, wbs, wtx)
    wstep = train_lib.make_train_step(wmodel)
    wkey = jax.random.PRNGKey(0)
    wstate, wmet = wstep(wstate, wbatch, wkey)
    float(jnp.sum(wmet["loss"]))  # compile fence

    # contention probe (PERFORMANCE.md methodology)
    pa = jnp.full((8192, 8192), 0.01, jnp.bfloat16)

    @jax.jit
    def probe(x):
        for _ in range(8):
            x = (x @ x) * 1e-4 + 0.01
        return x

    float(jnp.sum(probe(pa).astype(jnp.float32)))

    def probe_ms():
        t0 = time.perf_counter()
        float(jnp.sum(probe(pa).astype(jnp.float32)))
        return (time.perf_counter() - t0) * 1e3 / 8.0

    witers = 4 if on_tpu else 1
    windows = 4 if on_tpu else 1
    wbest = float("inf")
    wprobe = float("inf")
    wwin = []
    for w in range(windows):
        wprobe = min(wprobe, probe_ms())
        t0 = time.perf_counter()
        for i in range(witers):
            wstate, wmet = wstep(
                wstate, wbatch, jax.random.fold_in(wkey, w * witers + i))
        float(jnp.sum(wmet["loss"]))
        dt = time.perf_counter() - t0
        wwin.append(round(dt / witers * 1e3, 1))
        wbest = min(wbest, dt)

    out = {
        "waymo_scans_per_sec": round(batch_size * witers / wbest, 2),
        "waymo_batch": batch_size,
        "waymo_step_ms": wwin,
        "waymo_probe_ms": round(wprobe, 2),
    }
    try:
        cost = jax.jit(wstep).lower(
            wstate, wbatch, jax.random.PRNGKey(0)).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        peak = 197e12 if on_tpu else 1e12
        if flops > 0:
            out["waymo_mfu_pct"] = round(
                100.0 * flops * witers / wbest / peak, 2)
    except Exception as e:
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
