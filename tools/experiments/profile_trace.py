"""Capture a jax.profiler device trace of the MAE train step.

WORKS through the axon tunnel (first verified r4): writes
/tmp/jaxtrace/plugins/profile/<ts>/vm.trace.json.gz with REAL per-op
device events — hlo_category, bytes_accessed, and the HLO long_name
(which carries parameter names, so ops attribute to model parts).

Analyze with:
    python tools/experiments/profile_trace.py analyze <trace.json.gz>

which prints ms/step + GB/step by hlo_category and the top ops.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

N_STEPS = 3


def capture(out_dir="/tmp/jaxtrace"):
    import jax
    import jax.numpy as jnp

    from gdmae_tpu.config import cfg_from_yaml_file
    from gdmae_tpu.models.detectors.detector3d_template import (
        DatasetMeta, build_network)
    from gdmae_tpu.runtime import optimization, train as train_lib
    from tools.bench_common import synth_scan, window_caps_for
    from gdmae_tpu.datasets.processor.host_pillarize import (
        pillarize_batch_np, mae_host_targets)
    from gdmae_tpu.models.backbones_3d.spt_backbone import (
        mae_dec_cap, mae_enc_cap)
    from gdmae_tpu.ops.window_host import mae_host_plans
    from gdmae_tpu.ops import window as window_ops

    cfg = cfg_from_yaml_file(
        str(REPO / "tools/cfgs/kitti_models/gd_mae_ssl.yaml"))
    b3d = cfg.MODEL.BACKBONE_3D
    b3d.TPU_REMAT = False
    drop_specs = window_ops.packing_specs(
        window_ops.drop_specs_from_cfg(
            b3d.SST_BLOCK_LIST[0].PREPROCESS.DROP_INFO["train"]), 64)
    cap_pts = synth_scan(np.random.RandomState(0), 4, 16384)
    b3d.TPU_WINDOW_CAPS = [
        list(c) for c in window_caps_for(cap_pts, drop_specs=drop_specs)]
    meta = DatasetMeta(
        class_names=cfg.CLASS_NAMES,
        point_cloud_range=cfg.DATA_CONFIG.POINT_CLOUD_RANGE,
        voxel_size=[0.32, 0.32, 4], grid_size=[216, 248],
        num_point_features=4, max_points=16384, max_pillars=8192)
    model = build_network(cfg.MODEL, num_class=3, dataset=meta,
                          dtype=jnp.bfloat16)
    pts = synth_scan(np.random.RandomState(0), 16, 16384)
    pmask = np.ones((16, 16384), bool)
    tabs, pts, pmask = pillarize_batch_np(
        pts, pmask, meta.point_cloud_range, meta.voxel_size,
        meta.grid_size, meta.max_pillars)
    batch = {"points": jnp.asarray(pts), "point_mask": jnp.asarray(pmask)}
    batch.update({k: jnp.asarray(v) for k, v in tabs.items()})
    from gdmae_tpu.datasets.processor.host_pillarize import (
        vfe_host_features_cfg)
    batch.update({k: jnp.asarray(v) for k, v in vfe_host_features_cfg(
        cfg.MODEL.VFE, pts, pmask, tabs,
        meta.point_cloud_range, meta.voxel_size).items()})
    host = mae_host_targets(
        pts, pmask, meta.point_cloud_range, meta.voxel_size,
        meta.grid_size, meta.max_pillars, float(b3d.MASK_CONFIG.RATIO),
        int(b3d.MASK_CONFIG.NUM_GT_POINTS),
        mae_dec_cap(b3d, meta.max_pillars), np.random.default_rng(0),
        m_enc=mae_enc_cap(b3d, meta.max_pillars), tables=batch)
    batch.update({k: jnp.asarray(v) for k, v in host.items()})
    plans = mae_host_plans(
        b3d, np.asarray(batch["host_pillar_coords"]),
        np.asarray(batch["host_pillar_mask"]), host["host_mae_mask"],
        (248, 216))
    batch.update({k: jnp.asarray(v) for k, v in plans.items()})
    params, bs = train_lib.init_model(model, batch, seed=0)
    tx, _ = optimization.build_optimizer(cfg.OPTIMIZATION, 100, 30)
    state = train_lib.TrainState.create(params, bs, tx)
    step = train_lib.make_train_step(model)
    key = jax.random.PRNGKey(0)
    state, metrics = step(state, batch, key)
    float(jnp.sum(metrics["loss"]))
    os.makedirs(out_dir, exist_ok=True)
    with jax.profiler.trace(out_dir):
        for i in range(N_STEPS):
            state, metrics = step(state, batch, jax.random.fold_in(key, i))
        float(jnp.sum(metrics["loss"]))
    traces = sorted(glob.glob(f"{out_dir}/plugins/profile/*/*.trace.json.gz"))
    print("trace:", traces[-1] if traces else "NONE")
    return traces[-1] if traces else None


def analyze(path):
    with gzip.open(path) as f:
        data = json.load(f)
    pids = {e["pid"]: e["args"].get("name") for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu_pids = {p for p, n in pids.items() if "TPU" in str(n)}
    ev = [e for e in data["traceEvents"]
          if e.get("ph") == "X" and e.get("pid") in tpu_pids
          and not e.get("name", "").isdigit()
          and "jit_train_step" not in e.get("name", "")]
    cat, catb = collections.Counter(), collections.Counter()
    for e in ev:
        a = e.get("args", {})
        cat[a.get("hlo_category", "?")] += e["dur"]
        catb[a.get("hlo_category", "?")] += int(a.get("bytes_accessed", 0))
    print(f"=== by hlo_category over {N_STEPS} steps ===")
    for c, d in cat.most_common(12):
        print(f"{d/N_STEPS/1e3:8.2f} ms/step {catb[c]/N_STEPS/1e9:6.2f} GB  {c}")
    agg, by, info = (collections.Counter(), collections.Counter(), {})
    for e in ev:
        nm = e["name"]
        agg[nm] += e["dur"]
        by[nm] += int(e.get("args", {}).get("bytes_accessed", 0))
        info[nm] = e.get("args", {}).get("long_name", "")[:140]
    print("\n=== top ops ===")
    for nm, d in agg.most_common(25):
        print(f"{d/N_STEPS/1e3:7.2f} ms {by[nm]/N_STEPS/1e6:7.0f} MB  "
              f"{info[nm][:110]}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "analyze":
        analyze(sys.argv[2])
    else:
        p = capture()
        if p:
            analyze(p)
