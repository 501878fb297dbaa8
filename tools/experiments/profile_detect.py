"""Detect-latency ablation: device-framed batch-1 gd_mae.yaml inference.

Same chained-dispatch methodology as bench.py's detect_p50_device_ms (the
~29 ms tunnel round-trip amortized over 8 chained inferences), one
component stubbed per variant:

  full    — unmodified eval forward + post-processing
  nonms   — stop after the dense head (anchor decode included): full−nonms
            = sigmoid + top-k + rotated-IoU NMS + keep-select
  nohead  — stop after backbone_2d: nonms−nohead = dense head incl.
            anchor decode
  noattn  — window plans built, transformer math skipped (encoder cost)

Usage: python tools/experiments/profile_detect.py <variant>
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"

    import jax
    import jax.numpy as jnp

    from gdmae_tpu.config import cfg_from_yaml_file
    from gdmae_tpu.models.detectors.detector3d_template import (
        DatasetMeta, build_network,
    )
    from gdmae_tpu.runtime import train as train_lib
    from tools.bench_common import synth_scan, window_caps_for

    cfg = cfg_from_yaml_file(str(REPO / "tools/cfgs/kitti_models/gd_mae.yaml"))
    meta = DatasetMeta(
        class_names=cfg.CLASS_NAMES,
        point_cloud_range=cfg.DATA_CONFIG.POINT_CLOUD_RANGE,
        voxel_size=[0.32, 0.32, 4],
        grid_size=[216, 248],
        num_point_features=4,
        max_points=16384,
        max_pillars=8192,
    )
    cap_pts = synth_scan(np.random.RandomState(0), 4, meta.max_points)
    cfg.MODEL.BACKBONE_3D.TPU_WINDOW_CAPS = [
        list(c) for c in window_caps_for(cap_pts, mask_ratio=0.0)]
    if variant == "noattn":
        cfg.MODEL.BACKBONE_3D.TPU_ABLATE = ["attn"]
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = build_network(cfg.MODEL, num_class=3, dataset=meta, dtype=dtype)

    det_pts = synth_scan(np.random.RandomState(1), 1, meta.max_points)
    det_batch = {
        "points": jnp.asarray(det_pts),
        "point_mask": jnp.ones((1, meta.max_points), bool),
        "gt_boxes": jnp.zeros((1, 8, 8), jnp.float32),
    }
    params, bs = train_lib.init_model(model, det_batch, seed=0)
    det_batch = {k: v for k, v in det_batch.items() if k != "gt_boxes"}
    variables = {"params": params, "batch_stats": bs}

    stop_after = {"nonms": "dense_head", "nohead": "backbone_2d"}.get(variant)

    def _stage_method(m, bd):
        bd = dict(bd)
        for name in ("img_backbone", "vfe", "backbone_3d", "map_to_bev",
                     "pfe", "backbone_2d", "dense_head", "point_head",
                     "roi_head"):
            stage = getattr(m, name)
            if stage is not None:
                bd = stage(bd, train=False)
            if name == stop_after:
                break
        if stop_after == "backbone_2d":
            return (jnp.sum(bd["spatial_features_2d"].astype(jnp.float32)),)
        return (jnp.sum(bd["batch_cls_preds"].astype(jnp.float32))
                + jnp.sum(bd["batch_box_preds"].astype(jnp.float32)),)

    def run(bd):
        if stop_after is not None:
            return model.apply(variables, bd, method=_stage_method)
        out = model.apply(variables, bd, train=False)
        return out["final_boxes"], out["final_scores"], out["final_valid"]

    chain_n = 8

    @jax.jit
    def detect_chain(bd):
        def body(carry, _):
            b2 = dict(bd)
            b2["points"] = b2["points"] + carry * 1e-12
            outs = run(b2)
            tot = jnp.zeros((), jnp.float32)
            for o in outs:
                tot = tot + jnp.sum(o.astype(jnp.float32))
            return tot, None
        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=chain_n)
        return s

    float(detect_chain(det_batch))

    pa = jnp.full((8192, 8192), 0.01, jnp.bfloat16)

    @jax.jit
    def probe(x):
        for _ in range(8):
            x = (x @ x) * 1e-4 + 0.01
        return x

    float(jnp.sum(probe(pa).astype(jnp.float32)))

    best = float("inf")
    best_probe = float("inf")
    for _ in range(8 if on_tpu else 2):
        t0 = time.perf_counter()
        float(jnp.sum(probe(pa).astype(jnp.float32)))
        best_probe = min(best_probe, (time.perf_counter() - t0) * 1e3 / 8)
        t0 = time.perf_counter()
        float(detect_chain(det_batch))
        best = min(best, (time.perf_counter() - t0) / chain_n)

    print(json.dumps({"variant": variant, "ms_per_scan": round(best * 1e3, 2),
                      "probe_ms": round(best_probe, 2)}), flush=True)


if __name__ == "__main__":
    main()
