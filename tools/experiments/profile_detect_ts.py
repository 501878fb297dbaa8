"""Two-stage detect latency: device-framed batch-1 gd_mae_ts.yaml
inference on the Waymo 468x468 grid (VERDICT r4 #5).

Same chained-dispatch methodology as profile_detect.py (the ~29 ms tunnel
round-trip amortized over chained inferences); variants decompose the
two-stage pipeline (reference path: CenterHead proposals ->
GraphRCNNHead DFVS pooling -> AttnGNN refinement,
/root/reference/pcdet/models/roi_heads/graphrcnn_head.py:139-293):

  full    — frozen first stage + proposals + RoI refinement + final NMS
  first   — first stage only (DynVFE -> SPT -> BEV -> CenterHead decode):
            full − first = the whole second stage
  nognn   — RoI pooling kept, AttnGNN + refine MLPs stubbed:
            full − nognn = the graph refinement compute
  nopool  — second stage with the DFVS point pooling stubbed (zeros):
            full − nopool = DVS+FPS pooling + per-RoI gathers

Usage: python tools/experiments/profile_detect_ts.py <variant> [cfg]
  cfg: ts (default, waymo gd_mae_ts) | ce (waymo graph_rcnn_ce)
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

CFGS = {
    "ts": "tools/cfgs/waymo_models/gd_mae_ts.yaml",
    "ce": "tools/cfgs/waymo_models/graph_rcnn_ce.yaml",
}


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    which = sys.argv[2] if len(sys.argv) > 2 else "ts"

    import jax
    import jax.numpy as jnp

    from gdmae_tpu.config import cfg_from_yaml_file
    from gdmae_tpu.models.detectors.detector3d_template import (
        DatasetMeta, build_network,
    )
    from gdmae_tpu.runtime import train as train_lib
    from tools.bench_common import (
        WAYMO_GEOM, synth_scan_waymo, window_caps_for,
    )

    cfg = cfg_from_yaml_file(str(REPO / CFGS[which]))
    if which == "ce":
        # graph_rcnn_ce is the 3D voxel-res pipeline (0.1 m voxels,
        # VoxelResBackBone8x on the capacity-bounded sparse-3D ops)
        meta = DatasetMeta(
            class_names=cfg.CLASS_NAMES,
            point_cloud_range=cfg.DATA_CONFIG.POINT_CLOUD_RANGE,
            voxel_size=[0.1, 0.1, 0.15],
            grid_size=[1504, 1504, 40],
            num_point_features=4,
            max_points=163840,
            max_pillars=int(os.environ.get("GDMAE_CE_VOXEL_CAP", "65536")),
        )
    else:
        meta = DatasetMeta(
            class_names=cfg.CLASS_NAMES,
            point_cloud_range=cfg.DATA_CONFIG.POINT_CLOUD_RANGE,
            voxel_size=[0.32, 0.32, 6.0],
            grid_size=[468, 468],
            num_point_features=4,
            max_points=163840,
            max_pillars=32768,
        )
    cap_pts = synth_scan_waymo(np.random.RandomState(0), 2, meta.max_points)
    if cfg.MODEL.get("BACKBONE_3D", {}).get("NAME") == "SPTBackbone":
        cfg.MODEL.BACKBONE_3D.TPU_WINDOW_CAPS = [
            list(c) for c in window_caps_for(
                cap_pts, mask_ratio=0.0, geom=WAYMO_GEOM)]

    if variant == "nognn":
        from gdmae_tpu.models.roi_heads import graphrcnn_head as grh
        from flax import linen as fnn

        class GNNStub(fnn.Module):
            model_cfg: object
            input_channels: int
            dtype: object = jnp.float32

            @fnn.compact
            def __call__(self, xyz, feats, valid, train=True):
                out_dim = int(dict(self.model_cfg)["OUT_DIM"])
                dep = (jnp.sum(feats.astype(jnp.float32))
                       + jnp.sum(xyz.astype(jnp.float32))) * 1e-30
                g = valid.shape[0]
                z = jnp.zeros((g, out_dim), feats.dtype)
                return z + dep.astype(feats.dtype)

        grh.AttnGNNLayer = GNNStub
    if variant == "nopool":
        # DFVS+FPS sampling stubbed: every roi samples its first
        # num_candidates points' index 0 (keeps the downstream gathers'
        # shapes; measures the DVS hash + FPS loop itself)
        from gdmae_tpu.ops import pointnet as pn
        from gdmae_tpu.models.roi_heads import graphrcnn_head as grh

        def stub_dvs(points, point_mask, rois, num_candidates, num_fps,
                     lambda_, delta, pool_extra_width):
            m = rois.shape[0]
            dep_f = (jnp.sum(points) + jnp.sum(rois)) * 1e-30
            dep = dep_f.astype(jnp.int32)  # 0, keeps inputs alive
            idx = jnp.zeros((m, num_fps), jnp.int32) + dep
            cnt = jnp.full((m,), num_fps, jnp.int32) + dep
            return idx, cnt

        del grh  # (imports the same ops.pointnet module object)
        pn.dvs_fps_sample = stub_dvs

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = build_network(cfg.MODEL, num_class=3, dataset=meta, dtype=dtype)

    det_pts = synth_scan_waymo(np.random.RandomState(1), 1, meta.max_points)
    det_batch = {
        "points": jnp.asarray(det_pts),
        "point_mask": jnp.ones((1, meta.max_points), bool),
        "gt_boxes": jnp.zeros((1, 8, 8), jnp.float32),
    }
    params, bs = train_lib.init_model(model, det_batch, seed=0)
    det_batch = {k: v for k, v in det_batch.items() if k != "gt_boxes"}
    variables = {"params": params, "batch_stats": bs}

    stop_after = {"first": "dense_head"}.get(variant)

    def _stage_method(m, bd):
        bd = dict(bd)
        for name in ("img_backbone", "vfe", "backbone_3d", "map_to_bev",
                     "pfe", "backbone_2d", "dense_head"):
            stage = getattr(m, name)
            if stage is not None:
                bd = stage(bd, train=False)
            if name == stop_after:
                break
        tot = jnp.zeros((), jnp.float32)
        for k in ("rois", "roi_scores", "batch_cls_preds", "batch_box_preds"):
            if k in bd:
                tot = tot + jnp.sum(bd[k].astype(jnp.float32))
        return (tot,)

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

    float(detect_chain(det_batch))  # compile fence

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

    lat = []
    best_probe = float("inf")
    for i in range(10 if on_tpu else 2):
        best_probe = min(best_probe, probe_ms())
        t0 = time.perf_counter()
        float(detect_chain(det_batch))
        lat.append((time.perf_counter() - t0) / chain_n)

    print(json.dumps({
        "variant": variant, "cfg": which,
        "p50_device_ms": round(float(np.median(lat)) * 1000, 2),
        "probe_ms": round(best_probe, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
