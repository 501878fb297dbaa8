"""Honest full-step ablation profiler for the MAE pretrain bench.

Per-op micro-timing through the tunneled TPU is unreliable (~29 ms dispatch
floor, heavy contention noise), so this measures the ONLY trustworthy thing:
the full jitted train step with one component stubbed out per run, timed
best-of-windows exactly like bench.py.  The difference full-minus-ablated is
that component's true contribution (fwd+bwd+optimizer overlap included).

Usage: python tools/profile_ablate.py <variant> [batch]
Variants:
  full       — unmodified step (same as bench.py, no-remat)
  novfe      — DynVFE replaced by a synthetic pillar stub (measures the
               whole VFE: pillarize sort/histogram + feature build + MLPs)
  noloss     — chamfer + MAE gt grouping replaced by cheap L2 on pred
  nofuse     — DeconvFuse replaced by a 1x1 conv on x_conv1 (measures the
               generative-decoder deconv pyramid)
  noattn     — window plans built but transformer math skipped
  noplans    — plans AND attention skipped (noattn-noplans = plan cost)
  sparseconv — TPU_SPARSE_CONV: gather-based token convs instead of dense
               canvas convs (A/B, not an ablation)
  sgd        — optimizer swapped for plain SGD (measures adam+clip+onecycle)
  nomask     — MAE random masking + kept-compaction replaced by a static
               every-k-th-pillar selection (measures masking/nonzero cost)
  notokconv  — sparse token convs become a single channel matmul (measures
               the 3x3 tap-gather cost of conv_down/conv_out)
  denseconv  — TPU_SPARSE_CONV off: dense masked canvas convs (A/B)
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
# persistent compile cache (same as bench.py): tunnel compiles are minutes
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    variants = set(variant.split("+"))  # combine with '+', e.g. novfe+noattn

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from gdmae_tpu.config import cfg_from_yaml_file
    from gdmae_tpu.models.detectors.detector3d_template import (
        DatasetMeta, build_network,
    )
    from gdmae_tpu.runtime import optimization, train as train_lib
    from gdmae_tpu.utils import loss_utils
    from gdmae_tpu.ops import scatter as scatter_ops
    from gdmae_tpu.models.backbones_3d import spt_backbone as spt_mod
    from gdmae_tpu.models.vfe import dyn_vfe as dyn_vfe_mod

    from tools.bench_common import synth_scan, window_caps_for

    cfg = cfg_from_yaml_file(str(REPO / "tools/cfgs/kitti_models/gd_mae_ssl.yaml"))
    # same workload as bench.py: LiDAR-like scans + zero-overflow caps
    # (and the same GDMAE_BENCH_PACK pow2-packing switch)
    import os as _os
    drop_specs = None
    if _os.environ.get("GDMAE_BENCH_PACK", "1") != "0":
        from gdmae_tpu.ops import window as window_ops
        cfg.MODEL.BACKBONE_3D.TPU_PACK_POW2 = True
        min_t = int(_os.environ.get("GDMAE_PACK_MIN_T", "1"))
        cfg.MODEL.BACKBONE_3D.TPU_PACK_MIN_T = min_t
        drop_specs = window_ops.packing_specs(
            window_ops.drop_specs_from_cfg(
                cfg.MODEL.BACKBONE_3D.SST_BLOCK_LIST[0]
                .PREPROCESS.DROP_INFO["train"]), 64, min_t=min_t)
    cfg.MODEL.BACKBONE_3D.TPU_WINDOW_CAPS = [
        list(c) for c in window_caps_for(
            synth_scan(np.random.RandomState(0), 4, 16384),
            drop_specs=drop_specs)]
    cfg.MODEL.BACKBONE_3D.TPU_REMAT = False
    hy = os.environ.get("GDMAE_BENCH_HYBRID")
    if hy is not None:  # A/B: decode-site conv_out vs dense fuse
        cfg.MODEL.BACKBONE_3D.TPU_HYBRID_DECODE = hy != "0"
    if _os.environ.get("GDMAE_FUSED_LAYER"):
        cfg.MODEL.BACKBONE_3D.TPU_FUSED_LAYER = True
    if _os.environ.get("GDMAE_JOINT"):
        from tools.bench_common import joint_budgets_for
        cfg.MODEL.BACKBONE_3D.TPU_WINDOW_MODE = "joint"
        cfg.MODEL.BACKBONE_3D.TPU_JOINT_BUDGETS = joint_budgets_for(
            synth_scan(np.random.RandomState(0), 4, 16384),
            drop_specs=drop_specs)
        print("joint budgets:", cfg.MODEL.BACKBONE_3D.TPU_JOINT_BUDGETS,
              file=sys.stderr)
    # generic model-config overrides for A/B runs, e.g.
    # GDMAE_SET="BACKBONE_3D.TPU_SPARSE_DECODE=true BACKBONE_3D.TPU_REMAT=true"
    for kv in _os.environ.get("GDMAE_SET", "").split():
        import ast
        path, _, raw = kv.partition("=")
        node = cfg.MODEL
        keys = path.split(".")
        for k in keys[:-1]:
            node = node[k]
        try:
            val = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            val = {"true": True, "false": False}.get(raw.lower(), raw)
        node[keys[-1]] = val
        print(f"override MODEL.{path} = {val!r}", file=sys.stderr)
    meta = DatasetMeta(
        class_names=cfg.CLASS_NAMES,
        point_cloud_range=cfg.DATA_CONFIG.POINT_CLOUD_RANGE,
        voxel_size=[0.32, 0.32, 4],
        grid_size=[216, 248],
        num_point_features=4,
        max_points=16384,
        max_pillars=8192,
    )
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    # ---- apply ablation patches ----
    if "nochamfer" in variants:  # chamfer only (grouping kept)
        def fake_chamfer2(pred, gt, pred_mask=None, gt_mask=None, weights=None):
            dep = (gt.sum() + (0 if gt_mask is None else gt_mask.sum())
                   ).astype(jnp.float32)
            return jnp.mean(pred.astype(jnp.float32) ** 2) + dep * 1e-30
        loss_utils.chamfer_distance = fake_chamfer2
    if "noloss" in variants:
        def fake_chamfer(pred, gt, pred_mask=None, gt_mask=None, weights=None):
            return jnp.mean(pred.astype(jnp.float32) ** 2)
        loss_utils.chamfer_distance = fake_chamfer

        def fake_group(values, res, k):
            n, c = values.shape
            m = res.pillar_start.shape[0]
            z = jnp.zeros((m, k, c), values.dtype) + values[0] * 1e-30
            return z, jnp.zeros((m, k), bool)
        scatter_ops.group_points_padded = fake_group
    if "nofuse" in variants:
        class Fuse1x1(nn.Module):
            fuse_cfg: object
            sources: object
            dtype: object = jnp.float32

            @nn.compact
            def __call__(self, feature_maps, train=True):
                from gdmae_tpu.config import as_easy
                fc = as_easy(self.fuse_cfg)
                total = sum(int(fc[s].NUM_UPSAMPLE_FILTER) for s in self.sources)
                out_ch = total // len(self.sources)
                out = nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                              name="stub")(feature_maps[self.sources[0]])
                # keep EVERY source alive: stubbing only x_conv1 lets XLA
                # dead-code-eliminate encoder stages 2-3 entirely and the
                # "fuse" bucket absorbs their cost (PERFORMANCE.md pitfall)
                for s in self.sources[1:]:
                    out = out + (jnp.sum(feature_maps[s].astype(jnp.float32))
                                 * 1e-30).astype(out.dtype)
                return out
        spt_mod.DeconvFuse = Fuse1x1
    if "noattn" in variants:
        cfg.MODEL.BACKBONE_3D.TPU_ABLATE = ["attn"]
    if "nop2t" in variants:  # plans w/o plan_to_tokens (requires noattn)
        cfg.MODEL.BACKBONE_3D.TPU_ABLATE = ["attn", "p2t"]
    if "notok" in variants:  # plans w/o per-level tok arrays (req. noattn)
        cfg.MODEL.BACKBONE_3D.TPU_ABLATE = ["attn", "tokarrays"]
    if "noplans" in variants:
        cfg.MODEL.BACKBONE_3D.TPU_ABLATE = ["plans"]
    if "novfe" in variants:
        # stub must preserve the REAL downstream sparsity or the encoder
        # cost changes under it (the old synthetic-uniform 8192-pillar stub
        # made `novfe` measure SLOWER than `full` once host-pillarize
        # landed): reuse the host pillar tables from the batch and replace
        # only the VFE compute (feature build + MLP + segment reductions)
        # with a pad of each pillar's first point.
        def stub_call(self, batch_dict, train=True):
            points = batch_dict["points"]  # pillar-sorted (host path)
            b, n, _ = points.shape
            m = self.max_pillars
            assert "host_pillar_start" in batch_dict, (
                "novfe stub requires the host-pillarize batch "
                "(GDMAE_BENCH_HOST_PIL=1, the default)")
            identity = jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32)[None], (b, n))
            res = scatter_ops.PillarizeResult(
                pillar_coords=batch_dict["host_pillar_coords"],
                pillar_mask=batch_dict["host_pillar_mask"],
                point_pillar=batch_dict["host_point_pillar"],
                point_order=identity,
                pillar_start=batch_dict["host_pillar_start"],
                pillar_count=batch_dict["host_pillar_count"],
                num_pillars=batch_dict["host_num_pillars"],
            )
            c_out = self.output_feature_dim
            first = jnp.take_along_axis(
                points, jnp.clip(res.pillar_start, 0, n - 1)[..., None],
                axis=1)  # (B, M, C_in)
            pf = jnp.pad(first, ((0, 0), (0, 0), (0, c_out - first.shape[-1])))
            pf = pf * res.pillar_mask[..., None].astype(pf.dtype)
            batch_dict["pillar_features"] = pf.astype(self.dtype)
            batch_dict["pillar_coords"] = res.pillar_coords
            batch_dict["pillar_mask"] = res.pillar_mask
            batch_dict["point_pillar"] = res.point_pillar
            batch_dict["point_valid"] = (
                (res.point_pillar < m) & batch_dict["point_mask"])
            batch_dict["pillarize_result"] = res
            return batch_dict
        dyn_vfe_mod.DynVFE.__call__ = stub_call
    if "sparseconv" in variants:
        cfg.MODEL.BACKBONE_3D.TPU_SPARSE_CONV = True
    if "nofuseremat" in variants:
        cfg.MODEL.BACKBONE_3D.TPU_REMAT_FUSE = False
    if "conv1x1" in variants:
        # shrink every ConvBNReLU to a 1x1 kernel (stride kept): measures
        # the 3x3 dense conv cost in the SST stages
        from gdmae_tpu.models.model_utils import blocks as blocks_mod
        orig_call = blocks_mod.ConvBNReLU.__call__

        def call_1x1(self, x, occ_out=None, train=True):
            object.__setattr__(self, "kernel", 1)
            return orig_call(self, x, occ_out=occ_out, train=train)
        blocks_mod.ConvBNReLU.__call__ = call_1x1
    if "nobn" in variants:
        from gdmae_tpu.models.model_utils import blocks as blocks_mod
        from flax import linen as fnn

        def bn_stub(self, x, mask=None, use_running_average=None):
            # param-free passthrough (post-hoc assignment cannot register a
            # @compact method, so no self.param here)
            return x.astype(self.dtype)
        blocks_mod.MaskedBatchNorm.__call__ = bn_stub
    if "nomask" in variants:
        def fake_masking(key, valid_mask, mask_ratio):
            m = valid_mask.shape[0]
            keep_every = max(1, int(round(1.0 / (1.0 - mask_ratio))))
            keep = (jnp.arange(m) % keep_every == 0) & valid_mask
            return jnp.where(keep, 0.0, 1.0) + 0.0 * jax.random.uniform(key, ())
        scatter_ops.random_masking = fake_masking
    if "densewin" in variants:
        cfg.MODEL.BACKBONE_3D.TPU_WINDOW_MODE = "dense"
    if "noconv" in variants:
        # submanifold convs become (masked) identity where shapes permit:
        # measures the dense conv+BN cost itself (combine with noplans so
        # occupancy fakery elsewhere cannot skew plan work)
        from gdmae_tpu.models.model_utils import blocks as blocks_mod
        orig_conv = blocks_mod.ConvBNReLU.__call__

        def conv_stub(self, x, occ_out=None, train=True):
            if self.stride == 1 and x.shape[-1] == self.features:
                if occ_out is not None:
                    return x * occ_out.astype(x.dtype)[..., None]
                return x
            return orig_conv(self, x, occ_out=occ_out, train=train)
        blocks_mod.ConvBNReLU.__call__ = conv_stub
    if "notokconv" in variants:
        # gather-based token convs (TPU_SPARSE_CONV path) become a single
        # channel-matching matmul — measures the 3x3 TAP GATHER cost of
        # conv_down/conv_out while keeping channel/stride dataflow intact
        from gdmae_tpu.models.model_utils import blocks as blocks_mod
        from flax import linen as fnn

        class TokStub(fnn.Module):
            features: int
            kernel: int = 3
            stride: int = 1
            dtype: object = jnp.float32

            @fnn.compact
            def __call__(self, tokens, cell2tok_in, grid_in_hw, coords_out,
                         mask_out, coords_in=None, mask_in=None, train=True):
                out = fnn.Dense(self.features, use_bias=False,
                                dtype=self.dtype, name="stub")(tokens)
                m_out = mask_out.shape[1]
                if out.shape[1] > m_out:
                    out = out[:, :m_out, :]
                elif out.shape[1] < m_out:
                    out = jnp.pad(
                        out, ((0, 0), (0, m_out - out.shape[1]), (0, 0)))
                dep = (jnp.sum(cell2tok_in) + jnp.sum(coords_out)) * 1e-30
                out = out + dep.astype(out.dtype)
                return out * mask_out[..., None].astype(out.dtype)

        blocks_mod.TokenConvBNReLU = TokStub
        from gdmae_tpu.models.backbones_3d import spt_backbone as spt_mod3
        spt_mod3.TokenConvBNReLU = TokStub
    if "denseconv" in variants:
        cfg.MODEL.BACKBONE_3D.TPU_SPARSE_CONV = False
    if "nocanvas" in variants:
        # canvas scatter/gather + occupancy builds become cheap broadcasts
        # (combine with noplans: the all-true fake occupancy would inflate
        # bucket plans)
        from gdmae_tpu.models.backbones_3d import spt_backbone as spt_mod2
        from gdmae_tpu.ops import window as window_mod

        def fake_scatter(pf, coords, mask, grid_hw, **kw):
            b, m, c = pf.shape
            ny, nx = grid_hw
            dep = (jnp.sum(pf.astype(jnp.float32))
                   + jnp.sum(coords) * 1e-30) * 1e-30
            canvas = jnp.zeros((b, ny, nx, c), pf.dtype) + dep.astype(pf.dtype)
            return canvas, jnp.ones((b, ny, nx), bool)

        def fake_gather(canvas, coords, grid_hw, mask=None, **kw):
            b, m, _ = coords.shape
            c = canvas.shape[-1]
            dep = jnp.mean(canvas.astype(jnp.float32)) * 1e-30
            return jnp.zeros((b, m, c), canvas.dtype) + dep.astype(canvas.dtype)

        def fake_occ(coords, mask, grid_hw, **kw):
            b = coords.shape[0]
            ny, nx = grid_hw
            return jnp.ones((b, ny, nx), bool)

        spt_mod2.scatter_pillars_to_canvas = fake_scatter
        spt_mod2.gather_canvas_at = fake_gather
        window_mod.occupancy_from_coords = fake_occ
    known = {"full", "sgd", "noloss", "nofuse", "noattn", "noplans", "novfe", "nop2t", "notok", "nochamfer",
             "sparseconv", "nofuseremat", "conv1x1", "nobn", "nomask",
             "densewin", "noconv", "nocanvas", "notokconv", "denseconv"}
    if variants - known:
        raise SystemExit(f"unknown variants {variants - known}")

    model = build_network(cfg.MODEL, num_class=3, dataset=meta, dtype=dtype)
    rng = np.random.RandomState(0)
    n = meta.max_points
    pts = synth_scan(rng, batch_size, n)
    batch = {
        "points": jnp.asarray(pts),
        "point_mask": jnp.ones((batch_size, n), bool),
    }
    # host pillarize + MAE targets, matching bench.py
    # (GDMAE_BENCH_HOST_PIL=0 / GDMAE_BENCH_HOST_GT=0 for all-device A/Bs)
    pmask = np.ones((batch_size, n), bool)
    if os.environ.get("GDMAE_BENCH_HOST_PIL", "1") != "0":
        from gdmae_tpu.datasets.processor.host_pillarize import (
            pillarize_batch_np,
        )
        tabs, pts, pmask = pillarize_batch_np(
            pts, pmask, meta.point_cloud_range, meta.voxel_size,
            meta.grid_size, meta.max_pillars)
        batch = {"points": jnp.asarray(pts), "point_mask": jnp.asarray(pmask)}
        batch.update({k: jnp.asarray(v) for k, v in tabs.items()})
        if os.environ.get("GDMAE_BENCH_HOST_VFE", "1") != "0" and \
                "novfe" not in variants:
            from gdmae_tpu.datasets.processor.host_pillarize import (
                vfe_host_features_cfg,
            )
            batch.update({k: jnp.asarray(v) for k, v in
                          vfe_host_features_cfg(
                              cfg.MODEL.VFE, pts, pmask, tabs,
                              meta.point_cloud_range,
                              meta.voxel_size).items()})
    if os.environ.get("GDMAE_BENCH_HOST_GT", "1") != "0":
        from gdmae_tpu.datasets.processor.host_pillarize import (
            mae_host_targets,
        )
        from gdmae_tpu.models.backbones_3d.spt_backbone import (
                mae_dec_cap, mae_enc_cap)
        b3d = cfg.MODEL.BACKBONE_3D
        host = mae_host_targets(
            pts, pmask, meta.point_cloud_range,
            meta.voxel_size, meta.grid_size, meta.max_pillars,
            float(b3d.MASK_CONFIG.RATIO), int(b3d.MASK_CONFIG.NUM_GT_POINTS),
            mae_dec_cap(b3d, meta.max_pillars), np.random.default_rng(0),
            m_enc=mae_enc_cap(b3d, meta.max_pillars))
        batch.update({k: jnp.asarray(v) for k, v in host.items()})
        if (os.environ.get("GDMAE_BENCH_HOST_PLANS", "1") != "0"
                and os.environ.get("GDMAE_BENCH_HOST_PIL", "1") != "0"
                and b3d.get("TPU_WINDOW_MODE") == "joint"
                and "plans" not in b3d.get("TPU_ABLATE", ())):
            from gdmae_tpu.ops.window_host import mae_host_plans
            plans = mae_host_plans(
                b3d, np.asarray(batch["host_pillar_coords"]),
                np.asarray(batch["host_pillar_mask"]),
                host["host_mae_mask"],
                (int(meta.grid_size[1]), int(meta.grid_size[0])))
            batch.update({k: jnp.asarray(v) for k, v in plans.items()})
    params, batch_stats = train_lib.init_model(model, batch, seed=0)
    if "sgd" in variants:
        import optax
        tx = optax.sgd(0.01)
    else:
        tx, _ = optimization.build_optimizer(cfg.OPTIMIZATION, 100, 30)
    state = train_lib.TrainState.create(params, batch_stats, tx)
    step = train_lib.make_train_step(model)
    key = jax.random.PRNGKey(0)
    state, metrics = step(state, batch, key)
    float(jnp.sum(metrics["loss"]))

    # contention probe: a fixed 8k^3 bf16 matmul (~5.6 ms at 197 TFLOP/s).
    # The tunneled chip is time-shared and can quantize step times under
    # load — an inflated probe marks the window as untrustworthy.
    pa = jnp.full((8192, 8192), 0.01, jnp.bfloat16)

    @jax.jit
    def probe(x):
        # 8 chained matmuls in one dispatch: amortizes the ~29 ms tunnel
        # round-trip so the reading reflects device speed, not latency
        for _ in range(8):
            x = (x @ x) * 1e-4 + 0.01
        return x

    float(jnp.sum(probe(pa).astype(jnp.float32)))

    def probe_ms():
        t0 = time.perf_counter()
        float(jnp.sum(probe(pa).astype(jnp.float32)))
        return (time.perf_counter() - t0) * 1e3 / 8.0

    iters = 8 if on_tpu else 2
    windows = 6 if on_tpu else 1
    best = float("inf")
    best_probe = float("inf")
    for w in range(windows):
        best_probe = min(best_probe, probe_ms())
        t0 = time.perf_counter()
        for i in range(iters):
            state, metrics = step(
                state, batch, jax.random.fold_in(key, w * iters + i))
        float(jnp.sum(metrics["loss"]))
        best = min(best, time.perf_counter() - t0)

    ms = best / iters * 1e3
    print(json.dumps({
        "variant": variant, "batch": batch_size,
        "ms_per_step": round(ms, 1),
        "scans_per_sec": round(batch_size * iters / best, 2),
        "probe_ms": round(best_probe, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
