"""Isolate conv + backbone costs on the TPU backend."""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def report(name, compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        print(f"{name}: flops={ca.get('flops', 0):.2e} "
              f"bytes={ca.get('bytes accessed', 0):.2e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: cost n/a ({e})", flush=True)


def timeit(compiled, args, key_perturb, iters=8):
    import jax
    import jax.numpy as jnp

    o = compiled(*args)
    prev = float(jnp.asarray(jax.tree_util.tree_leaves(o)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for i in range(iters):
        o = compiled(*key_perturb(args, i, prev))
        prev = float(jnp.asarray(
            jax.tree_util.tree_leaves(o)[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    B, NY, NX, C = 64, 248, 216, 128

    x = jnp.asarray(rng.randn(B, NY, NX, C).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.02, jnp.bfloat16)

    def conv1(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    c1 = jax.jit(conv1).lower(x, w).compile()
    report("conv3x3_128 (64,248,216)", c1)

    def perturb(args, i, prev):
        a = list(args)
        a[0] = args[0].at[0, 0, 0, 0].add(jnp.bfloat16(prev * 1e-20))
        return a

    print(f"conv1 time: {timeit(c1, [x, w], perturb):.1f} ms", flush=True)

    # SPT backbone forward alone on synthetic pillars
    from gdmae_tpu.config import cfg_from_yaml_file
    from gdmae_tpu.models.backbones_3d.spt_backbone import SPTBackbone

    cfg = cfg_from_yaml_file(str(REPO / "tools/cfgs/kitti_models/gd_mae_ssl.yaml"))
    bb_cfg = cfg.MODEL.BACKBONE_3D
    bb_cfg.TPU_WINDOW_CAPS = [[160, 64, 32], [96, 48, 24], [64, 32, 16]]
    MP = 8192
    feats = jnp.asarray(rng.randn(B, MP, 128).astype(np.float32), jnp.bfloat16)
    coords = jnp.stack([
        jnp.asarray(rng.randint(0, NY, (B, MP)), jnp.int32),
        jnp.asarray(rng.randint(0, NX, (B, MP)), jnp.int32)], axis=-1)
    pmask = jnp.asarray(rng.rand(B, MP) < 0.2)  # ~1.6k pillars (MAE-masked)

    bb = SPTBackbone(model_cfg=bb_cfg, input_channels=128,
                     grid_size=(216, 248), voxel_size=(0.32, 0.32, 4),
                     point_cloud_range=(0, -39.68, -3, 69.12, 39.68, 1),
                     max_pillars=MP, dtype=jnp.bfloat16)
    bd = {"pillar_features": feats, "pillar_coords": coords,
          "pillar_mask": pmask}
    variables = bb.init(jax.random.PRNGKey(0), bd, train=False)

    def bb_fwd(v, f):
        out = bb.apply(v, {"pillar_features": f, "pillar_coords": coords,
                           "pillar_mask": pmask}, train=False)
        return jnp.sum(out["spatial_features"][0, 0, 0].astype(jnp.float32))

    cb = jax.jit(bb_fwd).lower(variables, feats).compile()
    report("spt_backbone fwd", cb)

    def perturb2(args, i, prev):
        return [args[0], args[1].at[0, 0, 0].add(jnp.bfloat16(prev * 1e-20))]

    print(f"spt_backbone fwd time: {timeit(cb, [variables, feats], perturb2):.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
