"""A/B microbench: DeconvFuse (generative decoder) at MAE-bench shapes.

Isolates the fuse cost (~122 ms of a 357 ms batch-16 step) and ablates its
interior: remat, BN, the 3x3 conv_out.  Usage: python tools/ab_fuse.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

B = 16
NY, NX, CC = 248, 216, 128


def timed(name, fn, args, iters=6, windows=4):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).block_until_ready()
    best = float("inf")
    for w in range(windows):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/iters*1e3:.2f} ms", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from gdmae_tpu.config import as_easy
    from gdmae_tpu.models.backbones_3d.spt_backbone import DeconvFuse
    from gdmae_tpu.models.model_utils.blocks import MaskedBatchNorm

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    rng = np.random.RandomState(0)

    fuse_cfg = {
        "x_conv1": {"UPSAMPLE_STRIDE": 1, "NUM_UPSAMPLE_FILTER": 128},
        "x_conv2": {"UPSAMPLE_STRIDE": 2, "NUM_UPSAMPLE_FILTER": 128},
        "x_conv3": {"UPSAMPLE_STRIDE": 4, "NUM_UPSAMPLE_FILTER": 128},
    }
    fm = {
        "x_conv1": jnp.asarray(
            rng.randn(B, NY, NX, CC).astype(np.float32), dtype=dtype),
        "x_conv2": jnp.asarray(
            rng.randn(B, NY // 2, NX // 2, CC).astype(np.float32), dtype=dtype),
        "x_conv3": jnp.asarray(
            rng.randn(B, NY // 4, NX // 4, CC).astype(np.float32), dtype=dtype),
    }
    sources = ["x_conv1", "x_conv2", "x_conv3"]

    fuse = DeconvFuse(fuse_cfg=fuse_cfg, sources=sources, dtype=dtype)
    fvars = fuse.init(jax.random.PRNGKey(0), fm, True)

    def run(module, variables, remat):
        apply = module.apply
        if remat:
            target = jax.checkpoint(
                lambda v, x: apply(v, x, True, mutable=["batch_stats"])[0])
        else:
            target = lambda v, x: apply(v, x, True, mutable=["batch_stats"])[0]

        @jax.jit
        def f(x1, x2, x3):
            def loss(x):
                out = target(variables, {"x_conv1": x, "x_conv2": x2,
                                         "x_conv3": x3})
                return jnp.sum(out.astype(jnp.float32))
            return jax.grad(loss)(x1)
        return f

    timed("fuse fwd+bwd (remat)", run(fuse, fvars, True),
          (fm["x_conv1"], fm["x_conv2"], fm["x_conv3"]))
    timed("fuse fwd+bwd (no remat)", run(fuse, fvars, False),
          (fm["x_conv1"], fm["x_conv2"], fm["x_conv3"]))

    class FuseNoBN(nn.Module):
        dtype: object = dtype

        @nn.compact
        def __call__(self, feature_maps, train=True):
            ups = []
            for i, src in enumerate(sources):
                cfgv = fuse_cfg[src]
                stride = int(cfgv["UPSAMPLE_STRIDE"])
                nf = int(cfgv["NUM_UPSAMPLE_FILTER"])
                x = feature_maps[src]
                b, h, w, _ = x.shape
                x = nn.Conv(stride * stride * nf, (1, 1), use_bias=False,
                            dtype=self.dtype, name=f"deblock_{i}")(x)
                x = nn.relu(x)
                x = x.reshape(b, h, w, stride, stride, nf)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, h * stride, w * stride, nf)
                ups.append(x)
            x = jnp.concatenate(ups, axis=-1)
            x = nn.Conv(128, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name="conv_out")(x)
            return nn.relu(x)

    m2 = FuseNoBN()
    v2 = m2.init(jax.random.PRNGKey(0), fm)

    @jax.jit
    def f_nobn(x1, x2, x3):
        def loss(x):
            return jnp.sum(m2.apply(
                v2, {"x_conv1": x, "x_conv2": x2, "x_conv3": x3}
            ).astype(jnp.float32))
        return jax.grad(loss)(x1)

    timed("fuse fwd+bwd (no BN, no remat)", f_nobn,
          (fm["x_conv1"], fm["x_conv2"], fm["x_conv3"]))

    class FuseOut1x1(nn.Module):
        dtype: object = dtype

        @nn.compact
        def __call__(self, feature_maps, train=True):
            ups = []
            for i, src in enumerate(sources):
                cfgv = fuse_cfg[src]
                stride = int(cfgv["UPSAMPLE_STRIDE"])
                nf = int(cfgv["NUM_UPSAMPLE_FILTER"])
                x = feature_maps[src]
                b, h, w, _ = x.shape
                x = nn.Conv(stride * stride * nf, (1, 1), use_bias=False,
                            dtype=self.dtype, name=f"deblock_{i}")(x)
                x = nn.relu(x)
                x = x.reshape(b, h, w, stride, stride, nf)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, h * stride, w * stride, nf)
                ups.append(x)
            x = jnp.concatenate(ups, axis=-1)
            x = nn.Conv(128, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv_out")(x)
            return nn.relu(x)

    m3 = FuseOut1x1()
    v3 = m3.init(jax.random.PRNGKey(0), fm)

    @jax.jit
    def f_1x1(x1, x2, x3):
        def loss(x):
            return jnp.sum(m3.apply(
                v3, {"x_conv1": x, "x_conv2": x2, "x_conv3": x3}
            ).astype(jnp.float32))
        return jax.grad(loss)(x1)

    timed("fuse fwd+bwd (no BN, conv_out 1x1)", f_1x1,
          (fm["x_conv1"], fm["x_conv2"], fm["x_conv3"]))


if __name__ == "__main__":
    main()
