"""A/B microbench: one packed SST encoder layer at MAE-bench shapes.

Isolates the encoder-math cost (measured ~122 ms of a 357 ms step for 12
layer passes at batch 16) and compares layout/precision variants with fast
per-variant compiles.  Usage: python tools/ab_encoder.py [variant ...]
Variants: base nockpt bf16logits nomove bigffn
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

B, S, C, H, FF = 16, 6656, 128, 8, 256
# stage-1 bench caps [160, 64, 32] with T [16, 32, 64]: 2560+2048+2048 = 6656
TS = [16] * (2560 // 128) + [32] * (2048 // 128) + [64] * (2048 // 128)


def timed(name, fn, args, iters=8, windows=4):
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

    from gdmae_tpu.models.model_utils.sst_layers import BucketEncoderLayer
    from gdmae_tpu.ops import window as window_ops

    variants = sys.argv[1:] or ["base", "nockpt", "bf16logits", "nomove"]
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    rng = np.random.RandomState(0)
    nb = S // 128

    feats = jnp.asarray(rng.randn(B, nb, 128, C).astype(np.float32), dtype=dtype)
    pos = jnp.asarray(rng.randn(B, nb, 128, C).astype(np.float32), dtype=dtype)
    valid = jnp.asarray(rng.rand(B, nb, 128) > 0.2)
    bias = window_ops.packed_block_bias(tuple(TS))

    layer = BucketEncoderLayer(C, H, FF, dtype=dtype)
    params = layer.init(jax.random.PRNGKey(0), feats, pos, valid, bias)

    if "base" in variants:
        @jax.jit
        def f_base(x):
            def loss(xx):
                return jnp.sum(layer.apply(
                    params, xx, pos, valid, bias).astype(jnp.float32))
            return jax.grad(loss)(x)
        timed("layer fwd+bwd (current)", f_base, (feats,))

    # hand-rolled variants of the attention+FFN math (same params)
    p = params["params"]
    qkv_w = jnp.asarray(p["win_attn"]["in_proj_weight"], dtype)
    qkv_b = jnp.asarray(p["win_attn"]["in_proj_bias"], dtype)
    out_w = jnp.asarray(p["win_attn"]["out_proj"]["kernel"], dtype)
    out_b = jnp.asarray(p["win_attn"]["out_proj"]["bias"], dtype)

    def attn_core(x, logits_dtype, move):
        hd = C // H
        q = x @ qkv_w[:, :C] + qkv_b[:C]
        k = x @ qkv_w[:, C:2 * C] + qkv_b[C:2 * C]
        v = x @ qkv_w[:, 2 * C:] + qkv_b[2 * C:]
        if move:
            def heads(t):
                t = t.reshape(B, nb, 128, H, hd)
                return jnp.moveaxis(t, -2, -3)
            qh, kh, vh = heads(q), heads(k), heads(v)
            qh = qh * jax.lax.rsqrt(
                jnp.sum(jnp.square(qh), -1, keepdims=True) + 1e-12)
            kh = kh * jax.lax.rsqrt(
                jnp.sum(jnp.square(kh), -1, keepdims=True) + 1e-12)
            logits = jnp.einsum("bnhtd,bnhsd->bnhts", qh, kh,
                                preferred_element_type=logits_dtype)
            logits = logits + bias.astype(logits_dtype)[None, :, None]
            logits = jnp.where(valid[:, :, None, None, :], logits, -1e9)
            attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            o = jnp.einsum("bnhts,bnhsd->bnhtd", attn.astype(vh.dtype), vh)
            o = jnp.moveaxis(o, -3, -2).reshape(B, nb, 128, C)
        else:
            def heads(t):
                return t.reshape(B, nb, 128, H, hd)
            qh, kh, vh = heads(q), heads(k), heads(v)
            qh = qh * jax.lax.rsqrt(
                jnp.sum(jnp.square(qh), -1, keepdims=True) + 1e-12)
            kh = kh * jax.lax.rsqrt(
                jnp.sum(jnp.square(kh), -1, keepdims=True) + 1e-12)
            logits = jnp.einsum("bnthd,bnshd->bnhts", qh, kh,
                                preferred_element_type=logits_dtype)
            logits = logits + bias.astype(logits_dtype)[None, :, None]
            logits = jnp.where(valid[:, :, None, None, :], logits, -1e9)
            attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            o = jnp.einsum("bnhts,bnshd->bnthd", attn.astype(vh.dtype), vh)
            o = o.reshape(B, nb, 128, C)
        return o @ out_w + out_b

    for name, ckpt, ldt, move in [
        ("nockpt", False, jnp.float32, True),
        ("bf16logits", True, dtype, True),
        ("nomove", True, jnp.float32, False),
    ]:
        if name not in variants:
            continue
        core = attn_core if not ckpt else None

        def make(ldt=ldt, move=move, ckpt=ckpt):
            def attn_only(x):
                fn = (jax.checkpoint(lambda xx: attn_core(xx, ldt, move))
                      if ckpt else (lambda xx: attn_core(xx, ldt, move)))
                return fn(x)

            @jax.jit
            def f(x):
                def loss(xx):
                    return jnp.sum(attn_only(xx).astype(jnp.float32))
                return jax.grad(loss)(x)
            return f

        timed(f"attn-only fwd+bwd ({name})", make(), (feats,))

    if "attnbase" in variants or True:
        def make_base_attn():
            def attn_only(x):
                return jax.checkpoint(
                    lambda xx: attn_core(xx, jnp.float32, True))(x)

            @jax.jit
            def f(x):
                def loss(xx):
                    return jnp.sum(attn_only(xx).astype(jnp.float32))
                return jax.grad(loss)(x)
            return f
        timed("attn-only fwd+bwd (ckpt f32 move=cur)", make_base_attn(), (feats,))


if __name__ == "__main__":
    main()
