"""Calibration + encoder-layer breakdown probes."""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)

    def timeit(fn, iters=10):
        carry = fn(jnp.float32(0.0))
        float(carry)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = fn(carry)
        float(carry)
        return (time.perf_counter() - t0) / iters * 1e3

    @jax.jit
    def noop(c):
        return c + 1.0

    print(f"noop dispatch+RTT: {timeit(noop, iters=20):.1f} ms", flush=True)

    W, T, C, H = 10240, 16, 128, 8
    D = C // H
    x = jnp.asarray(rng.randn(W, T, C).astype(np.float32), jnp.bfloat16)
    valid = jnp.asarray(rng.rand(W, T) > 0.2)
    w1 = jnp.asarray(rng.randn(C, 2 * C).astype(np.float32) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(2 * C, C).astype(np.float32) * 0.05, jnp.bfloat16)
    wq = jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.05, jnp.bfloat16)

    @jax.jit
    def ffn_only(c):
        y = x + (c * 1e-30).astype(x.dtype)
        y = jax.nn.gelu(y @ w1) @ w2
        return jnp.sum(y[0, 0].astype(jnp.float32))

    print(f"ffn_only(W={W},T={T},C={C}): {timeit(ffn_only):.1f} ms", flush=True)

    @jax.jit
    def attn_xla(c):
        y = x + (c * 1e-30).astype(x.dtype)
        q = (y @ wq).reshape(W, T, H, D).transpose(0, 2, 1, 3)
        k = (y @ wq).reshape(W, T, H, D).transpose(0, 2, 1, 3)
        v = (y @ wq).reshape(W, T, H, D).transpose(0, 2, 1, 3)
        logits = jnp.einsum("whtd,whsd->whts", q, k,
                            preferred_element_type=jnp.float32)
        logits = jnp.where(valid[:, None, None, :], logits, -1e9)
        a = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("whts,whsd->whtd", a.astype(y.dtype), v)
        return jnp.sum(o[0, 0, 0].astype(jnp.float32))

    print(f"attn_xla(W={W},T={T}): {timeit(attn_xla):.1f} ms", flush=True)

    from gdmae_tpu.ops.pallas.window_attention import fused_window_attention

    @jax.jit
    def attn_pallas(c):
        y = x + (c * 1e-30).astype(x.dtype)
        q = (y @ wq).reshape(W, T, H, D).transpose(0, 2, 1, 3)
        o = fused_window_attention(q, q, q, valid)
        return jnp.sum(o[0, 0, 0].astype(jnp.float32))

    print(f"attn_pallas(W={W},T={T}): {timeit(attn_pallas):.1f} ms", flush=True)

    @jax.jit
    def layernorm_only(c):
        y = x + (c * 1e-30).astype(x.dtype)
        for _ in range(2):
            mu = jnp.mean(y.astype(jnp.float32), -1, keepdims=True)
            var = jnp.var(y.astype(jnp.float32), -1, keepdims=True)
            y = ((y - mu) * jax.lax.rsqrt(var + 1e-5)).astype(y.dtype)
        return jnp.sum(y[0, 0].astype(jnp.float32))

    print(f"layernorm_x2: {timeit(layernorm_only):.1f} ms", flush=True)

    # gather/scatter buckets on a (64, 248, 216, 128) canvas
    B, NY, NX = 64, 248, 216
    canvas = jnp.asarray(
        rng.randn(B * NY * NX, C).astype(np.float32), jnp.bfloat16)
    src = jnp.asarray(
        rng.randint(0, B * NY * NX, (W, T)).astype(np.int32))

    @jax.jit
    def gather_only(c):
        cv = canvas.at[0, 0].add((c * 1e-30).astype(canvas.dtype))
        toks = cv[src]
        return jnp.sum(toks[0, 0].astype(jnp.float32))

    print(f"bucket_gather(WxT={W * T}): {timeit(gather_only):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
