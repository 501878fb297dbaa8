import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from gdmae_tpu.ops.pallas.window_attention import (
    fused_window_attention, reference_window_attention)

rng = np.random.RandomState(0)
ref_jit = jax.jit(reference_window_attention)
for (w, h, t, d) in [(10240, 8, 16, 16), (4096, 8, 32, 16), (2048, 8, 64, 32)]:
    q = jnp.asarray(rng.randn(w, h, t, d).astype(np.float32), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.randn(w, h, t, d).astype(np.float32), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.randn(w, h, t, d).astype(np.float32), dtype=jnp.bfloat16)
    valid = jnp.asarray(rng.rand(w, t) > 0.3).at[:, 0].set(True)
    got = fused_window_attention(q, k, v, valid)
    ref = ref_jit(q, k, v, valid)
    m = np.asarray(valid)[:, None, :, None]
    err = np.abs(np.asarray(got, np.float32) * m
                 - np.asarray(ref, np.float32) * m).max()
    for name, fn in [("pallas", fused_window_attention), ("xla", ref_jit)]:
        qq = q
        o = fn(qq, k, v, valid)
        float(jnp.sum(o.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(30):
            o = fn(qq, k, v, valid)
            qq = q + (o[0, 0, 0, 0].astype(q.dtype) * 1e-8)
        float(jnp.sum(o.astype(jnp.float32)))
        print(f"{w}x{h}x{t}x{d} {name}: "
              f"{(time.perf_counter() - t0) / 30 * 1e3:.2f} ms err={err:.4f}",
              flush=True)
