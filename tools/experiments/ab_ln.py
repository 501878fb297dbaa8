import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from gdmae_tpu.ops.pallas.fused_layernorm import (
    fused_add_layernorm, reference_add_layernorm)

rng = np.random.RandomState(0)
ref_jit = jax.jit(reference_add_layernorm)
for (n, c) in [(163840, 128), (131072, 256)]:
    x = jnp.asarray(rng.randn(n, c).astype(np.float32), dtype=jnp.bfloat16)
    res = jnp.asarray(rng.randn(n, c).astype(np.float32), dtype=jnp.bfloat16)
    gamma = jnp.ones((c,), jnp.float32)
    beta = jnp.zeros((c,), jnp.float32)
    got = fused_add_layernorm(x, res, gamma, beta)
    ref = ref_jit(x, res, gamma, beta)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32)).max()

    # fwd+bwd A/B, chained
    def make_loss(fn, **kw):
        def loss(x):
            return jnp.sum(fn(x, res, gamma, beta, **kw).astype(jnp.float32) ** 2)
        return jax.jit(jax.grad(loss))

    for name, gfn in [("pallas", make_loss(fused_add_layernorm)),
                      ("xla", make_loss(reference_add_layernorm))]:
        xx = x
        g = gfn(xx)
        float(jnp.sum(g.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(30):
            g = gfn(xx)
            xx = x + g[0, 0].astype(x.dtype) * 1e-8
        float(jnp.sum(g.astype(jnp.float32)))
        print(f"({n},{c}) {name} fwd+bwd: "
              f"{(time.perf_counter() - t0) / 30 * 1e3:.2f} ms err={err:.4f}",
              flush=True)
