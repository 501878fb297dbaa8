"""Raw MXU peak probe on the current accelerator (honest timing)."""
import time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    N = 8192
    a = jnp.asarray(rng.randn(N, N).astype(np.float32), jnp.bfloat16)
    b = jnp.asarray(rng.randn(N, N).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        return a @ b

    o = mm(a, b)
    prev = float(jnp.sum(o[0, :8]))
    iters = 16
    t0 = time.perf_counter()
    for i in range(iters):
        a2 = a.at[0, 0].add(jnp.bfloat16(prev) * jnp.bfloat16(1e-8))
        o = mm(a2, b)
        prev = float(jnp.sum(o[0, :8]))
    dt = (time.perf_counter() - t0) / iters
    flops = 2 * N**3
    print(f"matmul {N}x{N}: {dt*1e3:.2f} ms -> {flops/dt/1e12:.1f} TFLOP/s", flush=True)

    # Also: pure bandwidth probe (copy 1 GB)
    x = jnp.asarray(rng.randn(64, 1024, 2048).astype(np.float32), jnp.bfloat16)
    @jax.jit
    def cp(x):
        return x * jnp.bfloat16(1.0000001) + jnp.bfloat16(1e-9)
    o = cp(x); prev = float(o[0,0,0])
    t0 = time.perf_counter()
    for i in range(iters):
        x2 = x.at[0,0,0].add(jnp.bfloat16(prev)*jnp.bfloat16(1e-8))
        o = cp(x2)
        prev = float(o[0,0,0])
    dt = (time.perf_counter() - t0) / iters
    nbytes = x.size * 2 * 2  # read+write
    print(f"elementwise {x.size*2/1e6:.0f} MB: {dt*1e3:.2f} ms -> {nbytes/dt/1e9:.0f} GB/s", flush=True)

main()
