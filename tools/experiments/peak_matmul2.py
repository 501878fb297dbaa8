"""On-device chained probes: fori_loop, single dispatch, one readback."""
import time
import numpy as np

def run(name, fn, args, flops=None, nbytes=None, iters=32):
    import jax, jax.numpy as jnp
    f = jax.jit(fn, static_argnums=0)
    o = f(iters, *args); r0 = float(jnp.sum(jnp.ravel(o)[:4]))  # compile+exec fence
    t0 = time.perf_counter()
    o = f(iters, *args)
    r = float(jnp.sum(jnp.ravel(o)[:4]))
    dt = (time.perf_counter() - t0) / iters
    msg = f"{name}: {dt*1e3:.2f} ms/iter"
    if flops: msg += f" -> {flops/dt/1e12:.1f} TFLOP/s"
    if nbytes: msg += f" -> {nbytes/dt/1e9:.0f} GB/s"
    print(msg, flush=True)

def main():
    import jax, jax.numpy as jnp
    from functools import partial
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    N = 4096
    a = jnp.asarray(rng.randn(N, N).astype(np.float32) * 0.01, jnp.bfloat16)
    b = jnp.asarray(rng.randn(N, N).astype(np.float32) * 0.01, jnp.bfloat16)

    def mm_loop(iters, a, b):
        def body(i, c):
            return (c @ b) * jnp.bfloat16(0.001)
        return jax.lax.fori_loop(0, iters, body, a)
    run(f"matmul {N} chain", mm_loop, (a, b), flops=2*N**3)

    x = jnp.asarray(rng.randn(32, 1024, 2048).astype(np.float32), jnp.bfloat16)
    def ew_loop(iters, x):
        def body(i, x):
            return x * jnp.bfloat16(1.0000001) + jnp.bfloat16(1e-9)
        return jax.lax.fori_loop(0, iters, body, x)
    run("elementwise 128MB chain", ew_loop, (x,), nbytes=x.size*2*2)

    # conv chain at bench shape
    c = jnp.asarray(rng.randn(64, 248, 216, 128).astype(np.float32)*0.01, jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 128, 128).astype(np.float32)*0.01, jnp.bfloat16)
    def conv_loop(iters, c, w):
        def body(i, c):
            o = jax.lax.conv_general_dilated(c, w, (1,1), "SAME",
                dimension_numbers=("NHWC","HWIO","NHWC"))
            return o * jnp.bfloat16(0.01)
        return jax.lax.fori_loop(0, iters, body, c)
    fl = 64*248*216*128*128*9*2
    run("conv3x3 (64,248,216,128) chain", conv_loop, (c, w), flops=fl,
        nbytes=c.size*2*2, iters=16)

main()
