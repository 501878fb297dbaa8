"""Shape-dependence of elementwise bandwidth on the TPU backend."""
import sys, time
from pathlib import Path
import numpy as np
REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

def run(name, shape, dtype_str, iters=16):
    import jax, jax.numpy as jnp
    dt = dict(f32=jnp.float32, bf16=jnp.bfloat16, i32=jnp.int32)[dtype_str]
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dt)
    if dtype_str == "i32":
        x = jnp.asarray(rng.randint(0, 1000, shape), jnp.int32)
        def body(i, c): return c + 1
    else:
        def body(i, c): return c * dt(1.0000001) + dt(1e-9)
    @jax.jit
    def loop(c):
        return jax.lax.fori_loop(0, iters, body, c)
    c = loop(x); r0 = float(jnp.sum(jnp.ravel(c)[:4].astype(jnp.float32)))
    t0 = time.perf_counter()
    c = loop(c)
    r = float(jnp.sum(jnp.ravel(c)[:4].astype(jnp.float32)))
    d = (time.perf_counter() - t0) / iters
    nbytes = x.size * x.dtype.itemsize * 2
    print(f"{name} {shape} {dtype_str}: {d*1e3:.2f} ms -> {nbytes/d/1e9:.0f} GB/s", flush=True)

def main():
    run("ew", (32, 1024, 2048), "f32")
    run("ew", (64, 8192, 64), "f32")
    run("ew", (64 * 8192 * 64,), "f32")
    run("ew", (64 * 8192, 64), "f32")
    run("ew", (64, 8192 * 64), "f32")
    run("ew", (64, 8192, 128), "f32")
    run("ew", (64, 8192), "i32")
    run("ew", (64, 8192, 64), "i32")
    run("ew", (64 * 16384,), "i32")
main()
