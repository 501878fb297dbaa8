"""Non-collapsible elementwise bodies: find the REAL bandwidth."""
import sys, time
from pathlib import Path
import numpy as np
REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

def run(name, shape, dtype_str, body_kind, iters=16):
    import jax, jax.numpy as jnp
    dt = dict(f32=jnp.float32, bf16=jnp.bfloat16)[dtype_str]
    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.rand(*shape) * 0.5 + 0.5).astype(np.float32)).astype(dt)
    if body_kind == "affine":
        def body(i, c): return c * dt(1.0000001) + dt(1e-9)
    elif body_kind == "square":
        def body(i, c):
            # sqrt(x)*~1 keeps values stable, can't be collapsed across iters
            return jnp.sqrt(c) * dt(1.0000001)
    @jax.jit
    def loop(c):
        return jax.lax.fori_loop(0, iters, body, c)
    c = loop(x); r0 = float(jnp.sum(jnp.ravel(c)[:4].astype(jnp.float32)))
    t0 = time.perf_counter()
    c = loop(c)
    r = float(jnp.sum(jnp.ravel(c)[:4].astype(jnp.float32)))
    d = (time.perf_counter() - t0) / iters
    nbytes = x.size * x.dtype.itemsize * 2
    print(f"{name} {shape} {dtype_str} {body_kind}: {d*1e3:.2f} ms -> {nbytes/d/1e9:.0f} GB/s", flush=True)

def main():
    run("ew", (32, 1024, 2048), "f32", "affine")
    run("ew", (32, 1024, 2048), "f32", "square")
    run("ew", (64, 524288), "f32", "square")
    run("ew", (64, 8192, 64), "f32", "square")
    run("ew", (64, 248, 216, 128), "bf16", "square")
    run("ew", (64, 248, 216, 128), "bf16", "affine")
    run("ew", (128, 1024, 2048), "f32", "square")
main()
