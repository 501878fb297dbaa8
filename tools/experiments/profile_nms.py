"""NMS micro-decomposition on the TPU (chained-dispatch methodology).

Times, each as 8 chained evaluations inside one jit dispatch:
  topk   — the two-stage exact top-4096 over 321408 scores
  iou    — boxes_iou_bev on (4096, 4096) rotated pairs
  greedy — _greedy_suppress on a precomputed (4096, 4096) IoU (block from
           GDMAE_NMS_BLOCK, default 128)
  full   — whole nms_bev
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "full"
    block = int(os.environ.get("GDMAE_NMS_BLOCK", "128"))

    import jax
    import jax.numpy as jnp

    from gdmae_tpu.ops import iou_nms

    n, k = 321408, 4096
    rng = np.random.RandomState(0)
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0] = rng.uniform(0, 70, n)
    boxes[:, 1] = rng.uniform(-40, 40, n)
    boxes[:, 2] = rng.uniform(-2, 0, n)
    boxes[:, 3] = rng.uniform(1.5, 4.5, n)
    boxes[:, 4] = rng.uniform(1.4, 2.0, n)
    boxes[:, 5] = 1.5
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    scores = rng.rand(n).astype(np.float32)
    top_boxes = jnp.asarray(boxes[:k])
    iou_mat = None
    if which == "greedy":
        iou_mat = iou_nms.boxes_iou_bev(top_boxes, top_boxes)
        iou_mat.block_until_ready()

    def one(key):
        noise = jax.random.uniform(key, (1,)) * 1e-9
        if which == "topk":
            s = jnp.asarray(scores) + noise
            chunk = 1 << 16
            n_pad = -(-n // chunk) * chunk
            ms = jnp.concatenate(
                [s, jnp.full((n_pad - n,), -jnp.inf, s.dtype)])
            s2 = ms.reshape(-1, chunk)
            cs, ci = jax.lax.top_k(s2, k)
            base = (jnp.arange(s2.shape[0], dtype=jnp.int32) * chunk)[:, None]
            ts, pos = jax.lax.top_k(cs.reshape(-1), k)
            return ts.sum() + (ci + base).reshape(-1)[pos].sum()
        if which == "iou":
            tb = top_boxes + noise
            return iou_nms.boxes_iou_bev(tb, tb).sum()
        if which == "greedy":
            m = iou_mat + noise
            return iou_nms._greedy_suppress(
                m, jnp.ones((k,), bool), 0.01, block=block).sum()
        b = jnp.asarray(boxes) + noise
        ki, km, ks = iou_nms.nms_bev(b, jnp.asarray(scores) + noise[0],
                                     0.01, k, 500)
        return ks.sum() + km.sum()

    @jax.jit
    def chain(key):
        def body(carry, i):
            out = one(jax.random.fold_in(key, i))
            return carry + out.astype(jnp.float32), None
        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            jnp.arange(8))
        return s

    key = jax.random.PRNGKey(0)
    float(chain(key))

    pa = jnp.full((8192, 8192), 0.01, jnp.bfloat16)

    @jax.jit
    def probe(x):
        for _ in range(8):
            x = (x @ x) * 1e-4 + 0.01
        return x

    float(jnp.sum(probe(pa).astype(jnp.float32)))
    best = best_probe = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        float(jnp.sum(probe(pa).astype(jnp.float32)))
        best_probe = min(best_probe, (time.perf_counter() - t0) * 1e3 / 8)
        t0 = time.perf_counter()
        float(chain(key))
        best = min(best, (time.perf_counter() - t0) * 1e3 / 8)

    print(json.dumps({"which": which, "block": block,
                      "ms": round(best, 2),
                      "probe_ms": round(best_probe, 2)}), flush=True)


if __name__ == "__main__":
    main()
