"""Shared synthetic-scan generation + window-cap derivation for the
benchmark and the ablation profiler (both must measure the SAME workload)."""
from __future__ import annotations

import numpy as np


def synth_scan(rng, batch_size, n):
    """LiDAR-like synthetic scans: radial sweeps with 1/r range density
    + object clusters (uniform scatter would spread the masked pillar
    set over ~650 stage-1 windows and silently overflow any realistic
    window-capacity budget — see window_caps_for below)."""
    theta = rng.uniform(-0.62, 0.62, (batch_size, n))  # ~±35°
    u = rng.uniform(0.08, 1.0, (batch_size, n))
    r = 68.0 * u ** 2 + 1.0  # 1/r-ish density: most points near sensor
    pts = np.zeros((batch_size, n, 4), np.float32)
    pts[..., 0] = np.clip(r * np.cos(theta), 0.5, 68.5)
    pts[..., 1] = np.clip(r * np.sin(theta), -39.0, 39.0)
    pts[..., 2] = rng.normal(-1.6, 0.25, (batch_size, n))
    # ~12 object clusters per scan
    k = max(1, n // 64)
    for bi in range(batch_size):
        for _ in range(12):
            cx, cy = rng.uniform(3, 50), rng.uniform(-20, 20)
            sel = rng.choice(n, k, replace=False)
            pts[bi, sel, 0] = np.clip(cx + rng.normal(0, 1.2, k), 0.5, 68.5)
            pts[bi, sel, 1] = np.clip(cy + rng.normal(0, 0.8, k), -39, 39)
            pts[bi, sel, 2] = rng.uniform(-2.0, 0.3, k)
    pts[..., 3] = rng.uniform(0, 1, (batch_size, n))
    return pts

def window_caps_for(pts, mask_ratio=0.85, margin=1.25, drop_specs=None):
    """Zero-overflow per-level window caps for THIS data (numpy,
    host-side; caps are static per process).  Counts nonempty 8x8
    windows per drop level for the ~15% kept pillar set, propagating
    the footprint through each stage's stride-2 downsample + 3x3
    dilation.  Undersized caps silently DROP whole windows from the
    encoder and understate the attention work being benchmarked.

    ``drop_specs``: optional per-level ``(max_tokens, lower, upper)``
    list applied at every stage (e.g. the pow2-refined packing spec from
    ``gdmae_tpu.ops.window.packing_specs``); defaults to the shipped
    16/32/64 DROP_INFO.  Caps are rounded up so every level's
    ``cap * max_tokens`` is a whole number of 128-wide attention tiles
    (``cap_align``), keeping the packed attention path valid."""
    from gdmae_tpu.ops.window import cap_align

    if drop_specs is None:
        drop_specs = [(16, 1, 16), (32, 16, 32), (64, 32, 10 ** 9)]
    drop_specs = [tuple(int(v) for v in s) for s in drop_specs]
    n_lvl = len(drop_specs)
    rng = np.random.RandomState(7)
    ny0, nx0 = 248, 216
    need = [[1] * n_lvl for _ in range(3)]
    for bi in range(pts.shape[0]):
        ix = (pts[bi, :, 0] / 0.32).astype(np.int64)
        iy = ((pts[bi, :, 1] + 39.68) / 0.32).astype(np.int64)
        ok = (ix >= 0) & (ix < nx0) & (iy >= 0) & (iy < ny0)
        cells = np.unique(iy[ok] * nx0 + ix[ok])
        cells = cells[rng.rand(len(cells)) > mask_ratio]
        ny, nx = ny0, nx0
        cy, cx = cells // nx0, cells % nx0
        for stage in range(3):
            win = (cy // 8) * ((nx + 7) // 8) + cx // 8
            _, cnt = np.unique(win, return_counts=True)
            for li, (_, lo, hi) in enumerate(drop_specs):
                need[stage][li] = max(
                    need[stage][li],
                    int(((cnt >= max(lo, 1)) & (cnt < hi)).sum()))
            ny2, nx2 = -(-ny // 2), -(-nx // 2)
            # TRUE stride-2 kernel-3 footprint: output p covers inputs
            # [2p-1, 2p+1], so input i activates p in {i//2, (i+1)//2} —
            # at most 4 output cells, exactly matching the model's
            # dilate_occupancy (max_pool k=3 s=2).  The earlier 3x3
            # neighborhood at OUTPUT resolution (9 cells) overstated
            # stage-2 window counts ~2x and the derived caps with them.
            nxt = set()
            for py in (cy // 2, (cy + 1) // 2):
                for px in (cx // 2, (cx + 1) // 2):
                    yy = np.clip(py, 0, ny2 - 1)
                    xx = np.clip(px, 0, nx2 - 1)
                    nxt.update((yy * nx2 + xx).tolist())
            arr = np.fromiter(nxt, np.int64)
            cy, cx = arr // nx2, arr % nx2
            ny, nx = ny2, nx2
    aligns = [cap_align(min(mt, 64)) for mt, _, _ in drop_specs]
    return [tuple(max(a, -(-int(need[s][li] * margin) // a) * a)
                  for li, a in enumerate(aligns)) for s in range(3)]


def joint_budgets_for(pts, mask_ratio=0.85, margin=1.25, drop_specs=None):
    """Zero-overflow per-stage JOINT token budgets for THIS data
    (ops.window.JointPlan): max over samples of the sample's TOTAL padded
    tokens sum_l n_l * T_l, x margin, rounded up to 128.  Unlike per-level
    caps (max per level independently), samples never peak every level at
    once, so the joint budget is ~1.5-2x tighter (measured 5120 -> 4096 at
    MAE-bench stage 2)."""
    if drop_specs is None:
        drop_specs = [(16, 1, 16), (32, 16, 32), (64, 32, 10 ** 9)]
    drop_specs = [tuple(int(v) for v in s) for s in drop_specs]
    rng = np.random.RandomState(7)
    ny0, nx0 = 248, 216
    joint = [128] * 3
    for bi in range(pts.shape[0]):
        ix = (pts[bi, :, 0] / 0.32).astype(np.int64)
        iy = ((pts[bi, :, 1] + 39.68) / 0.32).astype(np.int64)
        ok = (ix >= 0) & (ix < nx0) & (iy >= 0) & (iy < ny0)
        cells = np.unique(iy[ok] * nx0 + ix[ok])
        cells = cells[rng.rand(len(cells)) > mask_ratio]
        ny, nx = ny0, nx0
        cy, cx = cells // nx0, cells % nx0
        for stage in range(3):
            win = (cy // 8) * ((nx + 7) // 8) + cx // 8
            _, cnt = np.unique(win, return_counts=True)
            tot = sum(
                int(((cnt >= max(lo, 1)) & (cnt < hi)).sum()) * min(mt, 64)
                for mt, lo, hi in drop_specs)
            joint[stage] = max(joint[stage], tot)
            ny2, nx2 = -(-ny // 2), -(-nx // 2)
            nxt = set()
            for py in (cy // 2, (cy + 1) // 2):
                for px in (cx // 2, (cx + 1) // 2):
                    yy = np.clip(py, 0, ny2 - 1)
                    xx = np.clip(px, 0, nx2 - 1)
                    nxt.update((yy * nx2 + xx).tolist())
            arr = np.fromiter(nxt, np.int64)
            cy, cx = arr // nx2, arr % nx2
            ny, nx = ny2, nx2
    return [int(-(-int(j * margin) // 128) * 128) for j in joint]
