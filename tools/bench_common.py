"""Shared synthetic-scan generation + window-cap derivation for the
benchmark and the ablation profiler (both must measure the SAME workload).

Two workloads:

* **kitti** — the original headline: front-facing ~±35° sweep, 16384
  points, 248x216 grid (kitti gd_mae_ssl.yaml geometry).
* **waymo** — the flagship scale (reference
  tools/cfgs/dataset_configs/waymo_dataset.yaml POINT_CLOUD_RANGE /
  VOXEL_SIZE): full 360° sweep, ±74.88 m, 468x468 grid, 163840-point
  scans, 32768 pillar capacity.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np


class BenchGeom(NamedTuple):
    """Grid geometry for cap derivation (matches the model's pillarizer)."""

    ny: int
    nx: int
    voxel: float
    x_off: float  # ix = (x + x_off) / voxel
    y_off: float  # iy = (y + y_off) / voxel


KITTI_GEOM = BenchGeom(248, 216, 0.32, 0.0, 39.68)
WAYMO_GEOM = BenchGeom(468, 468, 0.32, 74.88, 74.88)


def synth_scan(rng, batch_size, n):
    """LiDAR-like synthetic scans (KITTI-style front sweep): radial sweeps
    with 1/r range density + object clusters (uniform scatter would spread
    the masked pillar set over ~650 stage-1 windows and silently overflow
    any realistic window-capacity budget — see window_caps_for below)."""
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


def synth_scan_waymo(rng, batch_size, n):
    """Waymo-like synthetic scans: full 360° sweep to ±74.88 m with 1/r
    density + ~40 object clusters (Waymo scans average ~150-180k in-range
    returns over a much larger scene than KITTI's front crop)."""
    theta = rng.uniform(-np.pi, np.pi, (batch_size, n))
    u = rng.uniform(0.05, 1.0, (batch_size, n))
    r = 72.0 * u ** 2 + 1.5
    pts = np.zeros((batch_size, n, 4), np.float32)
    pts[..., 0] = np.clip(r * np.cos(theta), -74.5, 74.5)
    pts[..., 1] = np.clip(r * np.sin(theta), -74.5, 74.5)
    pts[..., 2] = rng.normal(-1.0, 0.35, (batch_size, n))
    k = max(1, n // 256)
    for bi in range(batch_size):
        for _ in range(40):
            ang = rng.uniform(-np.pi, np.pi)
            rad = rng.uniform(4, 60)
            cx, cy = rad * np.cos(ang), rad * np.sin(ang)
            sel = rng.choice(n, k, replace=False)
            pts[bi, sel, 0] = np.clip(cx + rng.normal(0, 1.4, k), -74.5, 74.5)
            pts[bi, sel, 1] = np.clip(cy + rng.normal(0, 1.0, k), -74.5, 74.5)
            pts[bi, sel, 2] = rng.uniform(-1.6, 1.2, k)
    pts[..., 3] = rng.uniform(0, 1, (batch_size, n))
    return pts


def _sample_cells(pts_b, geom: BenchGeom, mask_ratio, rng):
    """Active (possibly MAE-masked) cells of one scan on geom's grid."""
    ix = ((pts_b[:, 0] + geom.x_off) / geom.voxel).astype(np.int64)
    iy = ((pts_b[:, 1] + geom.y_off) / geom.voxel).astype(np.int64)
    ok = (ix >= 0) & (ix < geom.nx) & (iy >= 0) & (iy < geom.ny)
    cells = np.unique(iy[ok] * geom.nx + ix[ok])
    if mask_ratio > 0:
        cells = cells[rng.rand(len(cells)) > mask_ratio]
    return cells


def _downsample_cells(cy, cx, ny, nx):
    """TRUE stride-2 kernel-3 footprint: output p covers inputs
    [2p-1, 2p+1], so input i activates p in {i//2, (i+1)//2} — at most 4
    output cells, exactly matching the model's dilate_occupancy (max_pool
    k=3 s=2).  (A 3x3 neighborhood at OUTPUT resolution — 9 cells —
    overstates stage-2 window counts ~2x and the derived caps with them.)"""
    ny2, nx2 = -(-ny // 2), -(-nx // 2)
    nxt = set()
    for py in (cy // 2, (cy + 1) // 2):
        for px in (cx // 2, (cx + 1) // 2):
            yy = np.clip(py, 0, ny2 - 1)
            xx = np.clip(px, 0, nx2 - 1)
            nxt.update((yy * nx2 + xx).tolist())
    arr = np.fromiter(nxt, np.int64) if nxt else np.zeros((0,), np.int64)
    return arr // nx2, arr % nx2, ny2, nx2


def window_caps_for(pts, mask_ratio=0.85, margin=1.25, drop_specs=None,
                    geom: BenchGeom = KITTI_GEOM):
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
    need = [[1] * n_lvl for _ in range(3)]
    for bi in range(pts.shape[0]):
        cells = _sample_cells(pts[bi], geom, mask_ratio, rng)
        ny, nx = geom.ny, geom.nx
        cy, cx = cells // geom.nx, cells % geom.nx
        for stage in range(3):
            win = (cy // 8) * ((nx + 7) // 8) + cx // 8
            _, cnt = np.unique(win, return_counts=True)
            for li, (_, lo, hi) in enumerate(drop_specs):
                need[stage][li] = max(
                    need[stage][li],
                    int(((cnt >= max(lo, 1)) & (cnt < hi)).sum()))
            cy, cx, ny, nx = _downsample_cells(cy, cx, ny, nx)
    aligns = [cap_align(min(mt, 64)) for mt, _, _ in drop_specs]
    return [tuple(max(a, -(-int(need[s][li] * margin) // a) * a)
                  for li, a in enumerate(aligns)) for s in range(3)]


def joint_budgets_for(pts, mask_ratio=0.85, margin=1.25, drop_specs=None,
                      geom: BenchGeom = KITTI_GEOM, pack: str = "pow2"):
    """Zero-overflow per-stage JOINT token budgets for THIS data
    (ops.window.JointPlan): max over samples of the sample's TOTAL padded
    tokens sum_l n_l * T_l, x margin, rounded up to 128.  Unlike per-level
    caps (max per level independently), samples never peak every level at
    once, so the joint budget is ~1.5-2x tighter (measured 5120 -> 4096 at
    MAE-bench stage 2).

    ``pack``: 'pow2' (each window padded to its level's max_tokens slot) or
    'dense' (TPU_JOINT_PACK: dense — next-fit-decreasing with exact window
    sizes and 128-block alignment, same layout as the plan builders)."""
    if drop_specs is None:
        drop_specs = [(16, 1, 16), (32, 16, 32), (64, 32, 10 ** 9)]
    drop_specs = [tuple(int(v) for v in s) for s in drop_specs]
    rng = np.random.RandomState(7)
    joint = [128] * 3
    for bi in range(pts.shape[0]):
        cells = _sample_cells(pts[bi], geom, mask_ratio, rng)
        ny, nx = geom.ny, geom.nx
        cy, cx = cells // geom.nx, cells % geom.nx
        for stage in range(3):
            win = (cy // 8) * ((nx + 7) // 8) + cx // 8
            _, cnt = np.unique(win, return_counts=True)
            if pack == "dense":
                sizes = np.zeros_like(cnt)
                for mt, lo, hi in drop_specs:
                    sel = (cnt >= max(lo, 1)) & (cnt < hi)
                    sizes = np.where(sel, np.minimum(cnt, min(mt, 64)),
                                     sizes)
                off = 0
                for t in np.sort(sizes[sizes > 0])[::-1]:
                    t = int(t)
                    if (off % 128) + t > 128:
                        off = (off // 128 + 1) * 128
                    off += t
                tot = off
            else:
                tot = sum(
                    int(((cnt >= max(lo, 1)) & (cnt < hi)).sum())
                    * min(mt, 64)
                    for mt, lo, hi in drop_specs)
            joint[stage] = max(joint[stage], tot)
            cy, cx, ny, nx = _downsample_cells(cy, cx, ny, nx)
    return [int(-(-int(j * margin) // 128) * 128) for j in joint]
