"""Host (numpy) twins of the device pillarization + MAE target build.

Index building is pure data movement with no gradient, so on TPU it
belongs in the input pipeline, where it overlaps with device compute —
the device-side MAE GT grouping (full-M sorted scatter + compact gather)
measured ~35 ms of a ~265 ms pretrain step at batch 16 (PERFORMANCE.md),
while the numpy equivalent here is <2 ms/sample of loader time.

Exactness contract: :func:`pillarize_np` must order pillars and points
IDENTICALLY to ``ops.scatter.dynamic_pillarize`` (ascending linear cell
id, stable within a cell, capacity-clipped) — the device consumes the
host mask/GT sets positionally.  ``tests/test_host_pillarize.py`` pins
host==device on clustered random scans.

Reference behavior mirrored: random masking ratio/count semantics from
pcdet/utils/common_utils.py:49-63, GT set = first NUM_GT_POINTS points
of each masked pillar (spt_backbone_mae.py:67 via sst_ops
group_inner_inds).
"""
from __future__ import annotations

import numpy as np


def pillarize_np(points_xyz, point_mask, pc_range, voxel_size, grid_size,
                 max_pillars):
    """Numpy twin of ``ops.scatter.dynamic_pillarize`` (one sample).

    Args:
        points_xyz: (N, 3+) float array — only xyz used.
        point_mask: (N,) bool.
        pc_range / voxel_size / grid_size / max_pillars: as on device.
    Returns:
        dict with ``order`` (N,) int32 stable sort permutation,
        ``point_pillar`` (N,) int32 slot per SORTED point (M = trash),
        ``pillar_coords`` (M, 2|3), ``pillar_mask`` (M,), ``pillar_start``
        (M,), ``pillar_count`` (M,), ``num_pillars`` int.
    """
    n = points_xyz.shape[0]
    m = int(max_pillars)
    nx, ny = int(grid_size[0]), int(grid_size[1])
    nz = int(grid_size[2]) if len(grid_size) > 2 else 1
    pc = np.asarray(pc_range, np.float32)
    vs = np.asarray(voxel_size, np.float32)
    p = points_xyz[:, :3].astype(np.float32)

    # identical f32 arithmetic to the device (boundary cells must agree)
    ix = np.floor((p[:, 0] - pc[0]) / vs[0]).astype(np.int32)
    iy = np.floor((p[:, 1] - pc[1]) / vs[1]).astype(np.int32)
    iz = np.floor((p[:, 2] - pc[2]) / vs[2]).astype(np.int32)
    in_range = ((ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
                & (iz >= 0) & (iz < nz) & np.asarray(point_mask, bool))
    sentinel = nx * ny * nz
    pid = np.where(in_range, (iz * ny + iy) * nx + ix, sentinel)

    order = np.argsort(pid, kind="stable").astype(np.int32)
    sorted_pid = pid[order]
    valid_sorted = sorted_pid < sentinel
    is_first = valid_sorted.copy()
    is_first[1:] &= sorted_pid[1:] != sorted_pid[:-1]
    rank_sorted = np.cumsum(is_first.astype(np.int32)) - 1
    num_pillars = int(is_first.sum())
    in_cap = valid_sorted & (rank_sorted < m)
    point_pillar = np.where(in_cap, rank_sorted, m).astype(np.int32)

    idx = np.arange(n, dtype=np.int32)
    start_or_big = np.where(is_first & in_cap, idx, n)
    starts = np.sort(start_or_big)[:m].astype(np.int32)
    n_eff = int(in_cap.sum())
    next_start = np.concatenate([starts[1:], np.full(1, n, np.int32)])
    counts = (np.minimum(next_start, n_eff)
              - np.minimum(starts, n_eff)).astype(np.int32)
    pillar_mask = counts > 0
    lin = np.where(pillar_mask, sorted_pid[np.clip(starts, 0, n - 1)], 0)
    if nz > 1:
        pillar_coords = np.stack(
            [lin // (nx * ny), (lin // nx) % ny, lin % nx], axis=-1)
    else:
        pillar_coords = np.stack([lin // nx, lin % nx], axis=-1)
    return {
        "order": order,
        "point_pillar": point_pillar,
        "pillar_coords": pillar_coords.astype(np.int32),
        "pillar_mask": pillar_mask,
        "pillar_start": starts,
        "pillar_count": counts,
        "num_pillars": num_pillars,
    }


def pillarize_batch_np(points, point_mask, pc_range, voxel_size, grid_size,
                       max_pillars):
    """Batch pillarize + pre-sort for the device ``host_pillar_*`` path.

    DynVFE consumes these arrays directly and skips both device sorts and
    the point-reorder gather (~10 ms of a ~235 ms MAE step at batch 16).
    Returns ``(batch_arrays, sorted_points, sorted_point_mask)`` where
    ``batch_arrays`` holds ``host_pillar_coords/mask/start/count``,
    ``host_point_pillar`` and ``host_num_pillars`` — all positionally
    identical to ``ops.scatter.dynamic_pillarize`` on the SORTED points.
    """
    b, n = points.shape[0], points.shape[1]
    m = int(max_pillars)
    nz3d = len(grid_size) > 2 and int(grid_size[2]) > 1
    out = {
        "host_pillar_coords": np.zeros((b, m, 3 if nz3d else 2), np.int32),
        "host_pillar_mask": np.zeros((b, m), bool),
        "host_pillar_start": np.zeros((b, m), np.int32),
        "host_pillar_count": np.zeros((b, m), np.int32),
        "host_point_pillar": np.zeros((b, n), np.int32),
        "host_num_pillars": np.zeros((b,), np.int32),
    }
    sorted_pts = np.empty_like(points)
    sorted_mask = np.empty_like(np.asarray(point_mask, bool))
    for s in range(b):
        res = pillarize_np(points[s], point_mask[s], pc_range, voxel_size,
                           grid_size, m)
        out["host_pillar_coords"][s] = res["pillar_coords"]
        out["host_pillar_mask"][s] = res["pillar_mask"]
        out["host_pillar_start"][s] = res["pillar_start"]
        out["host_pillar_count"][s] = res["pillar_count"]
        out["host_point_pillar"][s] = res["point_pillar"]
        out["host_num_pillars"][s] = res["num_pillars"]
        sorted_pts[s] = points[s][res["order"]]
        sorted_mask[s] = np.asarray(point_mask[s], bool)[res["order"]]
    return out, sorted_pts, sorted_mask


def mae_host_targets(points, point_mask, pc_range, voxel_size, grid_size,
                     max_pillars, mask_ratio, num_gt, m_dec, rng,
                     m_enc=None, tables=None):
    """Draw the MAE mask and group the masked pillars' GT point sets on host.

    Mirrors the device path exactly: the mask keeps
    ``floor(n_valid*(1-ratio))`` pillars (reference
    common_utils.random_masking), invalid slots are marked masked, and GT
    sets are emitted for the first ``m_dec`` masked REAL pillars in
    ascending slot order — the same order as the device's
    ``nonzero((mask > 0) & pillar_mask)`` compaction.

    Args:
        points: (B, N, C) float (xyz first).
        point_mask: (B, N) bool.
        mask_ratio / num_gt: MODEL.BACKBONE_3D.MASK_CONFIG values.
        m_dec: static decode capacity (TPU_MAE_DEC_CAP or its default).
        rng: ``np.random.Generator`` or ``np.random.RandomState``.
        tables: optional dict from :func:`pillarize_batch_np` — ``points``
            must then be the SORTED points it returned; skips the internal
            re-pillarization.
    Returns:
        dict of batch arrays: ``host_mae_mask`` (B, M) float32 (1 =
        masked), ``host_mae_gt_rel`` (B, m_dec, num_gt, 3) float16 —
        GT points MINUS their pillar center (the exact quantity the
        chamfer loss consumes, reference spt_backbone_mae.py:69-72; the
        ±few-meter in-pillar offsets fit f16 at ≲5 mm, and shipping f16
        quarters the per-step H2D bytes of the dominant batch tensor),
        ``host_mae_gt_mask`` (B, m_dec, num_gt) bool.
    """
    b, n = points.shape[0], points.shape[1]
    m = int(max_pillars)
    vx, vy, vz = (float(voxel_size[0]), float(voxel_size[1]),
                  float(voxel_size[2]))
    x0, y0, z0 = (float(pc_range[0]), float(pc_range[1]),
                  float(pc_range[2]))
    mask_out = np.ones((b, m), np.float32)
    gt_rel_out = np.zeros((b, m_dec, num_gt, 3), np.float16)
    gt_mask_out = np.zeros((b, m_dec, num_gt), bool)
    dec_idx_out = np.full((b, m_dec), m, np.int32)
    keep_idx_out = (np.full((b, m_enc), m, np.int32)
                    if m_enc is not None else None)
    uniform = rng.random if hasattr(rng, "random") else rng.random_sample
    kk = np.arange(num_gt, dtype=np.int64)[None, :]

    for s in range(b):
        if tables is not None:
            res = {"pillar_mask": tables["host_pillar_mask"][s],
                   "pillar_start": tables["host_pillar_start"][s],
                   "pillar_count": tables["host_pillar_count"][s],
                   "pillar_coords": tables["host_pillar_coords"][s]}
        else:
            res = pillarize_np(points[s], point_mask[s], pc_range,
                               voxel_size, grid_size, m)
        valid = res["pillar_mask"]
        n_valid = int(valid.sum())
        len_keep = int(n_valid * (1.0 - mask_ratio))
        noise = np.where(valid, uniform(m).astype(np.float32), np.inf)
        # keep-set = the len_keep smallest noise values: argpartition picks
        # the same set as a full argsort (iid continuous noise — exact f32
        # ties are ~2^-24/pair) at ~12x less host time per sample
        keep_slots = (np.argpartition(noise, len_keep)[:len_keep]
                      if 0 < len_keep < m else
                      np.argsort(noise, kind="stable")[:len_keep])
        keep = np.zeros(m, bool)
        keep[keep_slots] = True
        keep &= valid
        mask_out[s, keep] = 0.0

        dec_slots = np.nonzero(valid & ~keep)[0][:m_dec]
        d = len(dec_slots)
        dec_idx_out[s, :d] = dec_slots
        if keep_idx_out is not None:
            ks = np.nonzero(keep)[0][:m_enc]
            keep_idx_out[s, :len(ks)] = ks
        if tables is not None:  # order is identity: skip the fancy gather
            sorted_pts = points[s, :, :3].astype(np.float32)
        else:
            sorted_pts = points[s, res["order"], :3].astype(np.float32)
        starts = res["pillar_start"][dec_slots].astype(np.int64)  # (d,)
        counts = np.minimum(res["pillar_count"][dec_slots], num_gt)
        rows = np.clip(starts[:, None] + kk, 0, n - 1)  # (d, num_gt)
        mrow = kk < counts[:, None]
        g = sorted_pts[rows]  # (d, num_gt, 3)
        coords = res["pillar_coords"][dec_slots]  # (d, 2|3) [.., iy, ix]
        centers = np.stack([
            (coords[:, -1] + 0.5) * vx + x0,
            (coords[:, -2] + 0.5) * vy + y0,
            np.full(d, 0.5 * vz + z0, np.float32),
        ], axis=-1).astype(np.float32)  # (d, 3)
        gt_rel_out[s, :d] = ((g - centers[:, None, :])
                             * mrow[..., None]).astype(np.float16)
        gt_mask_out[s, :d] = mrow
    out = {
        "host_mae_mask": mask_out,
        "host_mae_gt_rel": gt_rel_out,
        "host_mae_gt_mask": gt_mask_out,
        # compaction indices (device otherwise re-derives them with two
        # (B, M)-wide sort-based nonzero calls): ascending slot order,
        # fill M past the count — identical to jnp.nonzero(size=..., fill)
        "host_mae_dec_idx": dec_idx_out,
    }
    if keep_idx_out is not None:
        out["host_mae_keep_idx"] = keep_idx_out
    return out


def vfe_host_features(sorted_points, sorted_mask, tables, pc_range,
                      voxel_size, use_abs_xyz=True, use_cluster=True,
                      with_dist=False):
    """Numpy twin of DynVFE's per-point feature build (``TYPE: mean``).

    The feature tensor fed to the VFE point MLP is pure index/geometry work
    with no gradient — per-point pillar-center and cluster-mean offsets
    (reference pcdet/models/backbones_3d/vfe/dyn_vfe.py:88-116).  On device
    it costs ~7 ms/step of scalar-row gathers + segment sums at batch 16
    (r5 trace: the (262144, 2|3|4) coord/mean gathers and the per-pillar
    xyz segment-mean), so like the pillar tables it moves to the loader.

    Args:
        sorted_points: (B, N, C) float32 — pillar-SORTED points as returned
            by :func:`pillarize_batch_np` (xyz first).
        sorted_mask: (B, N) bool — sorted point mask.
        tables: the ``host_pillar_*`` dict from :func:`pillarize_batch_np`.
        pc_range / voxel_size: dataset geometry.
        use_abs_xyz / use_cluster / with_dist: MODEL.VFE flags
            (USE_ABSLOTE_XYZ / USE_CLUSTER_XYZ / WITH_DISTANCE).
    Returns:
        dict with ``host_vfe_pf`` (B, N, F) float32 — rows for invalid /
        out-of-range points are exact zeros, matching the device's
        ``* pt_valid`` masking.  Per-pillar means are computed in f64
        (within ~1e-6 of the device's f32 segment-mean ordering).
    """
    pts = np.asarray(sorted_points, np.float32)
    b, n, c = pts.shape
    m = tables["host_pillar_start"].shape[1]
    pc = np.asarray(pc_range, np.float32)
    vs = np.asarray(voxel_size, np.float32)
    pp = tables["host_point_pillar"]          # (B, N) in [0..m]
    coords = tables["host_pillar_coords"]     # (B, M, 2|3) [(iz,) iy, ix]
    starts = tables["host_pillar_start"]
    counts = tables["host_pillar_count"]
    cdim = coords.shape[-1]

    f = 3 + (c if use_abs_xyz else c - 3) + (3 if use_cluster else 0) \
        + (1 if with_dist else 0)
    out = np.zeros((b, n, f), np.float32)
    for s in range(b):
        valid = (pp[s] < m) & np.asarray(sorted_mask[s], bool)
        ppc = np.clip(pp[s], 0, m - 1)
        cyx = coords[s][ppc]                  # (N, 2|3)
        xyz = pts[s, :, :3]
        z_center = ((cyx[:, -3].astype(np.float32) + 0.5) * vs[2] + pc[2]
                    if cdim == 3 else np.float32(0.5 * vs[2] + pc[2]))
        f_center = np.stack([
            xyz[:, 0] - ((cyx[:, -1].astype(np.float32) + 0.5) * vs[0] + pc[0]),
            xyz[:, 1] - ((cyx[:, -2].astype(np.float32) + 0.5) * vs[1] + pc[1]),
            xyz[:, 2] - z_center,
        ], axis=-1)
        feats = [f_center]
        feats.append(pts[s] if use_abs_xyz else pts[s, :, 3:])
        if use_cluster:
            # per-pillar xyz mean over sorted runs via an f64 prefix sum
            cs = np.concatenate(
                [np.zeros((1, 3), np.float64),
                 np.cumsum(xyz.astype(np.float64), axis=0)], axis=0)
            st = starts[s].astype(np.int64)
            cnt = counts[s].astype(np.int64)
            sums = cs[np.clip(st + cnt, 0, n)] - cs[np.clip(st, 0, n)]
            mean = (sums / np.maximum(cnt, 1)[:, None]).astype(np.float32)
            feats.append(xyz - mean[ppc])
        if with_dist:
            feats.append(np.linalg.norm(xyz, axis=-1, keepdims=True))
        out[s] = np.concatenate(feats, axis=-1) * valid[:, None]
    return {"host_vfe_pf": out}


def vfe_host_features_cfg(vfe_cfg, sorted_points, sorted_mask, tables,
                          pc_range, voxel_size):
    """Config-gated :func:`vfe_host_features`: returns ``{}`` unless the
    VFE is the shipped DynVFE shape (``TYPE: mean`` with MLPS) and
    ``TPU_HOST_VFE`` is not disabled (default on, like the other host-prep
    stages)."""
    g = (lambda k, d=None: vfe_cfg.get(k, d)) if hasattr(vfe_cfg, "get") \
        else (lambda k, d=None: getattr(vfe_cfg, k, d))
    if not bool(g("TPU_HOST_VFE", True)):
        return {}
    if g("TYPE", "mean") != "mean" or g("MLPS", None) is None:
        return {}
    return vfe_host_features(
        sorted_points, sorted_mask, tables, pc_range, voxel_size,
        use_abs_xyz=bool(g("USE_ABSLOTE_XYZ", True)),
        use_cluster=bool(g("USE_CLUSTER_XYZ", True)),
        with_dist=bool(g("WITH_DISTANCE", False)))
