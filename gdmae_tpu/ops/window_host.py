"""Host (numpy) twins of the joint window-plan builders in ops/window.py.

The window bucket plans are pure index computations on pillar occupancy —
no gradients, no floats — yet building them in-graph costs ~32 ms/step at
MAE-bench scale (r4 sweep: ``noattn`` 144.8 vs ``noplans`` 112.4 ms).
Like pillarization (datasets/processor/host_pillarize.py) and the MAE GT
grouping before them, they move to the host loader: these functions
reproduce ``build_joint_plan`` + ``joint_plan_to_tokens`` (and the strided
stage's occupancy dilation/compaction) bit-exactly in numpy, so the device
graph consumes precomputed int32 gather layouts.

Exact-equality tests vs the jax builders: tests/test_host_window_plans.py.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from .window import DropSpec, drop_specs_from_cfg, packing_specs  # noqa: F401


def dilate_occupancy_np(occ, kernel: int = 3, stride: int = 1):
    """numpy twin of models.model_utils.blocks.dilate_occupancy (max-pool
    with torch-style padding k//2).  occ: (B, H, W) bool."""
    b, h, w = occ.shape
    p = kernel // 2
    padded = np.zeros((b, h + 2 * p, w + 2 * p), bool)
    padded[:, p:p + h, p:p + w] = occ
    oh = (h + 2 * p - kernel) // stride + 1
    ow = (w + 2 * p - kernel) // stride + 1
    out = np.zeros((b, oh, ow), bool)
    for dy in range(kernel):
        for dx in range(kernel):
            out |= padded[:, dy:dy + oh * stride:stride,
                          dx:dx + ow * stride:stride]
    return out


def compact_occupancy_np(occ, cap: int):
    """numpy twin of window.compact_occupancy: raster-order active cells,
    dropped past ``cap``.  Returns coords (B, cap, 2) int32, mask (B, cap)."""
    b, ny, nx = occ.shape
    coords = np.zeros((b, cap, 2), np.int32)
    mask = np.zeros((b, cap), bool)
    flat = occ.reshape(b, ny * nx)
    for bi in range(b):
        (idx,) = np.nonzero(flat[bi])
        idx = idx[:cap]
        n = len(idx)
        coords[bi, :n, 0] = idx // nx
        coords[bi, :n, 1] = idx % nx
        # jax fill_value path clips trash to cell ny*nx-1
        coords[bi, n:] = [(ny * nx - 1) // nx, (ny * nx - 1) % nx]
        mask[bi, :n] = True
    return coords, mask


def cell2tok_np(coords, mask, grid_hw):
    """numpy twin of window.build_cell2tok."""
    b, m, _ = coords.shape
    ny, nx = grid_hw
    out = np.full((b, ny * nx), m, np.int32)
    for bi in range(b):
        flat = coords[bi, :, 0] * nx + coords[bi, :, 1]
        v = mask[bi]
        out[bi, flat[v]] = np.arange(m, dtype=np.int32)[v]
    return out


def token_cell_index_np(coords, mask, grid_hw):
    ny, nx = grid_hw
    flat = coords[..., 0].astype(np.int64) * nx + coords[..., 1]
    return np.where(mask, flat, ny * nx).astype(np.int32)


def _joint_plan_single_np(occ_flat, grid_hw, window, shift, drop_specs,
                          budget, dense_pack=False):
    """numpy twin of window._joint_plan_single (same variable names)."""
    ny, nx = grid_hw
    wy, wx = window
    sy, sx = shift
    nwy = -(-(ny + sy) // wy)
    nwx = -(-(nx + sx) // wx)
    pad_y = nwy * wy - ny - sy
    pad_x = nwx * wx - nx - sx
    occ_pad = np.pad(occ_flat.reshape(ny, nx),
                     ((sy, pad_y), (sx, pad_x)))
    g = nwy * nwx
    cells = wy * wx

    occ_win = occ_pad.reshape(nwy, wy, nwx, wx).transpose(0, 2, 1, 3)
    occ_win = occ_win.reshape(g, cells)
    counts = occ_win.sum(axis=-1).astype(np.int32)
    c_occ = np.cumsum(occ_win.astype(np.int32), axis=-1)
    shift_bits = max(int(np.ceil(np.log2(max(cells, 2)))), 1)
    t_ids = np.arange(cells, dtype=np.int32)
    key = ((np.logical_not(occ_win).astype(np.int32) << shift_bits)
           | t_ids[None, :])
    comp = (np.sort(key, axis=-1) & ((1 << shift_bits) - 1)).astype(np.int32)

    t_ls = [min(spec.max_tokens, cells) for spec in drop_specs]
    if not dense_pack:
        assert all(t > 0 and (t & (t - 1)) == 0 and t <= 128 for t in t_ls)
    t_w = np.zeros((g,), np.int32)
    for spec, t_l in zip(drop_specs, t_ls):
        in_range = (counts >= max(spec.lower, 1)) & (counts < spec.upper)
        t_w = np.where(in_range, t_l, t_w)
    if dense_pack:
        t_w = np.where(t_w > 0, np.minimum(counts, t_w), 0)

    win_bits = max(int(np.ceil(np.log2(max(g, 2)))), 1)
    tmax = max(t_ls) if t_ls else cells
    sort_key = ((tmax + 1 - t_w) << win_bits) | np.arange(g, dtype=np.int32)
    skey = np.sort(sort_key)
    sorted_win = (skey & ((1 << win_bits) - 1)).astype(np.int32)
    sorted_t = (tmax + 1 - (skey >> win_bits)).astype(np.int32)
    if dense_pack:
        # next-fit over descending sizes with 128-block alignment
        # (window.py _joint_plan_single dense branch, same semantics)
        off = np.zeros((g,), np.int32)
        cur = 0
        for i in range(g):
            t = int(sorted_t[i])
            if (cur % 128) + t > 128:
                cur = (cur // 128 + 1) * 128
            off[i] = cur
            cur += t
    else:
        off = np.cumsum(sorted_t) - sorted_t
    fits = (sorted_t > 0) & (off + sorted_t <= budget)
    overflow = int(np.sum((sorted_t > 0) & np.logical_not(fits)))

    cnt_s = counts[sorted_win]
    cell_s = comp[sorted_win]
    col = np.arange(cells, dtype=np.int32)[None, :]
    tok_ok = fits[:, None] & (col < np.minimum(cnt_s, sorted_t)[:, None])
    slot = np.where(tok_ok, off[:, None] + col, budget).reshape(-1)

    iy = cell_s // wx
    ix = cell_s % wx
    y = (sorted_win // nwx)[:, None] * wy + iy - sy
    x = (sorted_win % nwx)[:, None] * wx + ix - sx
    flat_cell = (y * nx + x).reshape(-1)
    incell = cell_s.reshape(-1)
    cell_bits = max(int(np.ceil(np.log2(ny * nx + 1))), 1)
    assert cell_bits + int(np.ceil(np.log2(cells + 1))) < 32
    packed_a = (incell.astype(np.int64) << cell_bits) | flat_cell
    buf_a = np.full((budget + 1,), -1, np.int64)
    ok = slot <= budget
    buf_a[slot[ok]] = packed_a[ok]
    buf_a = buf_a[:-1]
    wid_src = np.broadcast_to(
        np.arange(g, dtype=np.int32)[:, None], (g, cells)).reshape(-1)
    wid = np.full((budget + 1,), -1, np.int32)
    wid[slot[ok]] = wid_src[ok]
    wid = wid[:-1]

    tok_valid = buf_a >= 0
    tok_src = np.where(tok_valid, buf_a & ((1 << cell_bits) - 1),
                       ny * nx).astype(np.int32)
    tok_incell = np.where(tok_valid, buf_a >> cell_bits, 0).astype(np.int32)

    pos_of_win = np.zeros((g,), np.int32)
    pos_of_win[sorted_win] = np.arange(g, dtype=np.int32)
    off_orig = off[pos_of_win]
    t_orig = sorted_t[pos_of_win]
    fits_orig = fits[pos_of_win]
    cy = np.arange(ny, dtype=np.int32)[:, None] + sy
    cx = np.arange(nx, dtype=np.int32)[None, :] + sx
    win_of_cell = ((cy // wy) * nwx + (cx // wx)).reshape(ny * nx)
    incell_c = ((cy % wy) * wx + (cx % wx)).reshape(ny * nx)
    rank_in_win = (
        c_occ.reshape(g * cells)[win_of_cell * cells + incell_c] - 1)
    covered = (occ_flat & fits_orig[win_of_cell]
               & (rank_in_win < t_orig[win_of_cell]))
    inv = np.where(covered, off_orig[win_of_cell] + rank_in_win,
                   budget).astype(np.int32)

    return dict(tok_src=tok_src, tok_valid=tok_valid, tok_incell=tok_incell,
                wid=wid, inv_idx=inv, overflow=overflow)


def _nfd_offsets_np(sorted_t):
    """Next-fit offsets over DESCENDING window sizes with 128-block
    alignment, batch-vectorized (twin of the lax.scan in
    window._joint_plan_single's dense branch).

    Within a run of equal sizes ``s`` the layout is closed-form: ``k0``
    windows finish the current partial block, then ``128 // s`` per full
    block — so one pass over the (<= 64) distinct sizes replaces the
    per-window python loop."""
    b, g = sorted_t.shape
    off = np.zeros((b, g), np.int64)
    cur = np.zeros((b,), np.int64)
    sizes = np.unique(sorted_t)[::-1]
    for s in sizes:
        if s <= 0:
            continue
        s = int(s)
        mask = sorted_t == s                       # (B, G)
        n = mask.sum(axis=1)                       # (B,)
        j = np.cumsum(mask, axis=1) - 1            # rank within the run
        rem = 128 - cur % 128
        k0 = rem // s
        kf = 128 // s
        blk_next = (cur // 128 + 1) * 128
        jj = j - k0[:, None]
        off_s = np.where(
            j < k0[:, None], cur[:, None] + j * s,
            blk_next[:, None] + (jj // kf) * 128 + (jj % kf) * s)
        off = np.where(mask, off_s, off)
        jl = n - 1
        jjl = jl - k0
        last = np.where(jl < k0, cur + jl * s,
                        blk_next + (jjl // kf) * 128 + (jjl % kf) * s)
        cur = np.where(n > 0, last + s, cur)
    return off.astype(np.int32)


def build_joint_plan_np(occupancy, grid_hw, window, shift, drop_specs,
                        budget, dense_pack=False):
    """numpy twin of window.build_joint_plan: dict of batched arrays.

    Batch-vectorized (the loader runs this 6x per batch — 3 stages x 2
    shifts; the per-sample python loop measured ~0.4 s/batch-16)."""
    ny, nx = grid_hw
    wy, wx = window
    sy, sx = shift
    budget = int(budget)
    b = occupancy.shape[0]
    occ = occupancy.reshape(b, ny, nx)
    nwy = -(-(ny + sy) // wy)
    nwx = -(-(nx + sx) // wx)
    pad_y = nwy * wy - ny - sy
    pad_x = nwx * wx - nx - sx
    occ_pad = np.pad(occ, ((0, 0), (sy, pad_y), (sx, pad_x)))
    g = nwy * nwx
    cells = wy * wx

    occ_win = occ_pad.reshape(b, nwy, wy, nwx, wx).transpose(0, 1, 3, 2, 4)
    occ_win = occ_win.reshape(b, g, cells)
    counts = occ_win.sum(axis=-1).astype(np.int32)          # (B, G)
    c_occ = np.cumsum(occ_win.astype(np.int32), axis=-1)    # (B, G, cells)
    shift_bits = max(int(np.ceil(np.log2(max(cells, 2)))), 1)
    t_ids = np.arange(cells, dtype=np.int32)
    key = ((np.logical_not(occ_win).astype(np.int32) << shift_bits)
           | t_ids[None, None, :])
    comp = (np.sort(key, axis=-1) & ((1 << shift_bits) - 1)).astype(np.int32)

    t_ls = [min(spec.max_tokens, cells) for spec in drop_specs]
    if not dense_pack:
        assert all(t > 0 and (t & (t - 1)) == 0 and t <= 128 for t in t_ls)
    t_w = np.zeros((b, g), np.int32)
    for spec, t_l in zip(drop_specs, t_ls):
        in_range = (counts >= max(spec.lower, 1)) & (counts < spec.upper)
        t_w = np.where(in_range, t_l, t_w)
    if dense_pack:
        t_w = np.where(t_w > 0, np.minimum(counts, t_w), 0)

    win_bits = max(int(np.ceil(np.log2(max(g, 2)))), 1)
    tmax = max(t_ls) if t_ls else cells
    sort_key = ((tmax + 1 - t_w) << win_bits) \
        | np.arange(g, dtype=np.int32)[None, :]
    skey = np.sort(sort_key, axis=-1)
    sorted_win = (skey & ((1 << win_bits) - 1)).astype(np.int32)  # (B, G)
    sorted_t = (tmax + 1 - (skey >> win_bits)).astype(np.int32)
    if dense_pack:
        off = _nfd_offsets_np(sorted_t)
    else:
        off = np.cumsum(sorted_t, axis=-1) - sorted_t
    fits = (sorted_t > 0) & (off + sorted_t <= budget)
    overflow = int(np.sum((sorted_t > 0) & np.logical_not(fits)))

    b_idx = np.arange(b)[:, None]
    cnt_s = np.take_along_axis(counts, sorted_win, axis=1)      # (B, G)
    cell_s = comp[b_idx, sorted_win]                             # (B, G, cells)
    col = np.arange(cells, dtype=np.int32)[None, None, :]
    tok_ok = fits[..., None] & (col < np.minimum(cnt_s, sorted_t)[..., None])
    slot = np.where(tok_ok, off[..., None] + col, budget).reshape(b, -1)

    iy = cell_s // wx
    ix = cell_s % wx
    y = (sorted_win // nwx)[..., None] * wy + iy - sy
    x = (sorted_win % nwx)[..., None] * wx + ix - sx
    flat_cell = (y * nx + x).reshape(b, -1)
    incell = cell_s.reshape(b, -1)
    cell_bits = max(int(np.ceil(np.log2(ny * nx + 1))), 1)
    assert cell_bits + int(np.ceil(np.log2(cells + 1))) < 32
    packed_a = (incell.astype(np.int64) << cell_bits) | flat_cell
    buf_a = np.full((b, budget + 1), -1, np.int64)
    buf_a[b_idx, slot] = packed_a        # dups only at the trash slot
    buf_a = buf_a[:, :-1]
    wid_src = np.broadcast_to(
        np.arange(g, dtype=np.int32)[None, :, None], (b, g, cells)
    ).reshape(b, -1)
    wid = np.full((b, budget + 1), -1, np.int32)
    wid[b_idx, slot] = wid_src
    wid = wid[:, :-1]

    tok_valid = buf_a >= 0
    tok_src = np.where(tok_valid, buf_a & ((1 << cell_bits) - 1),
                       ny * nx).astype(np.int32)
    tok_incell = np.where(tok_valid, buf_a >> cell_bits, 0).astype(np.int32)

    pos_of_win = np.zeros((b, g), np.int32)
    pos_of_win[b_idx, sorted_win] = np.arange(g, dtype=np.int32)[None, :]
    off_orig = np.take_along_axis(off, pos_of_win, axis=1)
    t_orig = np.take_along_axis(sorted_t, pos_of_win, axis=1)
    fits_orig = np.take_along_axis(fits.astype(np.int8), pos_of_win,
                                   axis=1).astype(bool)
    cy = np.arange(ny, dtype=np.int32)[:, None] + sy
    cx = np.arange(nx, dtype=np.int32)[None, :] + sx
    win_of_cell = ((cy // wy) * nwx + (cx // wx)).reshape(ny * nx)
    incell_c = ((cy % wy) * wx + (cx % wx)).reshape(ny * nx)
    rank_in_win = c_occ.reshape(b, g * cells)[
        :, win_of_cell * cells + incell_c] - 1
    covered = (occ.reshape(b, ny * nx) & fits_orig[:, win_of_cell]
               & (rank_in_win < t_orig[:, win_of_cell]))
    inv = np.where(covered,
                   off_orig[:, win_of_cell] + rank_in_win,
                   budget).astype(np.int32)

    return dict(tok_src=tok_src, tok_valid=tok_valid, tok_incell=tok_incell,
                wid=wid, inv_idx=inv, overflow=np.int32(overflow))


def joint_plan_to_tokens_np(plan, cell2tok, tok_cell, m):
    """numpy twin of window.joint_plan_to_tokens."""
    b = cell2tok.shape[0]
    c2t = np.concatenate([cell2tok, np.full((b, 1), m, np.int32)], axis=1)
    s_all = np.take_along_axis(c2t, plan["tok_src"], axis=1)
    v_all = plan["tok_valid"] & (s_all < m)
    s_all = np.where(v_all, s_all, m).astype(np.int32)
    total = plan["tok_src"].shape[-1]
    inv_pad = np.concatenate(
        [plan["inv_idx"], np.full((b, 1), total, np.int32)], axis=1)
    inv_tok = np.take_along_axis(inv_pad, tok_cell, axis=1)
    return dict(tok_src=s_all, tok_valid=v_all,
                tok_incell=plan["tok_incell"], wid=plan["wid"],
                inv_idx=inv_tok, overflow=plan["overflow"])


def host_joint_plans(b3d_cfg, coords, mask, grid_hw, train=True):
    """Token-space JointPlans + per-stage token lists for the whole SST
    pyramid, computed on host (mirrors SSTBlock's plan path,
    models/backbones_3d/spt_backbone.py:197-264 — joint window mode only).

    Args:
        b3d_cfg: MODEL.BACKBONE_3D config (dict-like) with
            TPU_JOINT_BUDGETS set (one per stage).
        coords: (B, M0, 2) int32 [iy, ix] — the token list ENTERING stage 1
            (for MAE: the compacted kept pillars, ascending slot order).
        mask: (B, M0) bool.
        grid_hw: (Ny, Nx) of the entry grid.
    Returns:
        dict of numpy arrays, flat keys:
          host_win{i}s{j}_{tok_src,tok_valid,tok_incell,wid,inv}  (stage i,
              shift j) — token-row space;
          host_stage{i}_{coords,cmask,occ}  for strided stages (i >= 1).
    """
    from ..config import as_easy

    cfg = as_easy(b3d_cfg)
    budgets = cfg.get("TPU_JOINT_BUDGETS", None)
    assert budgets is not None, "host_joint_plans requires TPU_JOINT_BUDGETS"
    tok_caps = cfg.get("TPU_TOKEN_CAPS", None)
    pack_pow2 = bool(cfg.get("TPU_PACK_POW2", False))
    pack_min_t = int(cfg.get("TPU_PACK_MIN_T", 1))
    dense_pack = cfg.get("TPU_JOINT_PACK", "pow2") == "dense" 

    b, m, _ = coords.shape
    ny, nx = grid_hw
    c2t = cell2tok_np(coords, mask, (ny, nx))
    occ = (c2t < m).reshape(b, ny, nx)
    out = {}
    for i, blk in enumerate(cfg.SST_BLOCK_LIST):
        blk = as_easy(blk)
        stride = int(blk.ENCODER.STRIDE)
        if stride > 1:
            occ2 = dilate_occupancy_np(occ, kernel=3, stride=stride)
            ny2, nx2 = occ2.shape[1], occ2.shape[2]
            cap = (int(tok_caps[i]) if tok_caps is not None
                   else min(ny2 * nx2, 4 * m))
            coords, mask = compact_occupancy_np(occ2, cap)
            occ = occ2
            ny, nx = ny2, nx2
            m = cap
            c2t = cell2tok_np(coords, mask, (ny, nx))
            out[f"host_stage{i}_coords"] = coords
            out[f"host_stage{i}_cmask"] = mask
            out[f"host_stage{i}_occ"] = occ
        window = (int(blk.PREPROCESS.WINDOW_SHAPE[1]),
                  int(blk.PREPROCESS.WINDOW_SHAPE[0]))
        drop_specs = drop_specs_from_cfg(
            blk.PREPROCESS.DROP_INFO["train" if train else "test"])
        if pack_pow2:
            drop_specs = packing_specs(
                drop_specs, window[0] * window[1], min_t=pack_min_t)
        tcell = token_cell_index_np(coords, mask, (ny, nx))
        for j, shift in enumerate(((0, 0),
                                   (window[0] // 2, window[1] // 2))):
            raw = build_joint_plan_np(occ, (ny, nx), window, shift,
                                      drop_specs, int(budgets[i]),
                                      dense_pack=dense_pack)
            tp = joint_plan_to_tokens_np(raw, c2t, tcell, m)
            out[f"host_win{i}s{j}_tok_src"] = tp["tok_src"]
            out[f"host_win{i}s{j}_tok_valid"] = tp["tok_valid"]
            out[f"host_win{i}s{j}_tok_incell"] = tp["tok_incell"]
            out[f"host_win{i}s{j}_wid"] = tp["wid"]
            out[f"host_win{i}s{j}_inv"] = tp["inv_idx"]
    return out


def mae_host_plans(b3d_cfg, pillar_coords, pillar_mask, mae_mask, grid_hw):
    """Host window plans for the MAE pretrain graph: compact the kept
    (unmasked) pillars exactly like SPTBackboneMAE (ascending slot order,
    TPU_MAE_TOKEN_CAP capacity, spt_backbone.py masked-compact encode) and
    build the pyramid's joint plans over them.

    Args:
        pillar_coords: (B, M, 2) int32 [iy, ix] (host_pillarize tables).
        pillar_mask: (B, M) bool.
        mae_mask: (B, M) float32, 1.0 = masked (host_mae_mask).
        grid_hw: (Ny, Nx).
    """
    from ..config import as_easy

    cfg = as_easy(b3d_cfg)
    b, m, _ = pillar_coords.shape
    ratio = float(cfg.MASK_CONFIG.RATIO)
    m_enc = int(cfg.get(
        "TPU_MAE_TOKEN_CAP", -(-int(m * (1.0 - ratio) + 1) // 8) * 8))
    kept = pillar_mask & (mae_mask == 0.0)
    coords_c = np.zeros((b, m_enc, 2), np.int32)
    mask_c = np.zeros((b, m_enc), bool)
    for bi in range(b):
        (idx,) = np.nonzero(kept[bi])
        idx = idx[:m_enc]
        coords_c[bi, :len(idx)] = pillar_coords[bi, idx]
        # device fallback rows read pillar_coords[m-1] (clipped trash); the
        # plans mask them out either way
        coords_c[bi, len(idx):] = pillar_coords[bi, m - 1]
        mask_c[bi, :len(idx)] = True
    return host_joint_plans(cfg, coords_c, mask_c, grid_hw)
