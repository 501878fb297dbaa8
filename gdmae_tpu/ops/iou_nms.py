"""Rotated BEV IoU and fixed-capacity greedy NMS, pure JAX.

TPU-native equivalent of the reference ``iou3d_nms_cuda`` extension
(reference pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu — polygon-clipping
rotated overlap :236-265 and bitmask greedy NMS :267-326; Python wrappers in
pcdet/ops/iou3d_nms/iou3d_nms_utils.py).

Design: the rotated-rectangle overlap is computed by Sutherland–Hodgman
clipping of box A's 4-gon against box B's 4 half-planes in B's local frame.
The polygon buffer is a fixed (8, 2) array (convex clip of a 4-gon by 4
half-planes has <= 8 vertices), so everything vectorizes with masks — no
data-dependent shapes.  Greedy NMS precomputes the (chunked) IoU matrix and
runs a sequential suppression scan, returning a fixed-K keep set.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _box_corners_local(dx, dy):
    """CCW corners of an axis-aligned rect centred at origin."""
    hx, hy = dx / 2, dy / 2
    return jnp.stack([
        jnp.stack([hx, hy], -1),
        jnp.stack([-hx, hy], -1),
        jnp.stack([-hx, -hy], -1),
        jnp.stack([hx, -hy], -1),
    ], axis=-2)  # (..., 4, 2)


def _clip_halfplane(xs, ys, count, axis, sign, bound, max_in=8):
    """Clip an unrolled 8-vertex polygon (``xs``/``ys``: length-8 Python
    lists of scalars, ``count`` valid) against sign * coord[axis] <= bound.

    FULLY UNROLLED scalar select chains — no gathers, no dots.  Two
    earlier forms failed on TPU: a vmapped tiny-scatter (`.at[].set`)
    hard-crashed the runtime at 4096x4096, and an 8x8 one-hot-MATMUL
    compaction lowered to 16.7M MXU-padded (8,8) dots ≈ 2.9 s for one
    4096^2 IoU matrix.  Here every op is elementwise, so the whole
    clipping pipeline fuses into one VPU loop under the pair vmap.

    ``max_in``: static bound on the input vertex count — clipping a 4-gon
    by the k-th half-plane has at most 4+k vertices, so the edge loop and
    the emit-slot select chains shrink accordingly (the select chains are
    the dominant VPU cost of the whole IoU: ~35% fewer ops than the
    fixed-8 form)."""
    max_in = min(max_in, 8)
    max_out = min(max_in + 1, 8)
    f = [sign * (xs[i] if axis == 0 else ys[i]) - bound
         for i in range(max_in)]
    in_v = [fi <= 0 for fi in f]

    # running emit count as a traced scalar
    offset = jnp.zeros_like(count)
    zero = jnp.zeros_like(xs[0])
    acc_x = [zero] * 8
    acc_y = [zero] * 8

    def place(slot_vals_x, slot_vals_y, pos, emit, hi):
        for j in range(min(hi, max_out)):
            hit = emit & (pos == j)
            acc_x[j] = jnp.where(hit, slot_vals_x, acc_x[j])
            acc_y[j] = jnp.where(hit, slot_vals_y, acc_y[j])

    for i in range(max_in):
        valid_edge = count > i
        j = 0 if i == max_in - 1 else i + 1
        # next valid vertex (wraps to 0 at the ring end)
        wrap = count <= i + 1
        wx = jnp.where(wrap, xs[0], xs[j])
        wy = jnp.where(wrap, ys[0], ys[j])
        fw = sign * (wx if axis == 0 else wy) - bound
        in_w = fw <= 0

        denom = f[i] - fw
        t = f[i] / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
        ix = xs[i] + t * (wx - xs[i])
        iy = ys[i] + t * (wy - ys[i])

        emit_v = in_v[i] & valid_edge
        emit_i = (in_v[i] != in_w) & valid_edge
        # emit positions before edge i are bounded by 2i (each edge emits
        # at most 2 vertices)
        place(xs[i], ys[i], offset, emit_v, 2 * i + 1)
        pos_i = offset + emit_v.astype(offset.dtype)
        place(ix, iy, pos_i, emit_i, 2 * i + 2)
        offset = pos_i + emit_i.astype(offset.dtype)

    return acc_x, acc_y, offset


def _pair_overlap(box_a, box_b):
    """BEV overlap area of two rotated boxes [x, y, z, dx, dy, dz, r].

    Unrolled-scalar pipeline (see _clip_halfplane): under the pair vmap
    everything is one elementwise fusion."""
    ca, cb = box_a[:2], box_b[:2]
    ra, rb = box_a[6], box_b[6]
    # A in B's frame
    cos_b, sin_b = jnp.cos(-rb), jnp.sin(-rb)
    rel = ca - cb
    cx = cos_b * rel[0] - sin_b * rel[1]
    cy = sin_b * rel[0] + cos_b * rel[1]
    a_rel = ra - rb
    cos_a, sin_a = jnp.cos(a_rel), jnp.sin(a_rel)
    hx_a, hy_a = box_a[3] / 2, box_a[4] / 2
    corners = [(hx_a, hy_a), (-hx_a, hy_a), (-hx_a, -hy_a), (hx_a, -hy_a)]
    zero = jnp.zeros_like(cx)
    xs = [cos_a * lx - sin_a * ly + cx for lx, ly in corners] + [zero] * 4
    ys = [sin_a * lx + cos_a * ly + cy for lx, ly in corners] + [zero] * 4
    count = jnp.asarray(4, jnp.int32)

    hx, hy = box_b[3] / 2, box_b[4] / 2
    xs, ys, count = _clip_halfplane(xs, ys, count, 0, 1.0, hx, max_in=4)
    xs, ys, count = _clip_halfplane(xs, ys, count, 0, -1.0, hx, max_in=5)
    xs, ys, count = _clip_halfplane(xs, ys, count, 1, 1.0, hy, max_in=6)
    xs, ys, count = _clip_halfplane(xs, ys, count, 1, -1.0, hy, max_in=7)

    # shoelace over the valid ring: edge i -> next valid (wraps to 0);
    # invalid slots contribute 0
    area2 = zero
    for i in range(8):
        j = 0 if i == 7 else i + 1
        wrap = count <= i + 1
        qx = jnp.where(wrap, xs[0], xs[j])
        qy = jnp.where(wrap, ys[0], ys[j])
        cross = xs[i] * qy - qx * ys[i]
        area2 = area2 + jnp.where(count > i, cross, 0.0)
    area = 0.5 * jnp.abs(area2)
    return jnp.where(count >= 3, area, 0.0)


_pair_overlap_vm = jax.vmap(jax.vmap(_pair_overlap, (None, 0)), (0, None))


def boxes_overlap_bev(boxes_a, boxes_b, chunk=256):
    """(N, 7) x (M, 7) -> (N, M) rotated BEV overlap areas (reference
    boxes_overlap_bev_gpu, iou3d_nms.cpp:49)."""
    n = boxes_a.shape[0]
    if n <= chunk:
        return _pair_overlap_vm(boxes_a, boxes_b)
    pad = (-n) % chunk
    a = jnp.pad(boxes_a, ((0, pad), (0, 0)))
    a = a.reshape(-1, chunk, boxes_a.shape[-1])
    out = jax.lax.map(lambda ac: _pair_overlap_vm(ac, boxes_b), a)
    return out.reshape(-1, boxes_b.shape[0])[:n]


def boxes_iou_bev(boxes_a, boxes_b, chunk=256):
    """Rotated BEV IoU (reference boxes_iou_bev_gpu, iou3d_nms.cpp:70)."""
    overlap = boxes_overlap_bev(boxes_a, boxes_b, chunk)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return overlap / jnp.clip(area_a + area_b - overlap, 1e-6)


def boxes_iou3d(boxes_a, boxes_b, chunk=256):
    """Full 3D IoU: rotated BEV overlap x height overlap (reference
    iou3d_nms_utils.boxes_iou3d_gpu)."""
    overlap_bev = boxes_overlap_bev(boxes_a, boxes_b, chunk)
    a_top = (boxes_a[:, 2] + boxes_a[:, 5] / 2)[:, None]
    a_bot = (boxes_a[:, 2] - boxes_a[:, 5] / 2)[:, None]
    b_top = (boxes_b[:, 2] + boxes_b[:, 5] / 2)[None, :]
    b_bot = (boxes_b[:, 2] - boxes_b[:, 5] / 2)[None, :]
    h_overlap = jnp.clip(jnp.minimum(a_top, b_top) - jnp.maximum(a_bot, b_bot), 0.0)
    inter = overlap_bev * h_overlap
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter / jnp.clip(vol_a + vol_b - inter, 1e-6)


def _greedy_suppress(iou, valid, thresh, block: int = 128):
    """Greedy suppression over score-sorted boxes, BLOCKED for TPU.

    Greedy NMS is a sequential dependency chain, but a per-box
    ``fori_loop`` costs ~0.7 ms/step of loop overhead on TPU (measured:
    2.9 s for K=4096).  This resolves ``block`` boxes per loop step: the
    intra-block chain is a statically unrolled loop over (block,) vectors,
    and each step suppresses all later boxes against the block's kept set
    with one (block, K) reduction — K/block serial steps total, exactly
    the reference nms_gpu blocking structure (iou3d_nms_kernel.cu:267-326).

    iou: (K, K) of score-sorted boxes; valid: (K,).  Returns keep (K,) bool.
    """
    k = iou.shape[0]
    if k <= block:
        adj = iou > thresh

        def body_small(i, keep):
            return keep & ~(adj[i] & keep[i] & (jnp.arange(k) > i))

        return jax.lax.fori_loop(0, k, body_small, valid)

    nb = -(-k // block)
    kp = nb * block
    adj = jnp.pad(iou > thresh, ((0, kp - k), (0, kp - k)))
    keep0 = jnp.pad(valid, (0, kp - k))
    lanes = jnp.arange(block)
    pos = jnp.arange(kp)

    def body(bi, keep):
        s = bi * block
        blk_keep = jax.lax.dynamic_slice(keep, (s,), (block,))
        blk_adj = jax.lax.dynamic_slice(adj, (s, 0), (block, kp))  # (B, K)
        intra = jax.lax.dynamic_slice_in_dim(blk_adj, s, block, 1)
        for i in range(block):  # static unroll: no per-step loop overhead
            blk_keep = blk_keep & ~(intra[i] & blk_keep[i] & (lanes > i))
        supp = jnp.any(blk_adj & blk_keep[:, None], axis=0)  # (K,)
        keep = keep & ~(supp & (pos >= s + block))
        return jax.lax.dynamic_update_slice(keep, blk_keep, (s,))

    keep = jax.lax.fori_loop(0, nb, body, keep0)
    return keep[:k]


def nms_bev(boxes, scores, thresh, pre_maxsize, post_maxsize, valid=None,
            axis_aligned=False):
    """Class-agnostic rotated NMS with fixed-capacity outputs (reference
    nms_gpu, iou3d_nms.cpp:90 + model_nms_utils.class_agnostic_nms).

    Args:
        boxes: (N, 7); scores: (N,); valid: (N,) bool optional.
    Returns:
        keep_idx: (post_maxsize,) int32 indices into boxes, padded with -1;
        keep_mask: (post_maxsize,) bool;
        keep_scores: (post_maxsize,) float.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    masked_scores = jnp.where(valid, scores, -jnp.inf)
    k = min(pre_maxsize, n)
    if n >= (1 << 17):
        # XLA's TPU TopkEmitter asserts out ("TransformWindow: Loop will
        # not make progress") on very wide 1D top_k (seen at n=321408, the
        # KITTI anchor count).  EXACT two-stage top-k instead of a full
        # (N,) sort_key_val (the sort dominated batch-1 detect latency):
        # chunk rows stay under the emitter limit, every chunk keeps its
        # own top-k, and the global top-k of the k*chunks survivors is
        # exact because no dropped element can outrank k keepers of its
        # own chunk.
        chunk = 1 << 16
        n_pad = -(-n // chunk) * chunk
        pad_s = jnp.full((n_pad - n,), -jnp.inf, masked_scores.dtype)
        s2 = jnp.concatenate([masked_scores, pad_s]).reshape(-1, chunk)
        kc = min(k, chunk)
        cs, ci = jax.lax.top_k(s2, kc)  # (nc, kc)
        base = (jnp.arange(s2.shape[0], dtype=jnp.int32) * chunk)[:, None]
        cand_idx = (ci + base).reshape(-1)
        cand_s = cs.reshape(-1)
        if cand_s.shape[0] > k:
            top_scores, pos = jax.lax.top_k(cand_s, k)
            order = cand_idx[pos]
        else:
            top_scores, order = cand_s, cand_idx
    else:
        top_scores, order = jax.lax.top_k(masked_scores, k)
    top_boxes = boxes[order]
    top_valid = jnp.isfinite(top_scores)

    if axis_aligned:
        # nms_normal_gpu: IoU of axis-aligned (non-rotated) BEV boxes
        zeroed = top_boxes.at[:, 6].set(0.0)
        iou = boxes_iou_bev(zeroed, zeroed)
    else:
        iou = boxes_iou_bev(top_boxes, top_boxes)
    keep = _greedy_suppress(iou, top_valid, thresh)

    keep_scores = jnp.where(keep, top_scores, -jnp.inf)
    sel_scores, sel = jax.lax.top_k(keep_scores, min(post_maxsize, k))
    sel_mask = jnp.isfinite(sel_scores)
    keep_idx = jnp.where(sel_mask, order[sel], -1)
    return keep_idx, sel_mask, jnp.where(sel_mask, sel_scores, 0.0)
