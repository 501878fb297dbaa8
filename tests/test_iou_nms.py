"""Rotated IoU / NMS vs numpy oracles (rasterization + python greedy)."""
import numpy as np
import jax
import jax.numpy as jnp

from gdmae_tpu.ops import iou_nms


def raster_overlap(box_a, box_b, res=400):
    """Monte-carlo-grid oracle for rotated BEV overlap area."""
    def corners(b):
        c, s = np.cos(b[6]), np.sin(b[6])
        loc = np.array([[b[3], b[4]], [-b[3], b[4]], [-b[3], -b[4]], [b[3], -b[4]]]) / 2
        rot = loc @ np.array([[c, s], [-s, c]])
        return rot + b[:2]

    pts = np.concatenate([corners(box_a), corners(box_b)])
    lo, hi = pts.min(0) - 0.1, pts.max(0) + 0.1
    xs = np.linspace(lo[0], hi[0], res)
    ys = np.linspace(lo[1], hi[1], res)
    gx, gy = np.meshgrid(xs, ys)
    cell = (xs[1] - xs[0]) * (ys[1] - ys[0])

    def inside(b):
        c, s = np.cos(b[6]), np.sin(b[6])
        dx = gx - b[0]
        dy = gy - b[1]
        lx = c * dx + s * dy
        ly = -s * dx + c * dy
        return (np.abs(lx) <= b[3] / 2) & (np.abs(ly) <= b[4] / 2)

    return np.sum(inside(box_a) & inside(box_b)) * cell


def rand_boxes(n, seed):
    rng = np.random.RandomState(seed)
    out = np.zeros((n, 7), np.float32)
    out[:, 0:2] = rng.uniform(-10, 10, (n, 2))
    out[:, 2] = rng.uniform(-1, 1, n)
    out[:, 3:5] = rng.uniform(1, 6, (n, 2))
    out[:, 5] = rng.uniform(1, 3, n)
    out[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return out


def test_axis_aligned_exact():
    a = np.array([[0, 0, 0, 4, 2, 2, 0]], np.float32)
    b = np.array([[1, 0.5, 0, 4, 2, 2, 0]], np.float32)
    ov = float(iou_nms.boxes_overlap_bev(jnp.asarray(a), jnp.asarray(b))[0, 0])
    assert abs(ov - 3.0 * 1.5) < 1e-5
    # identical boxes -> IoU 1
    iou = float(iou_nms.boxes_iou_bev(jnp.asarray(a), jnp.asarray(a))[0, 0])
    assert abs(iou - 1.0) < 1e-5


def test_rotated_overlap_matches_raster():
    boxes_a = rand_boxes(12, 0)
    boxes_b = rand_boxes(10, 1)
    got = np.asarray(iou_nms.boxes_overlap_bev(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
    for i in range(0, 12, 3):
        for j in range(0, 10, 3):
            expect = raster_overlap(boxes_a[i], boxes_b[j])
            assert abs(got[i, j] - expect) < 0.08, (i, j, got[i, j], expect)


def test_disjoint_zero():
    a = np.array([[0, 0, 0, 2, 2, 2, 0.3]], np.float32)
    b = np.array([[10, 10, 0, 2, 2, 2, 1.0]], np.float32)
    assert float(iou_nms.boxes_overlap_bev(jnp.asarray(a), jnp.asarray(b))[0, 0]) == 0.0


def test_iou3d_height():
    a = np.array([[0, 0, 0, 2, 2, 2, 0]], np.float32)
    b = np.array([[0, 0, 1, 2, 2, 2, 0]], np.float32)
    # bev overlap 4, height overlap 1, inter 4, union 8+8-4=12
    got = float(iou_nms.boxes_iou3d(jnp.asarray(a), jnp.asarray(b))[0, 0])
    assert abs(got - 4.0 / 12.0) < 1e-5


def oracle_nms(boxes, scores, thresh):
    iou = np.asarray(iou_nms.boxes_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes)))
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j != i and not suppressed[j] and iou[i, j] > thresh:
                suppressed[j] = True
    return keep


def test_nms_matches_oracle():
    rng = np.random.RandomState(3)
    boxes = rand_boxes(40, 4)
    # cluster some boxes to force suppression
    boxes[20:30] = boxes[0:10] + rng.normal(0, 0.2, (10, 7)).astype(np.float32)
    scores = rng.rand(40).astype(np.float32)
    keep_idx, keep_mask, keep_scores = iou_nms.nms_bev(
        jnp.asarray(boxes), jnp.asarray(scores), 0.1, 64, 32)
    got = [int(i) for i, m in zip(np.asarray(keep_idx), np.asarray(keep_mask)) if m]
    expect = oracle_nms(boxes, scores, 0.1)
    assert got == expect


def test_nms_respects_valid_and_post_max():
    boxes = rand_boxes(20, 5)
    scores = np.linspace(1, 0.1, 20).astype(np.float32)
    valid = np.ones(20, bool)
    valid[0] = False
    keep_idx, keep_mask, _ = iou_nms.nms_bev(
        jnp.asarray(boxes), jnp.asarray(scores), 0.99, 20, 5,
        valid=jnp.asarray(valid))
    got = np.asarray(keep_idx)[np.asarray(keep_mask)]
    assert 0 not in got
    assert len(got) <= 5


def test_nms_blocked_path_matches_oracle():
    """n > 128 crosses the blocked suppression path (128 boxes per loop
    step); results must still be exactly the sequential greedy keep set."""
    rng = np.random.RandomState(7)
    n = 300
    boxes = rand_boxes(n, 7)
    # heavy clustering so suppression chains cross block boundaries
    boxes[150:290] = boxes[0:140] + rng.normal(
        0, 0.25, (140, 7)).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    keep_idx, keep_mask, _ = iou_nms.nms_bev(
        jnp.asarray(boxes), jnp.asarray(scores), 0.15, n, n)
    got = [int(i) for i, m in zip(np.asarray(keep_idx), np.asarray(keep_mask))
           if m]
    expect = oracle_nms(boxes, scores, 0.15)
    assert got == expect


def test_nms_two_stage_topk_large_n():
    """n >= 2^17 takes the chunked exact top-k path (XLA's TPU TopkEmitter
    rejects very wide 1D top_k): selection must equal the global top-k,
    including cross-chunk ties resolved in index order."""
    from gdmae_tpu.ops import iou_nms

    rng = np.random.RandomState(0)
    n = (1 << 17) + 12345
    boxes = np.zeros((n, 7), np.float32)
    # spread boxes far apart so nothing suppresses
    boxes[:, 0] = (np.arange(n) % 1024) * 10.0
    boxes[:, 1] = (np.arange(n) // 1024) * 10.0
    boxes[:, 3:6] = 1.0
    scores = rng.rand(n).astype(np.float32)
    scores[5] = scores[70000] = scores[131072 + 99] = 0.5  # cross-chunk ties
    k = 64
    keep_idx, keep_mask, keep_scores = jax.jit(
        lambda b, s: iou_nms.nms_bev(b, s, 0.5, k, k)
    )(jnp.asarray(boxes), jnp.asarray(scores))
    assert bool(keep_mask.all())
    order = np.argsort(-scores, kind="stable")[:k]
    np.testing.assert_array_equal(np.asarray(keep_idx), order)
    np.testing.assert_allclose(np.asarray(keep_scores), scores[order],
                               rtol=1e-6)


def test_nms_cascade_small_k_exact():
    """Latency-cascade lemma (detector3d_template post_processing): when
    the number of candidates above the score threshold fits k_small, NMS
    over the top-k_small candidates equals NMS over the full top-k_pre
    set — the dropped tail is all below threshold (invalid) and can
    neither be kept nor suppress anything."""
    from gdmae_tpu.ops import iou_nms

    rng = np.random.RandomState(3)
    n, k_small, k_pre, post = 4000, 256, 2048, 64
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0] = rng.uniform(0, 70, n)
    boxes[:, 1] = rng.uniform(-40, 40, n)
    boxes[:, 3] = rng.uniform(1.5, 4.5, n)
    boxes[:, 4] = rng.uniform(1.4, 2.0, n)
    boxes[:, 5] = 1.5
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    scores = rng.uniform(0, 0.29, n).astype(np.float32)
    hot = rng.choice(n, 180, replace=False)
    scores[hot] = rng.uniform(0.31, 1.0, len(hot))
    valid = scores > 0.3
    assert valid.sum() < k_small

    args = (jnp.asarray(boxes), jnp.asarray(scores), 0.1)
    small = iou_nms.nms_bev(*args, k_small, post, valid=jnp.asarray(valid))
    full = iou_nms.nms_bev(*args, k_pre, post, valid=jnp.asarray(valid))
    for a, b in zip(small, full):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
