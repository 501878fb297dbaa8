"""Golden-parity tests: our jnp/numpy math vs the ACTUAL reference torch
code, imported by file path from /root/reference (see ref_loader.py).

This is the accuracy-parity evidence the reference's QA story rests on:
identical randomized inputs through both implementations, agreement to
float tolerance.  Covered (VERDICT round-1 item 3): box coders, losses,
axis-aligned target assigner + anchor generation, OneCycle schedules,
window partition / drop-level semantics, gaussian heatmap targets.
"""
import numpy as np
import pytest

import ref_loader

torch = pytest.importorskip("torch")

RTOL = 1e-5
ATOL = 1e-6


def t(x):
    return torch.from_numpy(np.asarray(x))


def n(x):
    return np.asarray(x)


# --------------------------------------------------------------------- #
# box coders
# --------------------------------------------------------------------- #

def _rand_boxes(rng, m, extra=0):
    b = np.zeros((m, 7 + extra), np.float32)
    b[:, 0:3] = rng.uniform(-40, 40, (m, 3))
    b[:, 3:6] = rng.uniform(0.5, 5.0, (m, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, m)
    if extra:
        b[:, 7:] = rng.uniform(-1, 1, (m, extra))
    return b


@pytest.mark.parametrize("sincos,norm", [(False, True), (True, True),
                                         (False, False)])
def test_residual_coder_parity(sincos, norm):
    from gdmae_tpu.utils import box_coder_utils as mine

    ref = ref_loader.load_ref("pcdet.utils.box_coder_utils")
    rng = np.random.RandomState(0)
    boxes, anchors = _rand_boxes(rng, 64), _rand_boxes(rng, 64)

    rc = ref.ResidualCoder(encode_angle_by_sincos=sincos, norm=norm)
    mc = mine.ResidualCoder(encode_angle_by_sincos=sincos, norm=norm)
    assert mc.code_size == rc.code_size
    ref_enc = rc.encode_torch(t(boxes).clone(), t(anchors).clone()).numpy()
    my_enc = n(mc.encode(boxes, anchors))
    np.testing.assert_allclose(my_enc, ref_enc, rtol=RTOL, atol=ATOL)

    ref_dec = rc.decode_torch(t(ref_enc), t(anchors)).numpy()
    my_dec = n(mc.decode(my_enc, anchors))
    np.testing.assert_allclose(my_dec, ref_dec, rtol=RTOL, atol=1e-5)


def test_point_residual_coder_parity():
    from gdmae_tpu.utils import box_coder_utils as mine

    ref = ref_loader.load_ref("pcdet.utils.box_coder_utils")
    rng = np.random.RandomState(1)
    mean_size = [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]]
    gt = _rand_boxes(rng, 32)
    pts = rng.uniform(-40, 40, (32, 3)).astype(np.float32)
    cls = rng.randint(1, 4, 32)

    rc = ref.PointResidualCoder(mean_size=mean_size)
    mc = mine.PointResidualCoder(mean_size=mean_size)
    ref_enc = rc.encode_torch(t(gt).clone(), t(pts), t(cls)).numpy()
    my_enc = n(mc.encode(gt, pts, cls))
    np.testing.assert_allclose(my_enc, ref_enc, rtol=RTOL, atol=ATOL)

    ref_dec = rc.decode_torch(t(ref_enc), t(pts), t(cls)).numpy()
    my_dec = n(mc.decode(my_enc, pts, cls))
    np.testing.assert_allclose(my_dec, ref_dec, rtol=RTOL, atol=1e-5)


def test_point_bin_residual_coder_parity():
    from gdmae_tpu.utils import box_coder_utils as mine

    ref = ref_loader.load_ref("pcdet.utils.box_coder_utils")
    rng = np.random.RandomState(2)
    mean_size = [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]]
    gt = _rand_boxes(rng, 48)
    pts = rng.uniform(-40, 40, (48, 3)).astype(np.float32)
    cls = rng.randint(1, 4, 48)

    rc = ref.PointBinResidualCoder(angle_bin_num=12, mean_size=mean_size)
    mc = mine.PointBinResidualCoder(angle_bin_num=12, mean_size=mean_size)
    assert mc.code_size == rc.code_size
    ref_enc = rc.encode_torch(t(gt).clone(), t(pts), t(cls)).numpy()
    my_enc = n(mc.encode(gt, pts, cls))
    np.testing.assert_allclose(my_enc, ref_enc, rtol=RTOL, atol=1e-5)

    ref_dec = rc.decode_torch(t(ref_enc), t(pts), t(cls)).numpy()
    my_dec = n(mc.decode(my_enc, pts, cls))
    np.testing.assert_allclose(my_dec, ref_dec, rtol=RTOL, atol=1e-5)


# --------------------------------------------------------------------- #
# losses
# --------------------------------------------------------------------- #

def test_sigmoid_focal_loss_parity():
    from gdmae_tpu.utils import loss_utils as mine

    ref = ref_loader.load_ref("pcdet.utils.loss_utils")
    rng = np.random.RandomState(3)
    logits = rng.randn(2, 100, 3).astype(np.float32) * 4
    target = (rng.rand(2, 100, 3) < 0.2).astype(np.float32)
    w = rng.rand(2, 100).astype(np.float32)

    ref_loss = ref.SigmoidFocalClassificationLoss(gamma=2.0, alpha=0.25)(
        t(logits), t(target), t(w)).numpy()
    my_loss = n(mine.SigmoidFocalClassificationLoss(gamma=2.0, alpha=0.25)(
        logits, target, w))
    np.testing.assert_allclose(my_loss, ref_loss, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("beta", [1.0 / 9.0, 0.0])
def test_weighted_smooth_l1_parity(beta):
    from gdmae_tpu.utils import loss_utils as mine

    ref = ref_loader.load_ref("pcdet.utils.loss_utils")
    rng = np.random.RandomState(4)
    pred = rng.randn(2, 64, 7).astype(np.float32)
    tgt = rng.randn(2, 64, 7).astype(np.float32)
    w = rng.rand(2, 64).astype(np.float32)
    cw = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 2.0]

    ref_loss = ref.WeightedSmoothL1Loss(beta=beta, code_weights=cw)(
        t(pred), t(tgt), t(w)).numpy()
    my_loss = n(mine.WeightedSmoothL1Loss(beta=beta, code_weights=cw)(
        pred, tgt, w))
    np.testing.assert_allclose(my_loss, ref_loss, rtol=1e-5, atol=1e-6)


def test_weighted_l1_parity():
    from gdmae_tpu.utils import loss_utils as mine

    ref = ref_loader.load_ref("pcdet.utils.loss_utils")
    rng = np.random.RandomState(5)
    pred = rng.randn(2, 64, 7).astype(np.float32)
    tgt = rng.randn(2, 64, 7).astype(np.float32)
    w = rng.rand(2, 64).astype(np.float32)

    ref_loss = ref.WeightedL1Loss()(t(pred), t(tgt), t(w)).numpy()
    my_loss = n(mine.WeightedL1Loss()(pred, tgt, w))
    np.testing.assert_allclose(my_loss, ref_loss, rtol=1e-5, atol=1e-6)


def test_weighted_cross_entropy_parity():
    from gdmae_tpu.utils import loss_utils as mine

    ref = ref_loader.load_ref("pcdet.utils.loss_utils")
    rng = np.random.RandomState(6)
    logits = rng.randn(2, 64, 2).astype(np.float32)
    onehot = np.eye(2, dtype=np.float32)[rng.randint(0, 2, (2, 64))]
    w = rng.rand(2, 64).astype(np.float32)

    ref_loss = ref.WeightedCrossEntropyLoss()(t(logits), t(onehot), t(w)).numpy()
    my_loss = n(mine.WeightedCrossEntropyLoss()(logits, onehot, w))
    np.testing.assert_allclose(my_loss, ref_loss, rtol=1e-5, atol=1e-6)


def test_weighted_bce_parity():
    from gdmae_tpu.utils import loss_utils as mine

    ref = ref_loader.load_ref("pcdet.utils.loss_utils")
    rng = np.random.RandomState(7)
    logits = rng.randn(2, 64, 1).astype(np.float32)
    target = (rng.rand(2, 64, 1) < 0.4).astype(np.float32)
    w = rng.rand(2, 64).astype(np.float32)

    ref_loss = ref.WeightedBinaryCrossEntropyLoss()(
        t(logits), t(target), t(w)).numpy()
    my_loss = n(mine.WeightedBinaryCrossEntropyLoss()(logits, target, w))
    np.testing.assert_allclose(my_loss, ref_loss, rtol=1e-5, atol=1e-6)


def test_corner_loss_parity():
    from gdmae_tpu.utils import loss_utils as mine

    ref = ref_loader.load_ref("pcdet.utils.loss_utils")
    rng = np.random.RandomState(8)
    gt = _rand_boxes(rng, 32)
    pred = gt + rng.randn(32, 7).astype(np.float32) * 0.2

    ref_loss = ref.get_corner_loss_lidar(t(pred), t(gt)).numpy()
    my_loss = n(mine.get_corner_loss_lidar(pred, gt))
    np.testing.assert_allclose(my_loss, ref_loss, rtol=1e-4, atol=1e-5)


def test_centernet_focal_loss_parity():
    from gdmae_tpu.utils import loss_utils as mine

    ref = ref_loader.load_ref("pcdet.utils.loss_utils")
    rng = np.random.RandomState(9)
    pred = rng.rand(2, 3, 32, 32).astype(np.float32) * 0.98 + 0.01
    gt = np.zeros((2, 3, 32, 32), np.float32)
    # a few exact-1 peaks + smooth gaussian-ish background
    gt += rng.rand(2, 3, 32, 32).astype(np.float32) * 0.9
    for b in range(2):
        for _ in range(5):
            c, y, x = rng.randint(3), rng.randint(32), rng.randint(32)
            gt[b, c, y, x] = 1.0

    ref_loss = float(ref.neg_loss_cornernet(t(pred), t(gt)))
    my_loss = float(mine.neg_loss_cornernet(pred, gt))
    np.testing.assert_allclose(my_loss, ref_loss, rtol=1e-4)


def test_centernet_reg_loss_parity():
    from gdmae_tpu.utils import loss_utils as mine

    ref = ref_loader.load_ref("pcdet.utils.loss_utils")
    rng = np.random.RandomState(10)
    pred = rng.randn(2, 50, 8).astype(np.float32)
    tgt = rng.randn(2, 50, 8).astype(np.float32)
    mask = (rng.rand(2, 50) < 0.3)

    # reference _reg_loss does `mask *= isnotnan` on an expand()ed view,
    # which CPU torch>=2 rejects; make expand_as contiguous for the call
    # (numerics unchanged)
    orig = torch.Tensor.expand_as
    torch.Tensor.expand_as = lambda self, other: orig(self, other).contiguous()
    try:
        ref_loss = ref._reg_loss(
            t(pred), t(tgt), t(mask.astype(np.float32))).numpy()
    finally:
        torch.Tensor.expand_as = orig
    my_loss = n(mine.reg_loss_centernet(pred, tgt, mask))
    np.testing.assert_allclose(my_loss, ref_loss, rtol=1e-4, atol=1e-6)


# --------------------------------------------------------------------- #
# anchors + axis-aligned target assignment
# --------------------------------------------------------------------- #

ANCHOR_CFG = [
    {"class_name": "Car", "anchor_sizes": [[3.9, 1.6, 1.56]],
     "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.78],
     "matched_threshold": 0.6, "unmatched_threshold": 0.45},
    {"class_name": "Pedestrian", "anchor_sizes": [[0.8, 0.6, 1.73]],
     "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-0.6],
     "matched_threshold": 0.5, "unmatched_threshold": 0.35},
]
PC_RANGE = [0.0, -20.0, -3.0, 40.0, 20.0, 1.0]
GRID = [32, 32]  # (nx, ny)


def test_anchor_generation_parity():
    from gdmae_tpu.models.dense_heads.anchor_head import generate_anchors

    ref_loader._install_stubs()
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_anchor_gen",
        "/root/reference/pcdet/models/dense_heads/target_assigner/anchor_generator.py")
    ag = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ag)

    gen = ag.AnchorGenerator(anchor_range=PC_RANGE,
                             anchor_generator_config=ANCHOR_CFG)
    ref_anchors, ref_num = gen.generate_anchors([GRID, GRID])
    my_anchors, my_num = generate_anchors(ANCHOR_CFG, GRID, PC_RANGE)
    assert list(my_num) == list(ref_num)
    for mine_a, ref_a in zip(my_anchors, ref_anchors):
        # ref: (nz, ny, nx, nsz, nrot, 7); mine: (ny, nx, nh*nsz*nrot, 7)
        nz, ny, nx, nsz, nrot, _ = ref_a.shape
        ref_flat = ref_a.permute(1, 2, 0, 3, 4, 5).reshape(
            ny, nx, nz * nsz * nrot, 7).numpy()
        np.testing.assert_allclose(n(mine_a), ref_flat, rtol=1e-5, atol=1e-5)


def test_axis_aligned_assigner_parity():
    from gdmae_tpu.models.dense_heads.anchor_head import (
        assign_targets_single_class, generate_anchors)
    from gdmae_tpu.utils import box_coder_utils as mine_coders

    ref_bc = ref_loader.load_ref("pcdet.utils.box_coder_utils")
    ref_aa = ref_loader.load_ref(
        "pcdet.models.dense_heads.target_assigner.axis_aligned_target_assigner")

    assigner = ref_aa.AxisAlignedTargetAssigner.__new__(
        ref_aa.AxisAlignedTargetAssigner)
    assigner.box_coder = ref_bc.ResidualCoder()
    assigner.match_height = False
    assigner.pos_fraction = None
    assigner.norm_by_num_examples = False

    rng = np.random.RandomState(11)
    anchors_pc, _ = generate_anchors(ANCHOR_CFG, GRID, PC_RANGE)
    gt = np.zeros((12, 7), np.float32)
    gt[:, 0] = rng.uniform(2, 38, 12)
    gt[:, 1] = rng.uniform(-18, 18, 12)
    gt[:, 2] = rng.uniform(-1.8, -0.5, 12)
    gt[:, 3:6] = np.asarray([[3.9, 1.6, 1.56]]) * rng.uniform(0.8, 1.2, (12, 3))
    gt[:, 6] = rng.uniform(-np.pi, np.pi, 12)
    gt_cls = rng.randint(1, 3, 12)

    for ci, cfg in enumerate(ANCHOR_CFG):
        flat_anchors = np.asarray(anchors_pc[ci]).reshape(-1, 7)
        cls_mask = gt_cls == ci + 1
        ref_out = assigner.assign_targets_single(
            t(flat_anchors), t(gt[cls_mask]).clone(),
            gt_classes=t(np.full(cls_mask.sum(), ci + 1, np.int32)),
            matched_threshold=cfg["matched_threshold"],
            unmatched_threshold=cfg["unmatched_threshold"])

        fg, bg, arg = assign_targets_single_class(
            flat_anchors, gt, cls_mask,
            cfg["matched_threshold"], cfg["unmatched_threshold"])
        my_labels = np.where(n(fg), ci + 1, np.where(n(bg), 0, -1))
        np.testing.assert_array_equal(
            my_labels, ref_out["box_cls_labels"].numpy())
        np.testing.assert_allclose(
            n(fg).astype(np.float32), ref_out["reg_weights"].numpy())

        coder = mine_coders.ResidualCoder()
        tgt = n(coder.encode(gt[n(arg)], flat_anchors))
        tgt = np.where(n(fg)[:, None], tgt, 0.0)
        np.testing.assert_allclose(
            tgt, ref_out["box_reg_targets"].numpy(), rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------- #
# OneCycle schedule
# --------------------------------------------------------------------- #

def test_one_cycle_schedule_parity():
    from gdmae_tpu.runtime import optimization as mine

    ls = ref_loader.load_ref(
        "tools_ref.train_utils.optimization.learning_schedules_fastai")
    total, lr_max, moms, div, pct = 800, 3e-3, (0.95, 0.85), 10.0, 0.4
    opt = ls.FakeOptim()
    sched = ls.OneCycle(opt, total, lr_max, moms, div, pct)
    ref_lr, ref_mom = [], []
    for i in range(total):
        sched.step(i)
        ref_lr.append(opt.lr)
        ref_mom.append(opt.mom)

    lr_fn = mine.one_cycle_lr_fn(total, lr_max, div, pct)
    mom_fn = mine.one_cycle_mom_fn(total, moms, pct)
    steps = np.arange(0, total, 13)
    got_lr = np.array([float(lr_fn(s)) for s in steps])
    got_mom = np.array([float(mom_fn(s)) for s in steps])
    np.testing.assert_allclose(got_lr, np.asarray(ref_lr)[steps], rtol=1e-4)
    np.testing.assert_allclose(got_mom, np.asarray(ref_mom)[steps], rtol=1e-4)


# --------------------------------------------------------------------- #
# window partition + drop semantics
# --------------------------------------------------------------------- #

def _ref_window_partition(coords_yx, grid_hw, window, shifted):
    """Run the REFERENCE get_window_coors on (y, x) cell coords.

    Reference layout: coors columns (batch, z, y, x), window_shape
    (wx, wy, wz), sparse_shape (sx, sy, sz)."""
    su = ref_loader.load_ref("pcdet.models.model_utils.sst_utils")
    m = coords_yx.shape[0]
    coors = np.zeros((m, 4), np.int64)
    coors[:, 2] = coords_yx[:, 0]
    coors[:, 3] = coords_yx[:, 1]
    ny, nx = grid_hw
    wy, wx = window
    win_inds, in_win, _ = su.get_window_coors(
        t(coors), (nx, ny, 1), (wx, wy, 1), shifted)
    return win_inds.numpy(), in_win.numpy()  # in_win columns (z, y, x)


@pytest.mark.parametrize("shifted", [False, True])
def test_window_partition_parity(shifted):
    """Our bucket plan groups exactly the same cells per window, with the
    same in-window coords, as the reference get_window_coors."""
    from gdmae_tpu.ops import window as win_ops

    rng = np.random.RandomState(12)
    ny, nx = 24, 16
    wy, wx = 8, 8
    occ = rng.rand(ny, nx) < 0.3
    coords = np.argwhere(occ)  # (M, 2) [y, x]

    ref_win, ref_inwin = _ref_window_partition(
        coords, (ny, nx), (wy, wx), shifted)

    drop_specs = (win_ops.DropSpec(max_tokens=wy * wx, lower=0, upper=10000),)
    shift = (wy // 2, wx // 2) if shifted else (0, 0)
    plan = win_ops.build_bucket_plan(
        occ.reshape(1, ny, nx), grid_hw=(ny, nx), window=(wy, wx), shift=shift,
        drop_specs=drop_specs, win_caps=(16,))
    assert int(plan.overflow) == 0

    # windows from my plan: token buckets (1, W, T) of flat cell ids
    src = np.asarray(plan.tok_src[0][0])  # (W, T)
    val = np.asarray(plan.tok_valid[0][0])
    yx = np.asarray(plan.tok_yx[0][0])  # (W, T, 2) in-window (y, x)

    ref_group = {}  # ref window id -> set of flat cells
    cell_flat = coords[:, 0] * nx + coords[:, 1]
    for c, w in zip(cell_flat, ref_win):
        ref_group.setdefault(int(w), set()).add(int(c))
    ref_inwin_of_cell = {int(c): (int(zyx[1]), int(zyx[2]))
                         for c, zyx in zip(cell_flat, ref_inwin)}

    my_groups = []
    for wi in range(src.shape[0]):
        cells = set(int(c) for c, v in zip(src[wi], val[wi]) if v)
        if cells:
            my_groups.append(cells)
            for c, v, (iy, ix) in zip(src[wi], val[wi], yx[wi]):
                if v:
                    assert ref_inwin_of_cell[int(c)] == (int(iy), int(ix)), \
                        (int(c), ref_inwin_of_cell[int(c)], (int(iy), int(ix)))

    ref_groups = sorted(map(sorted, ref_group.values()))
    assert sorted(map(sorted, my_groups)) == ref_groups


def test_drop_level_semantics_parity():
    """Our per-window level rule + per-level kept-token count matches the
    reference drop_single_shift (spt_backbone.py:32-51): level by pre-drop
    window count via drop_range, keep min(count, max_tokens) tokens."""
    from gdmae_tpu.ops import window as win_ops

    rng = np.random.RandomState(13)
    ny, nx = 16, 16
    wy, wx = 4, 4
    occ = rng.rand(ny, nx) < 0.6
    coords = np.argwhere(occ)

    drop_info = {0: {"max_tokens": 4, "drop_range": (0, 5)},
                 1: {"max_tokens": 8, "drop_range": (5, 12)},
                 2: {"max_tokens": 16, "drop_range": (12, 100000)}}

    ref_win, _ = _ref_window_partition(coords, (ny, nx), (wy, wx), False)
    # reference drop levels / keep counts per window
    counts = {}
    for w in ref_win:
        counts[int(w)] = counts.get(int(w), 0) + 1
    ref_level = {}
    ref_keep = {}
    for w, cnt in counts.items():
        for dl, info in drop_info.items():
            lo, hi = info["drop_range"]
            if lo <= cnt < hi:
                ref_level[w] = dl
                ref_keep[w] = min(cnt, info["max_tokens"])

    specs = win_ops.drop_specs_from_cfg(
        {str(k): {"max_tokens": v["max_tokens"], "drop_range": list(v["drop_range"])}
         for k, v in drop_info.items()})
    plan = win_ops.build_bucket_plan(
        occ.reshape(1, ny, nx), grid_hw=(ny, nx), window=(wy, wx), shift=(0, 0),
        drop_specs=specs, win_caps=(32, 32, 32))
    assert int(plan.overflow) == 0

    my_level_keep = []
    for li in range(len(specs)):
        val = np.asarray(plan.tok_valid[li][0])  # (W, T)
        for wi in range(val.shape[0]):
            k = int(val[wi].sum())
            if k:
                my_level_keep.append((li, k))
    ref_level_keep = sorted((ref_level[w], ref_keep[w]) for w in counts)
    assert sorted(my_level_keep) == ref_level_keep


# --------------------------------------------------------------------- #
# gaussian heatmap target assignment
# --------------------------------------------------------------------- #

def test_gaussian_heatmap_assign_parity():
    from types import SimpleNamespace

    from gdmae_tpu.ops import centernet as mine

    ch = ref_loader.load_ref("pcdet.models.dense_heads.center_head")
    rng = np.random.RandomState(14)
    pc_range = np.asarray([0.0, -40.0, -3.0, 70.4, 40.0, 1.0], np.float32)
    voxel_size = np.asarray([0.2, 0.2, 4.0], np.float32)
    stride = 2
    fmap = (44, 50)  # (W, H) -> reference feature_map_size is [x, y]
    m = 20
    gt = np.zeros((m, 8), np.float32)
    gt[:, 0] = rng.uniform(1, 69, m)
    gt[:, 1] = rng.uniform(-39, 39, m)
    gt[:, 2] = rng.uniform(-2, 0, m)
    gt[:, 3:6] = rng.uniform(1.0, 5.0, (m, 3))
    gt[:, 6] = rng.uniform(-np.pi, np.pi, m)
    gt[:, 7] = rng.randint(1, 4, m)  # class id (1-based)

    stub = SimpleNamespace(point_cloud_range=t(pc_range),
                           voxel_size=t(voxel_size))
    heat, ret_boxes, iou_boxes, inds, mask = \
        ch.CenterHead.assign_target_of_single_head(
            stub, 3, t(gt), fmap, stride, num_max_objs=m,
            gaussian_overlap=0.1, min_radius=2)

    out = mine.assign_single_head(
        gt, np.ones(m, bool), 3, (fmap[1], fmap[0]), voxel_size, pc_range,
        stride, gaussian_overlap=0.1, min_radius=2)

    np.testing.assert_array_equal(n(out["mask"]), mask.numpy())
    np.testing.assert_array_equal(
        n(out["inds"]) * n(out["mask"]), inds.numpy() * mask.numpy())
    np.testing.assert_allclose(
        n(out["target_boxes"]), ret_boxes.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        n(out["iou_boxes"]), iou_boxes.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        n(out["heatmap"]), heat.numpy(), rtol=1e-4, atol=1e-5)
