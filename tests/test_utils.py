"""Unit tests for geometry, coders, and losses against numpy oracles."""
import numpy as np
import jax.numpy as jnp
import pytest

from gdmae_tpu.utils import box_utils, common_utils
from gdmae_tpu.utils.box_coder_utils import ResidualCoder, PointResidualCoder, PointBinResidualCoder
from gdmae_tpu.utils import loss_utils


def random_boxes(n, seed=0):
    rng = np.random.RandomState(seed)
    xyz = rng.uniform(-20, 20, (n, 3))
    dxyz = rng.uniform(0.5, 5.0, (n, 3))
    r = rng.uniform(-np.pi, np.pi, (n, 1))
    return np.concatenate([xyz, dxyz, r], axis=1).astype(np.float32)


class TestGeometry:
    def test_limit_period(self):
        vals = np.array([0.0, np.pi, -np.pi, 3 * np.pi, 0.1])
        out = common_utils.limit_period(vals, 0.5, 2 * np.pi)
        assert np.all(out >= -np.pi) and np.all(out < np.pi)
        np.testing.assert_allclose(np.sin(out), np.sin(vals), atol=1e-6)
        np.testing.assert_allclose(np.cos(out), np.cos(vals), atol=1e-6)

    def test_rotate_points_along_z(self):
        pts = np.array([[[1.0, 0.0, 2.0, 7.0]]], dtype=np.float32)
        out = common_utils.rotate_points_along_z(pts, np.array([np.pi / 2], dtype=np.float32))
        np.testing.assert_allclose(out[0, 0], [0.0, 1.0, 2.0, 7.0], atol=1e-6)
        # jnp path agrees with np path
        out_j = common_utils.rotate_points_along_z(jnp.asarray(pts), jnp.asarray([np.pi / 2], jnp.float32))
        np.testing.assert_allclose(np.asarray(out_j), out, atol=1e-6)

    def test_corners_axis_aligned(self):
        box = np.array([[0, 0, 0, 2, 4, 6, 0]], dtype=np.float32)
        corners = box_utils.boxes_to_corners_3d(box)
        assert corners.shape == (1, 8, 3)
        np.testing.assert_allclose(corners.min(axis=1)[0], [-1, -2, -3], atol=1e-6)
        np.testing.assert_allclose(corners.max(axis=1)[0], [1, 2, 3], atol=1e-6)

    def test_corners_rotation_invariant_extent(self):
        boxes = random_boxes(16)
        corners = box_utils.boxes_to_corners_3d(boxes)
        # diagonal lengths preserved under rotation
        diag = np.linalg.norm(corners[:, 6] - corners[:, 0], axis=-1)
        expect = np.linalg.norm(boxes[:, 3:6], axis=-1)
        np.testing.assert_allclose(diag, expect, rtol=1e-5)

    def test_points_in_boxes(self):
        box = np.array([[0, 0, 0, 2, 2, 2, np.pi / 4]], dtype=np.float32)
        pts = np.array([
            [0, 0, 0],       # center: inside
            [1.2, 1.2, 0],   # on rotated diagonal: inside (dist sqrt(2*1.44)=1.697 < sqrt(2))
            [1.05, 0, 0],    # beyond the rotated face: x-local = 1.05*cos45 = 0.74 < 1 inside
            [0, 0, 1.5],     # above: outside
            [2.0, 0, 0],     # far: local x = 1.414 > 1 outside
        ], dtype=np.float32)
        mask = box_utils.points_in_boxes_3d(pts, box)[:, 0]
        # corner of rotated box along diagonal is at radius sqrt(2)≈1.414 along x=y
        np.testing.assert_array_equal(mask, [True, False, True, False, False])

    def test_nearest_bev_iou_identity(self):
        boxes = random_boxes(8)
        iou = box_utils.boxes3d_nearest_bev_iou(boxes, boxes)
        np.testing.assert_allclose(np.diag(iou), np.ones(8), atol=1e-5)

    def test_nearest_bev_iou_rotation_snap(self):
        a = np.array([[0, 0, 0, 4, 2, 1, 0]], dtype=np.float32)
        b = np.array([[0, 0, 0, 2, 4, 1, np.pi / 2]], dtype=np.float32)  # snaps to same AA box
        iou = box_utils.boxes3d_nearest_bev_iou(a, b)
        np.testing.assert_allclose(iou, [[1.0]], atol=1e-5)

    def test_enlarge_box3d(self):
        boxes = random_boxes(4)
        out = np.asarray(box_utils.enlarge_box3d(boxes, [0.5, 0.5, 0.5]))
        np.testing.assert_allclose(out[:, 3:6], boxes[:, 3:6] + 0.5, atol=1e-6)
        np.testing.assert_allclose(out[:, 2], boxes[:, 2] - 0.25, atol=1e-6)

    def test_mask_boxes_outside_range(self):
        boxes = np.array([
            [0, 0, 0, 1, 1, 1, 0.3],
            [100, 100, 0, 1, 1, 1, 0.0],
        ], dtype=np.float32)
        mask = box_utils.mask_boxes_outside_range_numpy(boxes, [-10, -10, -10, 10, 10, 10])
        np.testing.assert_array_equal(mask, [True, False])


class TestCoders:
    def test_residual_coder_roundtrip(self):
        coder = ResidualCoder()
        boxes = random_boxes(32, 1)
        anchors = random_boxes(32, 2)
        enc = coder.encode(jnp.asarray(boxes), jnp.asarray(anchors))
        dec = np.asarray(coder.decode(enc, jnp.asarray(anchors)))
        np.testing.assert_allclose(dec[:, :6], boxes[:, :6], atol=1e-3)
        np.testing.assert_allclose(dec[:, 6], boxes[:, 6], atol=1e-4)

    def test_residual_coder_sincos_roundtrip(self):
        coder = ResidualCoder(encode_angle_by_sincos=True)
        assert coder.code_size == 8
        boxes = random_boxes(16, 3)
        anchors = random_boxes(16, 4)
        enc = coder.encode(jnp.asarray(boxes), jnp.asarray(anchors))
        assert enc.shape[-1] == 8
        dec = np.asarray(coder.decode(enc, jnp.asarray(anchors)))
        np.testing.assert_allclose(np.sin(dec[:, 6]), np.sin(boxes[:, 6]), atol=1e-4)
        np.testing.assert_allclose(np.cos(dec[:, 6]), np.cos(boxes[:, 6]), atol=1e-4)

    def test_point_residual_coder_roundtrip(self):
        coder = PointResidualCoder(mean_size=[[3.9, 1.6, 1.56], [0.8, 0.6, 1.73]])
        boxes = random_boxes(16, 5)
        pts = boxes[:, :3] + np.random.RandomState(0).uniform(-1, 1, (16, 3)).astype(np.float32)
        cls = np.random.RandomState(1).randint(1, 3, 16)
        enc = coder.encode(jnp.asarray(boxes), jnp.asarray(pts), jnp.asarray(cls))
        dec = np.asarray(coder.decode(enc, jnp.asarray(pts), jnp.asarray(cls)))
        np.testing.assert_allclose(dec[:, :6], boxes[:, :6], atol=1e-3)
        np.testing.assert_allclose(np.sin(dec[:, 6]), np.sin(boxes[:, 6]), atol=1e-4)

    def test_bin_coder_angle_roundtrip(self):
        coder = PointBinResidualCoder(angle_bin_num=12, mean_size=[[3.9, 1.6, 1.56]])
        angles = jnp.asarray(np.linspace(-np.pi, np.pi, 37, dtype=np.float32))
        cls_oh, res = coder.encode_angle(angles)
        dec = np.asarray(coder.decode_angle(cls_oh, res))
        np.testing.assert_allclose(np.sin(dec), np.sin(np.asarray(angles)), atol=1e-5)
        np.testing.assert_allclose(np.cos(dec), np.cos(np.asarray(angles)), atol=1e-5)


class TestLosses:
    def test_focal_loss_zero_for_perfect(self):
        loss_fn = loss_utils.SigmoidFocalClassificationLoss()
        logits = jnp.asarray([[[20.0, -20.0]]])
        targets = jnp.asarray([[[1.0, 0.0]]])
        weights = jnp.asarray([[1.0]])
        loss = loss_fn(logits, targets, weights)
        assert float(loss.sum()) < 1e-6

    def test_focal_loss_matches_formula(self):
        rng = np.random.RandomState(0)
        logits = rng.randn(2, 5, 3).astype(np.float32)
        targets = (rng.rand(2, 5, 3) > 0.5).astype(np.float32)
        weights = rng.rand(2, 5).astype(np.float32)
        loss = np.asarray(loss_utils.SigmoidFocalClassificationLoss()(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weights)))
        # numpy oracle
        sig = 1 / (1 + np.exp(-logits))
        alpha_w = targets * 0.25 + (1 - targets) * 0.75
        pt = targets * (1 - sig) + (1 - targets) * sig
        bce = np.clip(logits, 0, None) - logits * targets + np.log1p(np.exp(-np.abs(logits)))
        expect = alpha_w * pt ** 2 * bce * weights[..., None]
        np.testing.assert_allclose(loss, expect, rtol=1e-3, atol=1e-6)

    def test_smooth_l1(self):
        loss_fn = loss_utils.WeightedSmoothL1Loss(code_weights=[1.0, 2.0])
        inputs = jnp.asarray([[[0.0, 0.0]]])
        targets = jnp.asarray([[[1.0, 0.05]]])
        out = np.asarray(loss_fn(inputs, targets))
        beta = 1.0 / 9.0
        # |diff*w| = 1.0 -> linear; 0.1 < beta -> quadratic
        np.testing.assert_allclose(out[0, 0, 0], 1.0 - 0.5 * beta, rtol=1e-5)
        np.testing.assert_allclose(out[0, 0, 1], 0.5 * 0.1 ** 2 / beta, rtol=1e-5)

    def test_corner_loss_zero_and_flip(self):
        boxes = jnp.asarray(random_boxes(4))
        loss = np.asarray(loss_utils.get_corner_loss_lidar(boxes, boxes))
        np.testing.assert_allclose(loss, 0.0, atol=1e-5)
        flipped = boxes.at[:, 6].add(np.pi)
        loss_f = np.asarray(loss_utils.get_corner_loss_lidar(boxes, flipped))
        np.testing.assert_allclose(loss_f, 0.0, atol=1e-4)

    def test_chamfer_identity(self):
        pts = jnp.asarray(np.random.RandomState(0).randn(3, 16, 3).astype(np.float32))
        loss = float(loss_utils.chamfer_distance(pts, pts))
        assert loss < 1e-10

    def test_chamfer_weights_mask_sets(self):
        rng = np.random.RandomState(1)
        pred = jnp.asarray(rng.randn(2, 8, 3).astype(np.float32))
        gt = jnp.asarray(rng.randn(2, 8, 3).astype(np.float32))
        w = jnp.asarray([1.0, 0.0])
        loss_w = float(loss_utils.chamfer_distance(pred, gt, weights=w))
        loss_0 = float(loss_utils.chamfer_distance(pred[:1], gt[:1]))
        np.testing.assert_allclose(loss_w, loss_0, rtol=1e-5)


class TestConfig:
    def test_yaml_merge_and_override(self, tmp_path):
        base = tmp_path / "base.yaml"
        base.write_text("DATA_PATH: /data\nPOINT_CLOUD_RANGE: [0, -40, -3, 70, 40, 1]\n")
        child = tmp_path / "child.yaml"
        child.write_text(
            f"DATA_CONFIG:\n  _BASE_CONFIG_: {base}\n  POINT_CLOUD_RANGE: [0, -39.68, -3, 69.12, 39.68, 1]\n"
            "MODEL:\n  NAME: PointPillar\n  LR: 0.003\n"
        )
        from gdmae_tpu.config import cfg_from_yaml_file, cfg_from_list
        from gdmae_tpu.config import EasyDict
        config = cfg_from_yaml_file(str(child), EasyDict())
        assert config.DATA_CONFIG.DATA_PATH == "/data"
        assert config.DATA_CONFIG.POINT_CLOUD_RANGE[3] == 69.12
        cfg_from_list(["MODEL.LR", "0.001"], config)
        assert config.MODEL.LR == 0.001
        with pytest.raises(AssertionError):
            cfg_from_list(["MODEL.MISSING", "1"], config)


def test_chamfer_select_matches_exact():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gdmae_tpu.utils.loss_utils import chamfer_distance

    rng = np.random.RandomState(0)
    n, p1, p2 = 64, 16, 64
    pred = jnp.asarray(rng.randn(n, p1, 3).astype(np.float32))
    gt = jnp.asarray(rng.randn(n, p2, 3).astype(np.float32))
    gm = jnp.asarray(rng.rand(n, p2) > 0.4).at[:, 0].set(True)
    w = jnp.asarray(rng.rand(n).astype(np.float32))
    exact = chamfer_distance(pred, gt, gt_mask=gm, weights=w, method="exact")
    sel = chamfer_distance(pred, gt, gt_mask=gm, weights=w, method="select")
    # bf16 argmin can pick a near-tied neighbour; values still agree closely
    np.testing.assert_allclose(float(sel), float(exact), rtol=2e-2)

    g_exact = jax.grad(lambda p: chamfer_distance(
        p, gt, gt_mask=gm, weights=w, method="exact"))(pred)
    g_sel = jax.grad(lambda p: chamfer_distance(
        p, gt, gt_mask=gm, weights=w, method="select"))(pred)
    # gradients differ only where the bf16 argmin picked a different
    # near-tied neighbour; compare in aggregate
    np.testing.assert_allclose(
        float(jnp.linalg.norm(g_sel - g_exact))
        / max(float(jnp.linalg.norm(g_exact)), 1e-9), 0.0, atol=0.1)


def test_chamfer_custom_vjp_matches_autodiff():
    """The hand-written chamfer backward (one-hot argmin + einsum, avoids
    materializing the (N,P1,P2) select-mask cotangent in HBM) must match
    plain autodiff through the min."""
    import jax
    import jax.numpy as jnp
    from gdmae_tpu.utils import loss_utils

    rng = np.random.RandomState(5)
    n, p1, p2 = 3, 16, 64
    pred = jnp.asarray(rng.randn(n, p1, 3).astype(np.float32))
    gt = jnp.asarray(rng.randn(n, p2, 3).astype(np.float32))
    pm = jnp.asarray(rng.rand(n, p1) > 0.2)
    gm = jnp.asarray(rng.rand(n, p2) > 0.3)
    w = jnp.asarray(rng.rand(n).astype(np.float32))

    def loss_custom(pr, g):
        return loss_utils.chamfer_distance(
            pr, g, pred_mask=pm, gt_mask=gm, weights=w, method="exact")

    def loss_plain(pr, g):
        big = jnp.asarray(1e9, pr.dtype)
        d2 = jnp.sum((pr[:, :, None, :] - g[:, None, :, :]) ** 2, axis=-1)
        min_pg = jnp.where(gm[:, None, :], d2, big).min(axis=2)
        min_gp = jnp.where(pm[:, :, None], d2, big).min(axis=1)
        pm_f = pm.astype(pr.dtype)
        gm_f = gm.astype(pr.dtype)
        l_pg = (min_pg * pm_f).sum(-1) / jnp.clip(pm_f.sum(-1), 1.0, None)
        l_gp = (min_gp * gm_f).sum(-1) / jnp.clip(gm_f.sum(-1), 1.0, None)
        return jnp.sum((l_pg + l_gp) * w) / jnp.clip(w.sum(), 1e-6, None)

    v0 = float(loss_plain(pred, gt))
    v1 = float(loss_custom(pred, gt))
    np.testing.assert_allclose(v1, v0, rtol=1e-5)
    g0 = jax.grad(loss_plain, argnums=(0, 1))(pred, gt)
    g1 = jax.grad(loss_custom, argnums=(0, 1))(pred, gt)
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
