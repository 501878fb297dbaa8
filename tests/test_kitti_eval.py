"""KITTI eval protocol sanity tests (perfect/imperfect detector oracles)."""
import numpy as np

from gdmae_tpu.datasets.kitti.kitti_object_eval_python import eval as kitti_eval


def make_scene(rng, n_gt, cls="Car"):
    gt = {
        "name": np.array([cls] * n_gt),
        "truncated": np.zeros(n_gt),
        "occluded": np.zeros(n_gt, np.int64),
        "alpha": rng.uniform(-np.pi, np.pi, n_gt),
        "bbox": np.stack([
            rng.uniform(0, 500, n_gt), rng.uniform(0, 100, n_gt),
            np.zeros(n_gt), np.zeros(n_gt)], axis=1),
        "dimensions": np.stack([
            rng.uniform(3, 4, n_gt), rng.uniform(1.4, 1.6, n_gt),
            rng.uniform(1.5, 1.7, n_gt)], axis=1),
        "location": np.stack([
            rng.uniform(-20, 20, n_gt), rng.uniform(1, 2, n_gt),
            rng.uniform(5, 60, n_gt)], axis=1),
        "rotation_y": rng.uniform(-np.pi, np.pi, n_gt),
    }
    gt["bbox"][:, 2] = gt["bbox"][:, 0] + 50
    gt["bbox"][:, 3] = gt["bbox"][:, 1] + 45  # height 45 > 40 => easy-valid
    # spread boxes apart in 3d
    gt["location"][:, 0] = np.arange(n_gt) * 10.0
    return gt


def perfect_det(gt, rng):
    n = len(gt["name"])
    return {
        "name": gt["name"].copy(),
        "alpha": gt["alpha"].copy(),
        "bbox": gt["bbox"].copy(),
        "dimensions": gt["dimensions"].copy(),
        "location": gt["location"].copy(),
        "rotation_y": gt["rotation_y"].copy(),
        "score": rng.uniform(0.1, 1.0, n),
    }


def test_perfect_detector_ap100():
    rng = np.random.RandomState(0)
    gts, dts = [], []
    for _ in range(30):
        gt = make_scene(rng, 4)
        gts.append(gt)
        dts.append(perfect_det(gt, rng))
    result, ret = kitti_eval.get_official_eval_result(gts, dts, ["Car"])
    assert ret["Car_3d/easy_R40"] > 99.0, ret
    assert ret["Car_bev/easy_R40"] > 99.0
    assert ret["Car_image/easy_R40"] > 99.0


def test_half_missed_detector():
    rng = np.random.RandomState(1)
    gts, dts = [], []
    for _ in range(30):
        gt = make_scene(rng, 4)
        gts.append(gt)
        dt = perfect_det(gt, rng)
        # drop half the detections
        for k in dt:
            dt[k] = dt[k][:2]
        dts.append(dt)
    result, ret = kitti_eval.get_official_eval_result(gts, dts, ["Car"])
    # recall caps at 0.5 -> AP_R40 about 50
    assert 40.0 < ret["Car_3d/easy_R40"] < 60.0, ret


def test_false_positives_reduce_ap():
    rng = np.random.RandomState(2)
    gts, dts = [], []
    for _ in range(30):
        gt = make_scene(rng, 4)
        gts.append(gt)
        dt = perfect_det(gt, rng)
        # add spurious low-score detections far away
        fp = perfect_det(gt, rng)
        fp["location"] = fp["location"] + 500.0
        fp["bbox"] = fp["bbox"] + 300.0
        fp["score"] = rng.uniform(0.01, 0.05, len(fp["score"]))
        for k in dt:
            dt[k] = np.concatenate([dt[k], fp[k]])
        dts.append(dt)
    _, ret_clean = kitti_eval.get_official_eval_result(gts, [perfect_det(g, rng) for g in gts], ["Car"])
    _, ret_fp = kitti_eval.get_official_eval_result(gts, dts, ["Car"])
    assert ret_fp["Car_3d/easy_R40"] <= ret_clean["Car_3d/easy_R40"] + 1e-6
