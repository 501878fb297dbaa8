"""ONCE eval protocol sanity tests."""
import numpy as np

from gdmae_tpu.datasets.once.once_eval.evaluation import get_evaluation_results

CLASSES = ["Car", "Bus", "Truck", "Pedestrian", "Cyclist"]


def make_scene(rng, n):
    boxes = np.zeros((n, 7))
    boxes[:, 0] = np.linspace(5, 60, n)
    boxes[:, 1] = rng.uniform(-20, 20, n)
    boxes[:, 2] = rng.uniform(-1, 0, n)
    boxes[:, 3:6] = rng.uniform(1.5, 4.5, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    names = rng.choice(["Car", "Pedestrian", "Cyclist"], n)
    return {"name": names, "boxes_3d": boxes}


def test_perfect_detector():
    rng = np.random.RandomState(0)
    gts, preds = [], []
    for _ in range(25):
        gt = make_scene(rng, 6)
        gts.append(gt)
        preds.append({
            "name": gt["name"].copy(),
            "boxes_3d": gt["boxes_3d"].copy(),
            "score": rng.uniform(0.5, 1.0, 6),
        })
    s, d = get_evaluation_results(gts, preds, list(CLASSES))
    assert d["AP_mean/overall"] > 95.0, s


def test_missing_class_detector():
    rng = np.random.RandomState(1)
    gts, preds = [], []
    for _ in range(25):
        gt = make_scene(rng, 6)
        gts.append(gt)
        keep = gt["name"] != "Cyclist"
        preds.append({
            "name": gt["name"][keep],
            "boxes_3d": gt["boxes_3d"][keep],
            "score": rng.uniform(0.5, 1.0, int(keep.sum())),
        })
    s, d = get_evaluation_results(gts, preds, list(CLASSES))
    assert d["AP_Cyclist/overall"] < 1.0
    assert d["AP_Vehicle/overall"] > 95.0
