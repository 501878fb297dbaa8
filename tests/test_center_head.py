"""CenterHead / CenterPoint pipeline tests on a tiny config."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gdmae_tpu.config import EasyDict
from gdmae_tpu.models.detectors.detector3d_template import DatasetMeta, build_network
from gdmae_tpu.ops import centernet

# full-model compiles: slow tier (deselect via pytest.ini addopts)
pytestmark = pytest.mark.slow



def center_model_cfg(with_iou=False):
    head_dict = {
        "center": {"out_channels": 2, "num_conv": 2},
        "center_z": {"out_channels": 1, "num_conv": 2},
        "dim": {"out_channels": 3, "num_conv": 2},
        "rot": {"out_channels": 2, "num_conv": 2},
    }
    loss_weights = {
        "cls_weight": 1.0, "loc_weight": 2.0,
        "code_weights": [1.0] * 8,
    }
    nms = {
        "NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.7,
        "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 32,
    }
    if with_iou:
        head_dict["iou"] = {"out_channels": 1, "num_conv": 2}
        loss_weights["iou_weight"] = 1.0
        nms = {
            "NMS_TYPE": "multi_class_nms",
            "NMS_THRESH": [0.8, 0.55, 0.55],
            "NMS_PRE_MAXSIZE": [64, 64, 64],
            "NMS_POST_MAXSIZE": [16, 16, 16],
            "IOU_RECTIFIER": [0.5, 0.71, 0.65],
        }
    return EasyDict({
        "NAME": "CenterPoint",
        "VFE": {
            "NAME": "DynVFE", "TYPE": "mean", "WITH_DISTANCE": False,
            "USE_ABSLOTE_XYZ": True, "USE_CLUSTER_XYZ": True, "MLPS": [[32, 32]],
        },
        "MAP_TO_BEV": {"NAME": "PointPillarScatter", "NUM_BEV_FEATURES": 32},
        "BACKBONE_2D": {
            "NAME": "BaseBEVBackbone",
            "LAYER_NUMS": [2], "LAYER_STRIDES": [1], "NUM_FILTERS": [32],
            "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [32],
        },
        "DENSE_HEAD": {
            "NAME": "CenterHead", "CLASS_AGNOSTIC": False,
            "CLASS_NAMES_EACH_HEAD": [["Car", "Pedestrian", "Cyclist"]],
            "SHARED_CONV_CHANNEL": 32, "USE_BIAS_BEFORE_NORM": True,
            "NUM_HM_CONV": 2,
            "SEPARATE_HEAD_CFG": {
                "HEAD_ORDER": ["center", "center_z", "dim", "rot"],
                "HEAD_DICT": head_dict,
            },
            "TARGET_ASSIGNER_CONFIG": {
                "FEATURE_MAP_STRIDE": 1, "NUM_MAX_OBJS": 500,
                "GAUSSIAN_OVERLAP": 0.1, "MIN_RADIUS": 2,
            },
            "LOSS_CONFIG": {"LOSS_WEIGHTS": loss_weights},
            "POST_PROCESSING": {
                "SCORE_THRESH": 0.1,
                "POST_CENTER_LIMIT_RANGE": [0, -10.24, -3, 20.48, 10.24, 1],
                "MAX_OBJ_PER_SAMPLE": 128,
                "NMS_CONFIG": nms,
            },
        },
        "POST_PROCESSING": {"RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
                            "EVAL_METRIC": "once"},
    })


def small_meta():
    return DatasetMeta(
        class_names=["Car", "Pedestrian", "Cyclist"],
        point_cloud_range=[0, -10.24, -3, 20.48, 10.24, 1],
        voxel_size=[0.32, 0.32, 4],
        grid_size=[64, 64],
        num_point_features=4,
        max_points=1024,
        max_pillars=512,
    )


def synth_batch(rng, b=2, n=1024):
    pts = np.zeros((b, n, 4), np.float32)
    pts[..., 0] = rng.uniform(0.5, 20.0, (b, n))
    pts[..., 1] = rng.uniform(-10.0, 10.0, (b, n))
    pts[..., 2] = rng.uniform(-2.5, 0.5, (b, n))
    gt = np.zeros((b, 8, 8), np.float32)
    for bi in range(b):
        for gi in range(5):
            gt[bi, gi] = [rng.uniform(3, 18), rng.uniform(-8, 8), -1.0,
                          rng.uniform(2, 4.5), rng.uniform(1.5, 1.9), 1.5,
                          rng.uniform(-np.pi, np.pi), rng.randint(1, 4)]
    return {"points": jnp.asarray(pts),
            "point_mask": jnp.ones((b, n), bool),
            "gt_boxes": jnp.asarray(gt)}


def test_gaussian_assign_matches_reference_semantics():
    # single box centered; heatmap peak must be 1 at its cell
    gt = jnp.asarray(np.array([[[5.0, 0.0, -1, 4, 2, 1.5, 0.3, 1]]], np.float32))
    valid = jnp.ones((1, 1), bool)
    out = jax.vmap(lambda b, v: centernet.assign_single_head(
        b, v, 3, (64, 64), (0.32, 0.32, 4), (0, -10.24, -3, 20.48, 10.24, 1), 1
    ))(gt, valid)
    hm = np.asarray(out["heatmap"])[0]
    cx = int((5.0 - 0) / 0.32)
    cy = int((0.0 + 10.24) / 0.32)
    assert hm[0, cy, cx] == 1.0
    assert hm[1].max() == 0.0  # other classes empty
    assert int(out["inds"][0, 0]) == cy * 64 + cx
    assert int(out["mask"][0, 0]) == 1
    # target box residuals: log dims
    np.testing.assert_allclose(np.asarray(out["target_boxes"])[0, 0, 3:6],
                               np.log([4, 2, 1.5]), rtol=1e-5)


@pytest.mark.parametrize("with_iou", [False, True])
def test_centerpoint_train_eval(with_iou):
    meta = small_meta()
    model = build_network(center_model_cfg(with_iou), num_class=3, dataset=meta)
    rng = np.random.RandomState(0)
    batch = synth_batch(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=True)
    out, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))

    out_eval = model.apply(variables, batch, train=False)
    assert "final_boxes" in out_eval
    assert out_eval["final_boxes"].shape[0] == 2
    assert out_eval["final_valid"].dtype == bool
