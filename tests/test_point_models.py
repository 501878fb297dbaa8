"""PointNet2 backbone + PointHeadVote (3DSSD-style) smoke tests."""
import numpy as np
import jax
import jax.numpy as jnp

from gdmae_tpu.config import EasyDict
from gdmae_tpu.models.detectors.detector3d_template import DatasetMeta, build_network
import pytest
# full-model compiles: slow tier (deselect via pytest.ini addopts)
pytestmark = pytest.mark.slow



def ssd3d_cfg():
    return EasyDict({
        "NAME": "SSD3D",
        "BACKBONE_3D": {
            "NAME": "PointNet2SAMSG",
            "SA_CONFIG": {
                "NPOINTS": [[256], [64, 64]],
                "SAMPLE_RANGE": [[[0, 1024]], [[0, 128], [128, 256]]],
                "SAMPLE_METHOD": [["d-fps"], ["f-fps", "d-fps"]],
                "RADIUS": [[0.2, 0.8], [0.8, 1.6]],
                "NSAMPLE": [[8, 16], [8, 16]],
                "MLPS": [[[16, 16], [16, 32]], [[32, 32], [32, 32]]],
                "AGGREGATION_MLPS": [[32], [64]],
                "WEIGHT_GAMMA": 1.0,
                "DILATED_RADIUS_GROUP": True,
            },
        },
        "POINT_HEAD": {
            "NAME": "PointHeadVote",
            "CLASS_AGNOSTIC": False,
            "VOTE_CONFIG": {
                "SAMPLE_RANGE": [0, 64],
                "VOTE_XYZ_RANGE": [3.0, 3.0, 2.0],
                "MLPS": [32],
            },
            "VOTE_SA_CONFIG": {
                "RADIUS": [0.8, 1.6],
                "NSAMPLE": [8, 16],
                "MLPS": [[32, 32], [32, 64]],
            },
            "SHARED_FC": [64],
            "CLS_FC": [32],
            "REG_FC": [32],
            "TARGET_CONFIG": {
                "GT_EXTRA_WIDTH": [1.0, 1.0, 1.0],
                "GT_CENTRAL_RADIUS": 10.0,
                "BOX_CODER": "PointBinResidualCoder",
                "BOX_CODER_CONFIG": {
                    "angle_bin_num": 12,
                    "use_mean_size": True,
                    "mean_size": [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73],
                                  [1.76, 0.6, 1.73]],
                },
            },
            "LOSS_CONFIG": {
                "PREDICT_BOXES": False,
                "CLS_POS_NORM": False,
                "CLS_LOSS": "WeightedBinaryCrossEntropyLossWithCenterness",
                "REG_LOSS": "WeightedSmoothL1Loss",
                "CORNER_LOSS_TYPE": 1,
                "AUX_CLS_LOSS": "WeightedBinaryCrossEntropyLoss",
                "LOSS_WEIGHTS": {
                    "vote_cls_weight": 1.0,
                    "vote_reg_weight": 1.0,
                    "seed_reg_weight_list": [1.0],
                    "vote_corner_weight": 1.0,
                },
            },
        },
        "POST_PROCESSING": {
            "RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
            "SCORE_THRESH": 0.1,
            "EVAL_METRIC": "kitti",
            "NMS_CONFIG": {
                "MULTI_CLASSES_NMS": False,
                "NMS_TYPE": "nms_gpu",
                "NMS_THRESH": 0.1,
                "NMS_PRE_MAXSIZE": 64,
                "NMS_POST_MAXSIZE": 16,
            },
        },
    })


def test_ssd3d_train_eval():
    meta = DatasetMeta(
        class_names=["Car", "Pedestrian", "Cyclist"],
        point_cloud_range=[0, -10.24, -3, 20.48, 10.24, 1],
        voxel_size=[0.32, 0.32, 4],
        grid_size=[64, 64],
        num_point_features=4,
        max_points=1024,
        max_pillars=256,
    )
    model = build_network(ssd3d_cfg(), num_class=3, dataset=meta)
    rng = np.random.RandomState(0)
    n = 1024
    pts = np.zeros((2, n, 4), np.float32)
    pts[..., 0] = rng.uniform(0.5, 20, (2, n))
    pts[..., 1] = rng.uniform(-10, 10, (2, n))
    pts[..., 2] = rng.uniform(-2.5, 0.5, (2, n))
    gt = np.zeros((2, 8, 8), np.float32)
    for bi in range(2):
        for gi in range(4):
            gt[bi, gi] = [rng.uniform(3, 18), rng.uniform(-8, 8), -1.0,
                          rng.uniform(2, 4.5), rng.uniform(1.5, 1.9), 1.5,
                          rng.uniform(-np.pi, np.pi), rng.randint(1, 4)]
    batch = {"points": jnp.asarray(pts), "point_mask": jnp.ones((2, n), bool),
             "gt_boxes": jnp.asarray(gt)}

    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=True)
    out, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))

    out_eval = model.apply(variables, batch, train=False)
    assert out_eval["final_boxes"].shape[:2] == (2, 16)
