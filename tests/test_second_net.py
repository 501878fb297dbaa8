"""SECONDNet path: 3D DynVFE -> VoxelBackBone8x -> HeightCompression ->
BaseBEVBackbone -> AnchorHeadSingle."""
import numpy as np
import jax
import jax.numpy as jnp

from gdmae_tpu.config import EasyDict
from gdmae_tpu.models.detectors.detector3d_template import DatasetMeta, build_network
import pytest
# full-model compiles: slow tier (deselect via pytest.ini addopts)
pytestmark = pytest.mark.slow



def second_cfg():
    return EasyDict({
        "NAME": "SECONDNet",
        "VFE": {"NAME": "DynVFE", "TYPE": "mean"},
        "BACKBONE_3D": {"NAME": "VoxelBackBone8x"},
        "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 256},
        "BACKBONE_2D": {
            "NAME": "BaseBEVBackbone",
            "LAYER_NUMS": [2, 2], "LAYER_STRIDES": [1, 2],
            "NUM_FILTERS": [32, 64], "UPSAMPLE_STRIDES": [1, 2],
            "NUM_UPSAMPLE_FILTERS": [32, 32],
        },
        "DENSE_HEAD": {
            "NAME": "AnchorHeadSingle", "CLASS_AGNOSTIC": False,
            "USE_DIRECTION_CLASSIFIER": True, "DIR_OFFSET": 0.78539,
            "DIR_LIMIT_OFFSET": 0.0, "NUM_DIR_BINS": 2,
            "ANCHOR_GENERATOR_CONFIG": [{
                "class_name": "Car", "anchor_sizes": [[3.9, 1.6, 1.56]],
                "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.78],
                "align_center": False, "feature_map_stride": 8,
                "matched_threshold": 0.6, "unmatched_threshold": 0.45,
            }],
            "TARGET_ASSIGNER_CONFIG": {
                "NAME": "AxisAlignedTargetAssigner", "POS_FRACTION": -1.0,
                "SAMPLE_SIZE": 512, "NORM_BY_NUM_EXAMPLES": False,
                "MATCH_HEIGHT": False, "BOX_CODER": "ResidualCoder",
            },
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {
                "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
                "code_weights": [1.0] * 7}},
        },
        "POST_PROCESSING": {
            "RECALL_THRESH_LIST": [0.3, 0.5, 0.7], "SCORE_THRESH": 0.3,
            "EVAL_METRIC": "kitti",
            "NMS_CONFIG": {"MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
                           "NMS_THRESH": 0.01, "NMS_PRE_MAXSIZE": 256,
                           "NMS_POST_MAXSIZE": 32},
        },
    })


def test_second_train_eval():
    # tiny 3D grid: 32x32x16 voxels of 0.2m
    meta = DatasetMeta(
        class_names=["Car"],
        point_cloud_range=[0, -3.2, -3, 6.4, 3.2, 5.0],
        voxel_size=[0.2, 0.2, 0.2],
        grid_size=[32, 32, 40],
        num_point_features=4,
        max_points=512,
        max_pillars=512,  # voxel capacity
    )
    model = build_network(second_cfg(), num_class=1, dataset=meta)
    rng = np.random.RandomState(0)
    n = 512
    pts = np.zeros((2, n, 4), np.float32)
    pts[..., 0] = rng.uniform(0.2, 6.2, (2, n))
    pts[..., 1] = rng.uniform(-3, 3, (2, n))
    pts[..., 2] = rng.uniform(-2.9, 4.9, (2, n))
    gt = np.zeros((2, 4, 8), np.float32)
    for bi in range(2):
        gt[bi, 0] = [3.0, 0.0, -1.5, 3.9, 1.6, 1.56, 0.3, 1]
        gt[bi, 1] = [5.0, -2.0, -1.5, 3.9, 1.6, 1.56, -0.5, 1]
    batch = {"points": jnp.asarray(pts), "point_mask": jnp.ones((2, n), bool),
             "gt_boxes": jnp.asarray(gt)}
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=True)
    out, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))
    out_eval = model.apply(variables, batch, train=False)
    assert out_eval["final_boxes"].shape == (2, 32, 7)
