"""Host data pipeline tests: augmentor ops, hard voxelizer, fixed-capacity
collate, gt sampler collision logic (synthetic data; no dataset files)."""
import numpy as np
import pytest

from gdmae_tpu.config import EasyDict
from gdmae_tpu.datasets.augmentor.data_augmentor import DataAugmentor
from gdmae_tpu.datasets.dataset import DatasetTemplate
from gdmae_tpu.datasets.processor.data_processor import DataProcessor, numpy_hard_voxelize
from gdmae_tpu.utils.rotated_iou_np import boxes_bev_iou_cpu


def test_hard_voxelize_matches_bruteforce():
    rng = np.random.RandomState(0)
    pts = rng.uniform(0, 4, (500, 4)).astype(np.float32)
    pc_range = [0, 0, 0, 4, 4, 4]
    vs = [0.5, 0.5, 0.5]
    voxels, coords, num = numpy_hard_voxelize(pts, vs, pc_range, 5, 1000)
    # every voxel's points actually fall inside it; counts capped at 5
    for i in range(len(coords)):
        iz, iy, ix = coords[i]
        for p in voxels[i][:num[i]]:
            assert int(p[0] / 0.5) == ix and int(p[1] / 0.5) == iy and int(p[2] / 0.5) == iz
    assert num.max() <= 5
    # unique voxels
    lin = (coords[:, 0].astype(np.int64) * 8 + coords[:, 1]) * 8 + coords[:, 2]
    assert len(np.unique(lin)) == len(lin)


def test_world_flip_rotation_scaling_consistency():
    cfg = EasyDict({
        "DISABLE_AUG_LIST": ["placeholder"],
        "AUG_CONFIG_LIST": [
            {"NAME": "random_world_flip", "PROBABILITY": 1.0, "ALONG_AXIS_LIST": ["x"]},
            {"NAME": "random_world_rotation", "PROBABILITY": 1.0,
             "WORLD_ROT_ANGLE": [-0.78539816, 0.78539816]},
            {"NAME": "random_world_scaling", "PROBABILITY": 1.0,
             "WORLD_SCALE_RANGE": [0.95, 1.05]},
        ],
    })
    aug = DataAugmentor(root_path=".", augmentor_configs=cfg, class_names=["Car"])
    rng = np.random.RandomState(1)
    pts = rng.uniform(-10, 10, (100, 4)).astype(np.float32)
    boxes = np.array([[1.0, 2.0, -1.0, 4, 2, 1.5, 0.3]], np.float32)
    # plant a point at the box center: it must follow the box center exactly
    pts[0, :3] = boxes[0, :3]
    dd = {"points": pts.copy(), "gt_boxes": boxes.copy(),
          "gt_names": np.array(["Car"]), "gt_boxes_mask": np.array([True])}
    out = aug.forward(dd)
    np.testing.assert_allclose(out["points"][0, :3], out["gt_boxes"][0, :3], atol=1e-5)
    # recorded params allow replay
    assert set(out["transformation_3d_list"]) == {
        "random_world_flip", "random_world_rotation", "random_world_scaling"}


def test_collate_fixed_capacity():
    ds = DatasetTemplate.__new__(DatasetTemplate)
    ds.max_points = 128
    ds.max_gt_boxes = 8
    ds.max_pillars = 64
    ds.logger = None
    rng = np.random.RandomState(2)
    batch_list = [
        {"points": rng.randn(100, 4).astype(np.float32),
         "gt_boxes": rng.randn(3, 8).astype(np.float32), "frame_id": "a"},
        {"points": rng.randn(200, 4).astype(np.float32),  # overflows -> sampled
         "gt_boxes": rng.randn(12, 8).astype(np.float32), "frame_id": "b"},
    ]
    out = ds.collate_batch(batch_list)
    assert out["points"].shape == (2, 128, 4)
    assert out["point_mask"].shape == (2, 128)
    assert out["point_mask"][0].sum() == 100
    assert out["point_mask"][1].sum() == 128
    assert out["gt_boxes"].shape == (2, 8, 8)
    assert out["frame_id"] == ["a", "b"]
    assert out["batch_size"] == 2


def test_gt_sampler_collision_logic():
    # boxes_bev_iou_cpu drives the sampler's rejection: overlapping -> rejected
    a = np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], np.float32)
    b_overlap = np.array([[0.5, 0.2, 0, 4, 2, 1.5, 0.4]], np.float32)
    b_clear = np.array([[10, 10, 0, 4, 2, 1.5, 0.4]], np.float32)
    assert boxes_bev_iou_cpu(a, b_overlap)[0, 0] > 0
    assert boxes_bev_iou_cpu(a, b_clear)[0, 0] == 0


def test_processor_masks_range():
    cfg = [EasyDict({"NAME": "mask_points_and_boxes_outside_range",
                     "REMOVE_OUTSIDE_BOXES": True}),
           EasyDict({"NAME": "calculate_grid_size", "VOXEL_SIZE": [0.32, 0.32, 4]})]
    proc = DataProcessor(cfg, point_cloud_range=np.array([0, -40, -3, 70.4, 40, 1]),
                         training=True, num_point_features=4)
    assert proc.grid_size[0] == 220 and proc.grid_size[1] == 250
    pts = np.array([[1, 0, 0, 0.5], [100, 0, 0, 0.5], [5, -50, 0, 0.5]], np.float32)
    out = proc.forward({"points": pts})
    assert len(out["points"]) == 1
