"""KITTI-format annotation transforms (reference
pcdet/datasets/kitti/kitti_utils.py) — used by Waymo/ONCE 'kitti' eval mode."""
from __future__ import annotations

import numpy as np


def transform_annotations_to_kitti_format(annos, map_name_to_kitti=None,
                                          info_with_fakelidar=False):
    """Lidar-frame annos -> KITTI camera-frame annos with dummy bboxes so
    the official KITTI AP machinery can score them."""
    for anno in annos:
        anno["name"] = np.array(
            [map_name_to_kitti.get(str(n), str(n)) for n in anno["name"]])
        n = len(anno["name"])
        anno["bbox"] = np.zeros((n, 4))
        anno["bbox"][:, 2:4] = 50
        anno["truncated"] = np.zeros(n)
        anno["occluded"] = np.zeros(n)
        boxes = anno["boxes_lidar"] if "boxes_lidar" in anno else anno["gt_boxes_lidar"]
        boxes = np.array(boxes, copy=True)
        if len(boxes) > 0:
            boxes[:, 2] -= boxes[:, 5] / 2
            anno["location"] = np.zeros((len(boxes), 3))
            anno["location"][:, 0] = -boxes[:, 1]  # x_cam = -y_lidar
            anno["location"][:, 1] = -boxes[:, 2]  # y_cam = -z_lidar
            anno["location"][:, 2] = boxes[:, 0]   # z_cam = x_lidar
            anno["dimensions"] = boxes[:, 3:6][:, [0, 2, 1]]  # dxdydz -> lhw
            anno["rotation_y"] = -boxes[:, 6] - np.pi / 2.0
            anno["alpha"] = (-np.arctan2(-boxes[:, 1], boxes[:, 0])
                             + anno["rotation_y"])
        else:
            anno["location"] = anno["dimensions"] = np.zeros((0, 3))
            anno["rotation_y"] = anno["alpha"] = np.zeros(0)
    return annos


def calib_to_matricies(calib):
    V2C = np.vstack((calib.V2C, np.array([0, 0, 0, 1], dtype=np.float32)))
    R0 = np.hstack((calib.R0, np.zeros((3, 1), dtype=np.float32)))
    R0 = np.vstack((R0, np.array([0, 0, 0, 1], dtype=np.float32)))
    return R0 @ V2C, calib.P2
