"""Open3D scene visualization (reference tools/visual_utils/open3d_vis_utils.py).
Import-gated: open3d is optional in this environment."""
from __future__ import annotations

import numpy as np

box_colormap = [
    [1, 1, 1],
    [0, 1, 0],
    [0, 1, 1],
    [1, 1, 0],
]


def _require_open3d():
    try:
        import open3d
        return open3d
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "open3d is not installed in this environment; install it to use "
            "the interactive visualizer") from e


def get_coor_colors(obj_labels):
    import matplotlib.colors as colors

    labels = np.asarray(obj_labels)
    max_color_num = max(labels.max(), 2)
    hues = labels / (max_color_num + 1) * 0.85
    hsv = np.stack([hues, np.ones_like(hues), np.ones_like(hues)], axis=-1)
    return colors.hsv_to_rgb(hsv)


def translate_boxes_to_open3d_instance(gt_box):
    open3d = _require_open3d()
    center = gt_box[0:3]
    lwh = gt_box[3:6]
    axis_angles = np.array([0, 0, gt_box[6] + 1e-10])
    rot = open3d.geometry.get_rotation_matrix_from_axis_angle(axis_angles)
    box3d = open3d.geometry.OrientedBoundingBox(center, rot, lwh)
    line_set = open3d.geometry.LineSet.create_from_oriented_bounding_box(box3d)
    lines = np.asarray(line_set.lines)
    lines = np.concatenate([lines, np.array([[1, 4], [7, 6]])], axis=0)
    line_set.lines = open3d.utility.Vector2iVector(lines)
    return line_set, box3d


def draw_box(vis, boxes, color=(0, 1, 0), ref_labels=None, scores=None):
    for i in range(boxes.shape[0]):
        line_set, _ = translate_boxes_to_open3d_instance(boxes[i])
        if ref_labels is None:
            line_set.paint_uniform_color(color)
        else:
            line_set.paint_uniform_color(box_colormap[int(ref_labels[i])])
        vis.add_geometry(line_set)
    return vis


def draw_scenes(points, gt_boxes=None, ref_boxes=None, ref_labels=None,
                ref_scores=None, point_colors=None, draw_origin=True):
    open3d = _require_open3d()
    vis = open3d.visualization.Visualizer()
    vis.create_window()
    vis.get_render_option().point_size = 1.0
    vis.get_render_option().background_color = np.zeros(3)

    if draw_origin:
        axis_pcd = open3d.geometry.TriangleMesh.create_coordinate_frame(
            size=1.0, origin=[0, 0, 0])
        vis.add_geometry(axis_pcd)

    pts = open3d.geometry.PointCloud()
    pts.points = open3d.utility.Vector3dVector(np.asarray(points)[:, :3])
    vis.add_geometry(pts)
    if point_colors is None:
        pts.colors = open3d.utility.Vector3dVector(
            np.ones((len(points), 3)))
    else:
        pts.colors = open3d.utility.Vector3dVector(point_colors)

    if gt_boxes is not None:
        vis = draw_box(vis, np.asarray(gt_boxes), (0, 0, 1))
    if ref_boxes is not None:
        vis = draw_box(vis, np.asarray(ref_boxes), (0, 1, 0), ref_labels, ref_scores)
    vis.run()
    vis.destroy_window()
