"""Mayavi scene visualization (reference tools/visual_utils/visualize_utils.py).
Import-gated: mayavi is optional in this environment."""
from __future__ import annotations

import numpy as np

box_colormap = [
    [1, 1, 1],
    [0, 1, 0],
    [0, 1, 1],
    [1, 1, 0],
]


def _require_mlab():
    try:
        import mayavi.mlab as mlab
        return mlab
    except ImportError as e:  # pragma: no cover
        raise ImportError("mayavi is not installed in this environment") from e


def check_numpy_to_torch(x):
    return np.asarray(x), False


def boxes_to_corners_3d(boxes3d):
    from gdmae_tpu.utils.box_utils import boxes_to_corners_3d as _b2c

    return _b2c(np.asarray(boxes3d))


def visualize_pts(pts, fig=None, bgcolor=(0, 0, 0), fgcolor=(1.0, 1.0, 1.0),
                  show_intensity=False, size=(600, 600), draw_origin=True):
    mlab = _require_mlab()
    pts = np.asarray(pts)
    if fig is None:
        fig = mlab.figure(figure=None, bgcolor=bgcolor, fgcolor=fgcolor,
                          engine=None, size=size)
    if show_intensity:
        mlab.points3d(pts[:, 0], pts[:, 1], pts[:, 2], pts[:, 3],
                      mode="point", colormap="gnuplot", scale_factor=1, figure=fig)
    else:
        mlab.points3d(pts[:, 0], pts[:, 1], pts[:, 2], mode="point",
                      colormap="gnuplot", scale_factor=1, figure=fig)
    if draw_origin:
        mlab.points3d(0, 0, 0, color=(1, 1, 1), mode="cube", scale_factor=0.2)
        mlab.plot3d([0, 3], [0, 0], [0, 0], color=(0, 0, 1), tube_radius=0.1)
        mlab.plot3d([0, 0], [0, 3], [0, 0], color=(0, 1, 0), tube_radius=0.1)
        mlab.plot3d([0, 0], [0, 0], [0, 3], color=(1, 0, 0), tube_radius=0.1)
    return fig


def draw_corners3d(corners3d, fig, color=(1, 1, 1), line_width=2, cls=None,
                   tag="", max_num=500, tube_radius=None):
    mlab = _require_mlab()
    num = min(max_num, len(corners3d))
    for n in range(num):
        b = corners3d[n]
        if cls is not None:
            mlab.text3d(b[6, 0], b[6, 1], b[6, 2], "%s" % cls[n],
                        scale=(0.3, 0.3, 0.3), color=color, figure=fig)
        for k in range(0, 4):
            i, j = k, (k + 1) % 4
            mlab.plot3d([b[i, 0], b[j, 0]], [b[i, 1], b[j, 1]],
                        [b[i, 2], b[j, 2]], color=color,
                        tube_radius=tube_radius, line_width=line_width, figure=fig)
            i, j = k + 4, (k + 1) % 4 + 4
            mlab.plot3d([b[i, 0], b[j, 0]], [b[i, 1], b[j, 1]],
                        [b[i, 2], b[j, 2]], color=color,
                        tube_radius=tube_radius, line_width=line_width, figure=fig)
            i, j = k, k + 4
            mlab.plot3d([b[i, 0], b[j, 0]], [b[i, 1], b[j, 1]],
                        [b[i, 2], b[j, 2]], color=color,
                        tube_radius=tube_radius, line_width=line_width, figure=fig)
    return fig


def draw_scenes(points, gt_boxes=None, ref_boxes=None, ref_scores=None,
                ref_labels=None):
    mlab = _require_mlab()
    fig = visualize_pts(points)
    if gt_boxes is not None:
        corners3d = boxes_to_corners_3d(gt_boxes)
        fig = draw_corners3d(corners3d, fig=fig, color=(0, 0, 1))
    if ref_boxes is not None and len(ref_boxes) > 0:
        ref_corners3d = boxes_to_corners_3d(ref_boxes)
        if ref_labels is None:
            fig = draw_corners3d(ref_corners3d, fig=fig, color=(0, 1, 0),
                                 cls=ref_scores)
        else:
            for k in range(ref_labels.min(), ref_labels.max() + 1):
                cur_color = tuple(box_colormap[k % len(box_colormap)])
                mask = ref_labels == k
                fig = draw_corners3d(
                    ref_corners3d[mask], fig=fig, color=cur_color,
                    cls=ref_scores[mask] if ref_scores is not None else None)
    mlab.view(azimuth=-179, elevation=54.0, distance=104.0,
              roll=90.0)
    return fig
