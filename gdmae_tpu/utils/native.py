"""ctypes loader for the gdmae_native C++ library with lazy build +
numpy fallbacks.

The shared library (native/gdmae_native.cpp) provides the host-side hot
loops the reference implemented in CUDA/numba: rotated box overlap and the
KITTI eval matching statistics.  If no compiler is available the numpy
fallback (utils/rotated_iou_np.py + a slow python matcher) keeps everything
functional.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_REPO = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO / "native" / "gdmae_native.cpp"
_LIB = _REPO / "native" / "libgdmae_native.so"

_lib = None
_tried = False


def _build():
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_LIB),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_LIB))
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int64)
        lib.rotate_overlap.argtypes = [dp, ctypes.c_int64, dp, ctypes.c_int64,
                                       ctypes.c_int, dp]
        lib.d3_overlap_from_bev.argtypes = [dp, ctypes.c_int64, dp,
                                            ctypes.c_int64, dp, ctypes.c_int]
        lib.image_overlap.argtypes = [dp, ctypes.c_int64, dp, ctypes.c_int64,
                                      ctypes.c_int, dp]
        lib.compute_statistics.argtypes = [
            dp, dp, ctypes.c_int64, dp, ctypes.c_int64, ip, ip, dp,
            ctypes.c_int64, ctypes.c_int, ctypes.c_double, dp, ctypes.c_int64,
            ctypes.c_int, dp, dp,
        ]
        lib.compute_statistics.restype = ctypes.c_int64
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def rotate_overlap(boxes, qboxes, criterion=-1):
    """(N, 5) x (K, 5) [cx, cy, dx, dy, angle] rotated overlap.

    criterion: -1 IoU, 0 inter/area_a, 1 inter/area_b, 2 raw area.
    """
    boxes = np.ascontiguousarray(boxes, np.float64)
    qboxes = np.ascontiguousarray(qboxes, np.float64)
    n, k = len(boxes), len(qboxes)
    out = np.zeros((n, k), np.float64)
    if n == 0 or k == 0:
        return out
    lib = get_lib()
    if lib is not None:
        lib.rotate_overlap(_dp(boxes), n, _dp(qboxes), k, criterion, _dp(out))
        return out
    # numpy fallback via the 7-dof helper
    from .rotated_iou_np import boxes_overlap_bev_cpu

    b7 = np.zeros((n, 7))
    q7 = np.zeros((k, 7))
    b7[:, [0, 1, 3, 4, 6]] = boxes
    q7[:, [0, 1, 3, 4, 6]] = qboxes
    inter = boxes_overlap_bev_cpu(b7, q7)
    area_a = (boxes[:, 2] * boxes[:, 3])[:, None]
    area_b = (qboxes[:, 2] * qboxes[:, 3])[None, :]
    if criterion == -1:
        return inter / np.clip(area_a + area_b - inter, 1e-9, None)
    if criterion == 0:
        return inter / np.clip(area_a, 1e-9, None)
    if criterion == 1:
        return inter / np.clip(area_b, 1e-9, None)
    return inter


def d3_overlap_from_bev(boxes, qboxes, rinc, criterion=-1):
    """Finish camera-frame 3D IoU from BEV overlap areas.  boxes (N, 7)."""
    boxes = np.ascontiguousarray(boxes, np.float64)
    qboxes = np.ascontiguousarray(qboxes, np.float64)
    rinc = np.ascontiguousarray(rinc, np.float64)
    n, k = len(boxes), len(qboxes)
    if n == 0 or k == 0:
        return rinc
    lib = get_lib()
    if lib is not None:
        lib.d3_overlap_from_bev(_dp(boxes), n, _dp(qboxes), k, _dp(rinc), criterion)
        return rinc
    # numpy fallback
    iw = (np.minimum(boxes[:, None, 1], qboxes[None, :, 1])
          - np.maximum(boxes[:, None, 1] - boxes[:, None, 4],
                       qboxes[None, :, 1] - qboxes[None, :, 4]))
    area1 = (boxes[:, 3] * boxes[:, 4] * boxes[:, 5])[:, None]
    area2 = (qboxes[:, 3] * qboxes[:, 4] * qboxes[:, 5])[None, :]
    inc = np.where(iw > 0, iw * rinc, 0.0)
    if criterion == -1:
        ua = area1 + area2 - inc
    elif criterion == 0:
        ua = area1
    elif criterion == 1:
        ua = area2
    else:
        ua = inc
    return np.where((rinc > 0) & (iw > 0), inc / np.clip(ua, 1e-9, None), 0.0)


def image_overlap(boxes, qboxes, criterion=-1):
    boxes = np.ascontiguousarray(boxes, np.float64)
    qboxes = np.ascontiguousarray(qboxes, np.float64)
    n, k = len(boxes), len(qboxes)
    out = np.zeros((n, k), np.float64)
    if n == 0 or k == 0:
        return out
    lib = get_lib()
    if lib is not None:
        lib.image_overlap(_dp(boxes), n, _dp(qboxes), k, criterion, _dp(out))
        return out
    lt = np.maximum(boxes[:, None, 0:2], qboxes[None, :, 0:2])
    rb = np.minimum(boxes[:, None, 2:4], qboxes[None, :, 2:4])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = ((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]))[:, None]
    area_b = ((qboxes[:, 2] - qboxes[:, 0]) * (qboxes[:, 3] - qboxes[:, 1]))[None, :]
    if criterion == -1:
        return inter / np.clip(area_a + area_b - inter, 1e-9, None)
    if criterion == 0:
        return inter / np.clip(area_a, 1e-9, None)
    return inter / np.clip(area_b, 1e-9, None)


def compute_statistics(overlaps, gt_datas, dt_datas, ignored_gt, ignored_det,
                       dc_bboxes, metric, min_overlap, thresholds=None,
                       compute_aos=False):
    """KITTI eval matching.  thresholds=None -> first pass, returns matched
    detection scores; else accumulates a (num_thresh, 4) [tp, fp, fn, sim]
    table (see eval.py compute_statistics_jit / fused_compute_statistics)."""
    overlaps = np.ascontiguousarray(overlaps, np.float64)  # (dt, gt)
    gt_datas = np.ascontiguousarray(gt_datas, np.float64).reshape(-1, 5)
    dt_datas = np.ascontiguousarray(dt_datas, np.float64).reshape(-1, 6)
    ignored_gt = np.ascontiguousarray(ignored_gt, np.int64)
    ignored_det = np.ascontiguousarray(ignored_det, np.int64)
    dc_bboxes = np.ascontiguousarray(dc_bboxes, np.float64).reshape(-1, 4)
    gt_size, dt_size = len(gt_datas), len(dt_datas)

    lib = get_lib()
    if thresholds is None:
        if lib is not None:
            out_scores = np.zeros(max(gt_size, 1), np.float64)
            cnt = lib.compute_statistics(
                _dp(overlaps), _dp(gt_datas), gt_size, _dp(dt_datas), dt_size,
                _ip(ignored_gt), _ip(ignored_det), _dp(dc_bboxes), len(dc_bboxes),
                metric, float(min_overlap), _dp(np.zeros(1)), 0, 0,
                _dp(np.zeros(4)), _dp(out_scores))
            return out_scores[:cnt]
        return _py_match_scores(overlaps, dt_datas, ignored_gt, ignored_det,
                                min_overlap)

    thresholds = np.ascontiguousarray(thresholds, np.float64)
    pr = np.zeros((len(thresholds), 4), np.float64)
    if lib is not None:
        lib.compute_statistics(
            _dp(overlaps), _dp(gt_datas), gt_size, _dp(dt_datas), dt_size,
            _ip(ignored_gt), _ip(ignored_det), _dp(dc_bboxes), len(dc_bboxes),
            metric, float(min_overlap), _dp(thresholds), len(thresholds),
            int(compute_aos), _dp(pr), None)
        return pr
    for t, th in enumerate(thresholds):
        pr[t] += _py_stats_one(overlaps, gt_datas, dt_datas, ignored_gt,
                               ignored_det, dc_bboxes, metric, min_overlap,
                               th, compute_aos)
    return pr


# -- slow python fallbacks (used only when g++ is unavailable) ------------ #

def _py_match_scores(overlaps, dt_datas, ignored_gt, ignored_det, min_overlap):
    NO_DET = -1e7
    dt_size, gt_size = len(dt_datas), overlaps.shape[1]
    assigned = np.zeros(dt_size, bool)
    scores = []
    for i in range(gt_size):
        if ignored_gt[i] == -1:
            continue
        det_idx, valid = -1, NO_DET
        for j in range(dt_size):
            if ignored_det[j] == -1 or assigned[j]:
                continue
            if overlaps[j, i] > min_overlap and dt_datas[j, 5] > valid:
                det_idx, valid = j, dt_datas[j, 5]
        if valid == NO_DET:
            continue
        if ignored_gt[i] == 1 or ignored_det[det_idx] == 1:
            assigned[det_idx] = True
        else:
            scores.append(dt_datas[det_idx, 5])
            assigned[det_idx] = True
    return np.asarray(scores)


def _py_stats_one(overlaps, gt_datas, dt_datas, ignored_gt, ignored_det,
                  dc_bboxes, metric, min_overlap, thresh, compute_aos):
    NO_DET = -1e7
    dt_size, gt_size = len(dt_datas), len(gt_datas)
    assigned = np.zeros(dt_size, bool)
    ignored_threshold = dt_datas[:, 5] < thresh
    tp = fp = fn = 0
    delta = []
    for i in range(gt_size):
        if ignored_gt[i] == -1:
            continue
        det_idx, valid, max_ov, asg_ign = -1, NO_DET, 0.0, False
        for j in range(dt_size):
            if ignored_det[j] == -1 or assigned[j] or ignored_threshold[j]:
                continue
            ov = overlaps[j, i]
            if ov > min_overlap and (ov > max_ov or asg_ign) and ignored_det[j] == 0:
                max_ov, det_idx, valid, asg_ign = ov, j, 1, False
            elif ov > min_overlap and valid == NO_DET and ignored_det[j] == 1:
                det_idx, valid, asg_ign = j, 1, True
        if valid == NO_DET and ignored_gt[i] == 0:
            fn += 1
        elif valid != NO_DET and (ignored_gt[i] == 1 or ignored_det[det_idx] == 1):
            assigned[det_idx] = True
        elif valid != NO_DET:
            tp += 1
            if compute_aos:
                delta.append(gt_datas[i, 4] - dt_datas[det_idx, 4])
            assigned[det_idx] = True
    for j in range(dt_size):
        if not (assigned[j] or ignored_det[j] in (-1, 1) or ignored_threshold[j]):
            fp += 1
    nstuff = 0
    if metric == 0 and len(dc_bboxes):
        ov_dc = image_overlap(dt_datas[:, :4], dc_bboxes, 0)
        for i in range(len(dc_bboxes)):
            for j in range(dt_size):
                if assigned[j] or ignored_det[j] in (-1, 1) or ignored_threshold[j]:
                    continue
                if ov_dc[j, i] > min_overlap:
                    assigned[j] = True
                    nstuff += 1
    fp -= nstuff
    sim = 0.0
    if compute_aos:
        if tp > 0 or fp > 0:
            sim = float(np.sum((1.0 + np.cos(delta)) / 2.0)) if delta else 0.0
        else:
            sim = 0.0
    return np.array([tp, fp, fn, sim], np.float64)
