"""ONCE benchmark evaluation protocol.

Numpy + native-C++ re-implementation of the reference evaluator
(pcdet/datasets/once/once_eval/evaluation.py + iou_utils.py +
eval_utils.py): superclass grouping (Car/Bus/Truck -> Vehicle), 50-point
PR sampling with duplicated thresholds, Overall&Distance difficulty
breakdown, and heading-filtered 3D IoU.  The greedy matcher is the same
routine as the KITTI one (utils/native.compute_statistics) — the ONCE
flags (-1 reject / 0 accept / 1 ignore) map directly onto the KITTI
ignored_gt/ignored_det convention.
"""
from __future__ import annotations

import numpy as np

from ....utils import native

iou_threshold_dict = {
    "Car": 0.7, "Bus": 0.7, "Truck": 0.7, "Pedestrian": 0.3, "Cyclist": 0.5,
}
superclass_iou_threshold_dict = {
    "Vehicle": 0.7, "Pedestrian": 0.3, "Cyclist": 0.5,
}


def overall_distance_filter(boxes, level):
    ignore = np.ones(boxes.shape[0], dtype=bool)
    dist = np.sqrt(np.sum(boxes[:, 0:3] ** 2, axis=1))
    if level == 0:
        flag = np.ones(boxes.shape[0], dtype=bool)
    elif level == 1:
        flag = dist < 30
    elif level == 2:
        flag = (dist >= 30) & (dist < 50)
    elif level == 3:
        flag = dist >= 50
    else:
        raise AssertionError(level)
    ignore[flag] = False
    return ignore


def distance_filter(boxes, level):
    return overall_distance_filter(boxes, level + 1)


def overall_filter(boxes):
    return np.zeros(boxes.shape[0], dtype=bool)


def iou3d_with_heading(gt_boxes, pred_boxes, with_heading=True):
    """(N, 7) x (M, 7) lidar boxes -> 3D IoU, zeroed when headings differ
    by more than 90 deg (reference iou3d_kernel_with_heading)."""
    if len(gt_boxes) == 0 or len(pred_boxes) == 0:
        return np.zeros((len(gt_boxes), len(pred_boxes)))
    inter_2d = native.rotate_overlap(
        gt_boxes[:, [0, 1, 3, 4, 6]], pred_boxes[:, [0, 1, 3, 4, 6]], 2)
    gt_max = gt_boxes[:, [2]] + gt_boxes[:, [5]] * 0.5
    gt_min = gt_boxes[:, [2]] - gt_boxes[:, [5]] * 0.5
    pr_max = pred_boxes[:, [2]] + pred_boxes[:, [5]] * 0.5
    pr_min = pred_boxes[:, [2]] - pred_boxes[:, [5]] * 0.5
    inter_h = np.clip(np.minimum(gt_max, pr_max.T) - np.maximum(gt_min, pr_min.T), 0, None)
    inter_3d = inter_2d * inter_h
    gt_vol = (gt_boxes[:, [3]] * gt_boxes[:, [4]] * gt_boxes[:, [5]])
    pr_vol = (pred_boxes[:, [3]] * pred_boxes[:, [4]] * pred_boxes[:, [5]])
    iou = inter_3d / np.clip(gt_vol + pr_vol.T - inter_3d, 1e-9, None)
    if with_heading:
        diff = np.abs(gt_boxes[:, [6]] - pred_boxes[:, [6]].T)
        diff = np.where(diff >= np.pi, 2 * np.pi - diff, diff)
        iou[diff > np.pi / 2] = 0
    return iou


def get_thresholds(scores, num_gt, num_pr_points=50):
    """Reference get_thresholds with recall-gap duplication (:153-174)."""
    eps = 1e-6
    scores = np.sort(scores)[::-1]
    recall_level = 0.0
    thresholds = []
    for i, score in enumerate(scores):
        l_recall = (i + 1) / num_gt
        r_recall = (i + 2) / num_gt if i < len(scores) - 1 else l_recall
        if (r_recall + l_recall < 2 * recall_level) and i < len(scores) - 1:
            continue
        thresholds.append(score)
        recall_level += 1 / num_pr_points
        while r_recall + l_recall + eps > 2 * recall_level:
            thresholds.append(score)
            recall_level += 1 / num_pr_points
    return thresholds


def filter_data(gt_anno, pred_anno, difficulty_mode, difficulty_level,
                class_name, use_superclass):
    num_gt = len(gt_anno["name"])
    gt_flag = np.zeros(num_gt, np.int64)
    num_pred = len(pred_anno["name"])
    pred_flag = np.zeros(num_pred, np.int64)

    def reject_mask(names):
        if use_superclass and class_name == "Vehicle":
            return np.logical_or(names == "Pedestrian", names == "Cyclist")
        return names != class_name

    gt_flag[reject_mask(np.asarray(gt_anno["name"]))] = -1
    pred_flag[reject_mask(np.asarray(pred_anno["name"]))] = -1

    if difficulty_mode == "Overall":
        gt_flag[overall_filter(gt_anno["boxes_3d"])] = 1
        pred_flag[overall_filter(pred_anno["boxes_3d"])] = 1
    elif difficulty_mode == "Distance":
        gt_flag[distance_filter(gt_anno["boxes_3d"], difficulty_level)] = 1
        pred_flag[distance_filter(pred_anno["boxes_3d"], difficulty_level)] = 1
    elif difficulty_mode == "Overall&Distance":
        gt_flag[overall_distance_filter(gt_anno["boxes_3d"], difficulty_level)] = 1
        pred_flag[overall_distance_filter(pred_anno["boxes_3d"], difficulty_level)] = 1
    else:
        raise NotImplementedError(difficulty_mode)
    return gt_flag, pred_flag


def _stats(iou_gt_pred, scores, gt_flag, pred_flag, iou_threshold,
           thresholds=None):
    """Delegate the greedy matching to the shared native kernel.

    native.compute_statistics consumes (dt, gt)-ordered overlaps and the
    KITTI ignored conventions; ONCE flags map 1:1.
    """
    overlaps = np.ascontiguousarray(iou_gt_pred.T)  # (pred, gt)
    num_pred = overlaps.shape[0]
    num_gt = overlaps.shape[1]
    gt_datas = np.zeros((num_gt, 5))
    dt_datas = np.zeros((num_pred, 6))
    dt_datas[:, 5] = scores
    dc = np.zeros((0, 4))
    if thresholds is None:
        return native.compute_statistics(
            overlaps, gt_datas, dt_datas, gt_flag, pred_flag, dc,
            metric=1, min_overlap=iou_threshold, thresholds=None)
    return native.compute_statistics(
        overlaps, gt_datas, dt_datas, gt_flag, pred_flag, dc,
        metric=1, min_overlap=iou_threshold, thresholds=np.asarray(thresholds))


def get_evaluation_results(gt_annos, pred_annos, classes, use_superclass=True,
                           iou_thresholds=None, num_pr_points=50,
                           difficulty_mode="Overall&Distance",
                           ap_with_heading=True, **kwargs):
    if iou_thresholds is None:
        iou_thresholds = (superclass_iou_threshold_dict if use_superclass
                          else iou_threshold_dict)
    assert len(gt_annos) == len(pred_annos)
    if use_superclass:
        if any(c in classes for c in ("Car", "Bus", "Truck")):
            assert all(c in classes for c in ("Car", "Bus", "Truck"))
        classes = [c for c in classes if c not in ("Car", "Bus", "Truck")]
        classes.insert(0, "Vehicle")

    num_samples = len(gt_annos)
    ious = [
        iou3d_with_heading(
            np.asarray(g["boxes_3d"], np.float64).reshape(-1, 7),
            np.asarray(p["boxes_3d"], np.float64).reshape(-1, 7),
            with_heading=ap_with_heading)
        for g, p in zip(gt_annos, pred_annos)
    ]

    if difficulty_mode == "Distance":
        difficulty_types = ["0-30m", "30-50m", "50m-inf"]
    elif difficulty_mode == "Overall":
        difficulty_types = ["overall"]
    else:
        difficulty_types = ["overall", "0-30m", "30-50m", "50m-inf"]
    num_difficulties = len(difficulty_types)
    num_classes = len(classes)

    precision = np.zeros([num_classes, num_difficulties, num_pr_points + 1])
    recall = np.zeros([num_classes, num_difficulties, num_pr_points + 1])

    for cls_idx, cur_class in enumerate(classes):
        iou_threshold = iou_thresholds[cur_class]
        for diff_idx in range(num_difficulties):
            all_scores, gt_flags, pred_flags = [], [], []
            num_valid_gt = 0
            for i in range(num_samples):
                gt_flag, pred_flag = filter_data(
                    gt_annos[i], pred_annos[i], difficulty_mode, diff_idx,
                    cur_class, use_superclass)
                gt_flags.append(gt_flag)
                pred_flags.append(pred_flag)
                num_valid_gt += int(np.sum(gt_flag == 0))
                all_scores.append(_stats(
                    ious[i], np.asarray(pred_annos[i]["score"], np.float64),
                    gt_flag, pred_flag, iou_threshold))
            all_scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
            if num_valid_gt == 0:
                continue
            thresholds = get_thresholds(all_scores, num_valid_gt, num_pr_points)
            if not thresholds:
                continue
            cm = np.zeros([len(thresholds), 4])
            for i in range(num_samples):
                cm += _stats(
                    ious[i], np.asarray(pred_annos[i]["score"], np.float64),
                    gt_flags[i], pred_flags[i], iou_threshold,
                    thresholds=thresholds)
            for t in range(len(thresholds)):
                recall[cls_idx, diff_idx, t] = cm[t, 0] / max(cm[t, 0] + cm[t, 2], 1e-9)
                precision[cls_idx, diff_idx, t] = cm[t, 0] / max(cm[t, 0] + cm[t, 1], 1e-9)
            for t in range(len(thresholds)):
                precision[cls_idx, diff_idx, t] = np.max(precision[cls_idx, diff_idx, t:])
                recall[cls_idx, diff_idx, t] = np.max(recall[cls_idx, diff_idx, t:])

    ap = precision[..., 1:].sum(-1) / num_pr_points * 100

    ret_dict = {}
    ret_str = "\n|AP@%-9s|" % str(num_pr_points)
    for dt in difficulty_types:
        ret_str += "%-12s|" % dt
    ret_str += "\n"
    for cls_idx, cur_class in enumerate(classes):
        ret_str += "|%-12s|" % cur_class
        for diff_idx, dt in enumerate(difficulty_types):
            ret_dict[f"AP_{cur_class}/{dt}"] = ap[cls_idx, diff_idx]
            ret_str += "%-12.2f|" % ap[cls_idx, diff_idx]
        ret_str += "\n"
    mean_ap = ap.mean(axis=0)
    ret_str += "|%-12s|" % "mAP"
    for diff_idx, dt in enumerate(difficulty_types):
        ret_dict[f"AP_mean/{dt}"] = mean_ap[diff_idx]
        ret_str += "%-12.2f|" % mean_ap[diff_idx]
    ret_str += "\n"
    return ret_str, ret_dict
