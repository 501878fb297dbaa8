"""Official KITTI 3D-detection evaluation protocol.

Re-implementation of the reference's numba evaluator
(pcdet/datasets/kitti/kitti_object_eval_python/eval.py + rotate_iou.py):
identical protocol — 41-point recall sampling with R11/R40 APs, per-class
difficulty cleaning, DontCare handling, AOS — with the hot loops (rotated
IoU, greedy matching) in the native C++ library (utils/native.py) and pure
numpy orchestration instead of numba.
"""
from __future__ import annotations

import io as sysio

import numpy as np

from ....utils import native


def get_thresholds(scores, num_gt, num_sample_pts=41):
    scores = np.sort(scores)[::-1]
    current_recall = 0.0
    thresholds = []
    for i, score in enumerate(scores):
        l_recall = (i + 1) / num_gt
        r_recall = (i + 2) / num_gt if i < len(scores) - 1 else l_recall
        if ((r_recall - current_recall) < (current_recall - l_recall)) and \
                i < len(scores) - 1:
            continue
        thresholds.append(score)
        current_recall += 1 / (num_sample_pts - 1.0)
    return thresholds


CLASS_NAMES = ["car", "pedestrian", "cyclist", "van", "person_sitting", "truck"]
MIN_HEIGHT = [40, 25, 25]
MAX_OCCLUSION = [0, 1, 2]
MAX_TRUNCATION = [0.15, 0.3, 0.5]


def clean_data(gt_anno, dt_anno, current_class, difficulty):
    dc_bboxes, ignored_gt, ignored_dt = [], [], []
    current_cls_name = CLASS_NAMES[current_class].lower()
    num_gt = len(gt_anno["name"])
    num_dt = len(dt_anno["name"])
    num_valid_gt = 0
    for i in range(num_gt):
        bbox = gt_anno["bbox"][i]
        gt_name = str(gt_anno["name"][i]).lower()
        height = bbox[3] - bbox[1]
        if gt_name == current_cls_name:
            valid_class = 1
        elif current_cls_name == "pedestrian" and gt_name == "person_sitting":
            valid_class = 0
        elif current_cls_name == "car" and gt_name == "van":
            valid_class = 0
        else:
            valid_class = -1
        ignore = (
            gt_anno["occluded"][i] > MAX_OCCLUSION[difficulty]
            or gt_anno["truncated"][i] > MAX_TRUNCATION[difficulty]
            or height <= MIN_HEIGHT[difficulty]
        )
        if valid_class == 1 and not ignore:
            ignored_gt.append(0)
            num_valid_gt += 1
        elif valid_class == 0 or (ignore and valid_class == 1):
            ignored_gt.append(1)
        else:
            ignored_gt.append(-1)
        if str(gt_anno["name"][i]) == "DontCare":
            dc_bboxes.append(gt_anno["bbox"][i])
    for i in range(num_dt):
        valid_class = 1 if str(dt_anno["name"][i]).lower() == current_cls_name else -1
        height = abs(dt_anno["bbox"][i, 3] - dt_anno["bbox"][i, 1])
        if height < MIN_HEIGHT[difficulty]:
            ignored_dt.append(1)
        elif valid_class == 1:
            ignored_dt.append(0)
        else:
            ignored_dt.append(-1)
    return num_valid_gt, ignored_gt, ignored_dt, dc_bboxes


def image_box_overlap(boxes, query_boxes, criterion=-1):
    return native.image_overlap(boxes, query_boxes, criterion)


def bev_box_overlap(boxes, qboxes, criterion=-1):
    """boxes: (N, 5) camera-frame BEV [x, z, l, w, ry]."""
    return native.rotate_overlap(boxes, qboxes, criterion)


def d3_box_overlap(boxes, qboxes, criterion=-1):
    """boxes: (N, 7) camera [x, y, z, l, h, w, ry]."""
    rinc = native.rotate_overlap(
        boxes[:, [0, 2, 3, 5, 6]], qboxes[:, [0, 2, 3, 5, 6]], 2)
    return native.d3_overlap_from_bev(boxes, qboxes, rinc, criterion)


def calculate_iou_per_image(gt_annos, dt_annos, metric):
    """Per-image (dt, gt) overlap matrices (replaces the partitioned
    calculate_iou_partly — partitioning was a numba-era optimization)."""
    overlaps = []
    for gt, dt in zip(gt_annos, dt_annos):
        if metric == 0:
            ov = image_box_overlap(dt["bbox"], gt["bbox"])
        elif metric == 1:
            loc_g = np.concatenate([gt["location"][:, [0, 2]],
                                    gt["dimensions"][:, [0, 2]],
                                    gt["rotation_y"][..., None]], axis=1)
            loc_d = np.concatenate([dt["location"][:, [0, 2]],
                                    dt["dimensions"][:, [0, 2]],
                                    dt["rotation_y"][..., None]], axis=1)
            ov = bev_box_overlap(loc_d, loc_g)
        elif metric == 2:
            b_g = np.concatenate([gt["location"], gt["dimensions"],
                                  gt["rotation_y"][..., None]], axis=1)
            b_d = np.concatenate([dt["location"], dt["dimensions"],
                                  dt["rotation_y"][..., None]], axis=1)
            ov = d3_box_overlap(b_d, b_g)
        else:
            raise ValueError(metric)
        overlaps.append(ov.astype(np.float64))
    return overlaps


def _prepare_data(gt_annos, dt_annos, current_class, difficulty):
    gt_datas_list, dt_datas_list = [], []
    ignored_gts, ignored_dets, dontcares = [], [], []
    total_num_valid_gt = 0
    for i in range(len(gt_annos)):
        num_valid_gt, ignored_gt, ignored_det, dc_bboxes = clean_data(
            gt_annos[i], dt_annos[i], current_class, difficulty)
        ignored_gts.append(np.array(ignored_gt, np.int64))
        ignored_dets.append(np.array(ignored_det, np.int64))
        dontcares.append(
            np.stack(dc_bboxes, 0).astype(np.float64) if dc_bboxes
            else np.zeros((0, 4), np.float64))
        total_num_valid_gt += num_valid_gt
        gt_datas_list.append(np.concatenate(
            [gt_annos[i]["bbox"], gt_annos[i]["alpha"][..., None]], 1))
        dt_datas_list.append(np.concatenate(
            [dt_annos[i]["bbox"], dt_annos[i]["alpha"][..., None],
             dt_annos[i]["score"][..., None]], 1))
    return (gt_datas_list, dt_datas_list, ignored_gts, ignored_dets,
            dontcares, total_num_valid_gt)


def eval_class(gt_annos, dt_annos, current_classes, difficultys, metric,
               min_overlaps, compute_aos=False):
    assert len(gt_annos) == len(dt_annos)
    overlaps = calculate_iou_per_image(gt_annos, dt_annos, metric)
    n_sample = 41
    num_minoverlap = len(min_overlaps)
    shape = [len(current_classes), len(difficultys), num_minoverlap, n_sample]
    precision = np.zeros(shape)
    recall = np.zeros(shape)
    aos = np.zeros(shape)

    for m, current_class in enumerate(current_classes):
        for l, difficulty in enumerate(difficultys):
            (gt_datas_list, dt_datas_list, ignored_gts, ignored_dets,
             dontcares, total_num_valid_gt) = _prepare_data(
                gt_annos, dt_annos, current_class, difficulty)
            for k, min_overlap in enumerate(min_overlaps[:, metric, m]):
                all_scores = []
                for i in range(len(gt_annos)):
                    scores = native.compute_statistics(
                        overlaps[i], gt_datas_list[i], dt_datas_list[i],
                        ignored_gts[i], ignored_dets[i], dontcares[i],
                        metric, min_overlap, thresholds=None)
                    all_scores.append(scores)
                all_scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
                if total_num_valid_gt == 0:
                    continue
                thresholds = np.array(get_thresholds(all_scores, total_num_valid_gt))
                if len(thresholds) == 0:
                    continue
                pr = np.zeros([len(thresholds), 4])
                for i in range(len(gt_annos)):
                    pr += native.compute_statistics(
                        overlaps[i], gt_datas_list[i], dt_datas_list[i],
                        ignored_gts[i], ignored_dets[i], dontcares[i],
                        metric, min_overlap, thresholds=thresholds,
                        compute_aos=compute_aos)
                for i in range(len(thresholds)):
                    recall[m, l, k, i] = pr[i, 0] / max(pr[i, 0] + pr[i, 2], 1e-9)
                    precision[m, l, k, i] = pr[i, 0] / max(pr[i, 0] + pr[i, 1], 1e-9)
                    if compute_aos:
                        aos[m, l, k, i] = pr[i, 3] / max(pr[i, 0] + pr[i, 1], 1e-9)
                for i in range(len(thresholds)):
                    precision[m, l, k, i] = np.max(precision[m, l, k, i:], axis=-1)
                    recall[m, l, k, i] = np.max(recall[m, l, k, i:], axis=-1)
                    if compute_aos:
                        aos[m, l, k, i] = np.max(aos[m, l, k, i:], axis=-1)
    return {"recall": recall, "precision": precision, "orientation": aos}


def get_mAP(prec):
    sums = 0
    for i in range(0, prec.shape[-1], 4):
        sums = sums + prec[..., i]
    return sums / 11 * 100


def get_mAP_R40(prec):
    sums = 0
    for i in range(1, prec.shape[-1]):
        sums = sums + prec[..., i]
    return sums / 40 * 100


def print_str(value, *arg, sstream=None):
    if sstream is None:
        sstream = sysio.StringIO()
    sstream.truncate(0)
    sstream.seek(0)
    print(value, *arg, file=sstream)
    return sstream.getvalue()


def do_eval(gt_annos, dt_annos, current_classes, min_overlaps, compute_aos=False):
    difficultys = [0, 1, 2]
    ret = eval_class(gt_annos, dt_annos, current_classes, difficultys, 0,
                     min_overlaps, compute_aos)
    mAP_bbox = get_mAP(ret["precision"])
    mAP_bbox_R40 = get_mAP_R40(ret["precision"])
    mAP_aos = mAP_aos_R40 = None
    if compute_aos:
        mAP_aos = get_mAP(ret["orientation"])
        mAP_aos_R40 = get_mAP_R40(ret["orientation"])
    ret = eval_class(gt_annos, dt_annos, current_classes, difficultys, 1, min_overlaps)
    mAP_bev = get_mAP(ret["precision"])
    mAP_bev_R40 = get_mAP_R40(ret["precision"])
    ret = eval_class(gt_annos, dt_annos, current_classes, difficultys, 2, min_overlaps)
    mAP_3d = get_mAP(ret["precision"])
    mAP_3d_R40 = get_mAP_R40(ret["precision"])
    return (mAP_bbox, mAP_bev, mAP_3d, mAP_aos, mAP_bbox_R40, mAP_bev_R40,
            mAP_3d_R40, mAP_aos_R40)


def get_official_eval_result(gt_annos, dt_annos, current_classes):
    overlap_0_7 = np.array([
        [0.7, 0.5, 0.5, 0.7, 0.5, 0.7],
        [0.7, 0.5, 0.5, 0.7, 0.5, 0.7],
        [0.7, 0.5, 0.5, 0.7, 0.5, 0.7],
    ])
    overlap_0_5 = np.array([
        [0.7, 0.5, 0.5, 0.7, 0.5, 0.5],
        [0.5, 0.25, 0.25, 0.5, 0.25, 0.5],
        [0.5, 0.25, 0.25, 0.5, 0.25, 0.5],
    ])
    min_overlaps = np.stack([overlap_0_7, overlap_0_5], axis=0)  # [2, 3, 6]
    class_to_name = {0: "Car", 1: "Pedestrian", 2: "Cyclist", 3: "Van",
                     4: "Person_sitting", 5: "Truck"}
    name_to_class = {v: n for n, v in class_to_name.items()}
    if not isinstance(current_classes, (list, tuple)):
        current_classes = [current_classes]
    current_classes = [
        name_to_class[c] if isinstance(c, str) else int(c) for c in current_classes
    ]
    min_overlaps = min_overlaps[:, :, current_classes]

    compute_aos = False
    for anno in dt_annos:
        if anno["alpha"].shape[0] != 0:
            if anno["alpha"][0] != -10:
                compute_aos = True
            break

    (mAPbbox, mAPbev, mAP3d, mAPaos, mAPbbox_R40, mAPbev_R40, mAP3d_R40,
     mAPaos_R40) = do_eval(gt_annos, dt_annos, current_classes, min_overlaps,
                           compute_aos)

    result = ""
    ret_dict = {}
    for j, curcls in enumerate(current_classes):
        for i in range(min_overlaps.shape[0]):
            result += print_str(
                f"{class_to_name[curcls]} "
                "AP@{:.2f}, {:.2f}, {:.2f}:".format(*min_overlaps[i, :, j]))
            result += print_str(
                f"bbox AP:{mAPbbox[j, 0, i]:.4f}, {mAPbbox[j, 1, i]:.4f}, "
                f"{mAPbbox[j, 2, i]:.4f}")
            result += print_str(
                f"bev  AP:{mAPbev[j, 0, i]:.4f}, {mAPbev[j, 1, i]:.4f}, "
                f"{mAPbev[j, 2, i]:.4f}")
            result += print_str(
                f"3d   AP:{mAP3d[j, 0, i]:.4f}, {mAP3d[j, 1, i]:.4f}, "
                f"{mAP3d[j, 2, i]:.4f}")
            if compute_aos:
                result += print_str(
                    f"aos  AP:{mAPaos[j, 0, i]:.2f}, {mAPaos[j, 1, i]:.2f}, "
                    f"{mAPaos[j, 2, i]:.2f}")
            result += print_str(
                f"{class_to_name[curcls]} "
                "AP_R40@{:.2f}, {:.2f}, {:.2f}:".format(*min_overlaps[i, :, j]))
            result += print_str(
                f"bbox AP:{mAPbbox_R40[j, 0, i]:.4f}, {mAPbbox_R40[j, 1, i]:.4f}, "
                f"{mAPbbox_R40[j, 2, i]:.4f}")
            result += print_str(
                f"bev  AP:{mAPbev_R40[j, 0, i]:.4f}, {mAPbev_R40[j, 1, i]:.4f}, "
                f"{mAPbev_R40[j, 2, i]:.4f}")
            result += print_str(
                f"3d   AP:{mAP3d_R40[j, 0, i]:.4f}, {mAP3d_R40[j, 1, i]:.4f}, "
                f"{mAP3d_R40[j, 2, i]:.4f}")
            if compute_aos:
                result += print_str(
                    f"aos  AP:{mAPaos_R40[j, 0, i]:.2f}, {mAPaos_R40[j, 1, i]:.2f}, "
                    f"{mAPaos_R40[j, 2, i]:.2f}")
                if i == 0:
                    name = class_to_name[curcls]
                    ret_dict[f"{name}_aos/easy_R40"] = mAPaos_R40[j, 0, 0]
                    ret_dict[f"{name}_aos/moderate_R40"] = mAPaos_R40[j, 1, 0]
                    ret_dict[f"{name}_aos/hard_R40"] = mAPaos_R40[j, 2, 0]
            if i == 0:
                name = class_to_name[curcls]
                ret_dict[f"{name}_3d/easy_R40"] = mAP3d_R40[j, 0, 0]
                ret_dict[f"{name}_3d/moderate_R40"] = mAP3d_R40[j, 1, 0]
                ret_dict[f"{name}_3d/hard_R40"] = mAP3d_R40[j, 2, 0]
                ret_dict[f"{name}_bev/easy_R40"] = mAPbev_R40[j, 0, 0]
                ret_dict[f"{name}_bev/moderate_R40"] = mAPbev_R40[j, 1, 0]
                ret_dict[f"{name}_bev/hard_R40"] = mAPbev_R40[j, 2, 0]
                ret_dict[f"{name}_image/easy_R40"] = mAPbbox_R40[j, 0, 0]
                ret_dict[f"{name}_image/moderate_R40"] = mAPbbox_R40[j, 1, 0]
                ret_dict[f"{name}_image/hard_R40"] = mAPbbox_R40[j, 2, 0]
    return result, ret_dict
