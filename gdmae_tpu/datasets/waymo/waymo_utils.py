"""Waymo tooling: prediction .bin writer for the external
compute_detection_metrics_main binary (reference
pcdet/datasets/waymo/waymo_utils.py:25-66).  Requires the
waymo-open-dataset protos; falls back to a pickle dump when absent so the
pipeline still produces artifacts in environments without the package.
"""
from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

WAYMO_CLASSES = ["unknown", "Vehicle", "Pedestrian", "Sign", "Cyclist"]


def create_pd_detection(detections, infos, result_path):
    """Write detection_pred.bin (waymo metrics_pb2.Objects)."""
    result_path = Path(result_path)
    result_path.mkdir(parents=True, exist_ok=True)
    try:
        from waymo_open_dataset.protos import metrics_pb2
        from waymo_open_dataset import label_pb2
    except ImportError:
        out = result_path / "detection_pred.pkl"
        with open(out, "wb") as f:
            pickle.dump({"detections": detections,
                         "metadata": [i.get("metadata") for i in infos]}, f)
        print(f"waymo-open-dataset not installed; raw predictions saved to {out}")
        return out

    objects = metrics_pb2.Objects()
    for info, detection in zip(infos, detections):
        names = detection["name"]
        scores = detection["score"]
        boxes_lidar = detection["boxes_lidar"]
        for i in range(boxes_lidar.shape[0]):
            det = boxes_lidar[i]
            o = metrics_pb2.Object()
            o.context_name = info["metadata"]["context_name"]
            o.frame_timestamp_micros = info["metadata"]["timestamp_micros"]
            box = label_pb2.Label.Box()
            box.center_x, box.center_y, box.center_z = det[0], det[1], det[2]
            box.length, box.width, box.height = det[3], det[4], det[5]
            box.heading = det[-1]
            o.object.box.CopyFrom(box)
            o.score = scores[i]
            o.object.type = WAYMO_CLASSES.index(str(names[i]))
            objects.objects.append(o)

    path = result_path / "detection_pred.bin"
    with open(path, "wb") as f:
        f.write(objects.SerializeToString())
    print(f"results saved to {path}")
    return path
