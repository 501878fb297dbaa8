"""nuScenes conversion + submission utilities (reference
pcdet/datasets/nuscenes/nuscenes_utils.py).

The box math (quaternion compose / rotate, lidar->ego->global chaining) is
pure numpy here, so detection results can be exported without the nuscenes
devkit; only info creation (`fill_trainval_infos`) needs the devkit and is
gated on its availability.
"""
from __future__ import annotations

import operator

import numpy as np

map_name_from_general_to_detection = {
    "human.pedestrian.adult": "pedestrian",
    "human.pedestrian.child": "pedestrian",
    "human.pedestrian.wheelchair": "ignore",
    "human.pedestrian.stroller": "ignore",
    "human.pedestrian.personal_mobility": "ignore",
    "human.pedestrian.police_officer": "pedestrian",
    "human.pedestrian.construction_worker": "pedestrian",
    "animal": "ignore",
    "vehicle.car": "car",
    "vehicle.motorcycle": "motorcycle",
    "vehicle.bicycle": "bicycle",
    "vehicle.bus.bendy": "bus",
    "vehicle.bus.rigid": "bus",
    "vehicle.truck": "truck",
    "vehicle.construction": "construction_vehicle",
    "vehicle.emergency.ambulance": "ignore",
    "vehicle.emergency.police": "ignore",
    "vehicle.trailer": "trailer",
    "movable_object.barrier": "barrier",
    "movable_object.trafficcone": "traffic_cone",
    "movable_object.pushable_pullable": "ignore",
    "movable_object.debris": "ignore",
    "static_object.bicycle_rack": "ignore",
}

# most-frequent attribute per class on nuScenes train (reference :43-155);
# used as the fallback attribute for a detection
cls_attr_dist = {
    "barrier": {},
    "bicycle": {"cycle.with_rider": 2791, "cycle.without_rider": 8946},
    "bus": {"vehicle.moving": 9092, "vehicle.parked": 3294,
            "vehicle.stopped": 3881},
    "car": {"vehicle.moving": 114304, "vehicle.parked": 330133,
            "vehicle.stopped": 46898},
    "construction_vehicle": {"vehicle.moving": 882, "vehicle.parked": 11549,
                             "vehicle.stopped": 2102},
    "ignore": {"cycle.with_rider": 307, "cycle.without_rider": 73,
               "vehicle.moving": 165, "vehicle.parked": 400,
               "vehicle.stopped": 102},
    "motorcycle": {"cycle.with_rider": 4233, "cycle.without_rider": 8326},
    "pedestrian": {"pedestrian.moving": 157444,
                   "pedestrian.sitting_lying_down": 13939,
                   "pedestrian.standing": 46530},
    "traffic_cone": {},
    "trailer": {"vehicle.moving": 3421, "vehicle.parked": 19224,
                "vehicle.stopped": 1895},
    "truck": {"vehicle.moving": 21339, "vehicle.parked": 55626,
              "vehicle.stopped": 11097},
}


# ---------------- quaternion helpers (wxyz order, like pyquaternion) ------- #
def quat_from_yaw(yaw):
    return np.array([np.cos(yaw / 2.0), 0.0, 0.0, np.sin(yaw / 2.0)])


def quat_mult(q1, q2):
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def quat_rotate(q, v):
    """Rotate vector(s) v (..., 3) by quaternion q (wxyz)."""
    w, x, y, z = q
    rot = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    return np.asarray(v) @ rot.T


def quaternion_yaw(q):
    """Yaw of a quaternion projected onto the ground plane (reference :234-249)."""
    v = quat_rotate(np.asarray(q, np.float64), np.array([1.0, 0.0, 0.0]))
    return float(np.arctan2(v[1], v[0]))


def quat_rotmat(q):
    """(3, 3) rotation matrix of a wxyz quaternion (replaces
    pyquaternion.Quaternion.rotation_matrix — the devkit stays optional)."""
    w, x, y, z = np.asarray(q, np.float64)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


# ---------------- detection export ---------------------------------------- #
def boxes_lidar_to_nusenes(det_info):
    """(N, 7|9) lidar boxes -> list of dict boxes {center, wlh, quat, velocity,
    score, label} (reference :383-399 builds devkit Box objects; plain dicts
    keep export devkit-free)."""
    boxes3d = det_info["boxes_lidar"]
    scores = det_info["score"]
    labels = det_info["pred_labels"]
    box_list = []
    for k in range(boxes3d.shape[0]):
        vel = (float(boxes3d[k, 7]), float(boxes3d[k, 8]), 0.0) \
            if boxes3d.shape[1] == 9 else (0.0, 0.0, 0.0)
        box_list.append({
            "center": boxes3d[k, :3].astype(np.float64).copy(),
            "wlh": boxes3d[k, [4, 3, 5]].astype(np.float64).copy(),
            "quat": quat_from_yaw(float(boxes3d[k, 6])),
            "velocity": np.array(vel),
            "label": int(labels[k]),
            "score": float(scores[k]),
        })
    return box_list


def _transform_box(box, rotation, translation):
    q = np.asarray(rotation, np.float64)
    box["quat"] = quat_mult(q, box["quat"])
    box["center"] = quat_rotate(q, box["center"]) + np.asarray(translation)
    box["velocity"] = quat_rotate(q, box["velocity"])
    return box


def lidar_nusc_box_to_global(nusc, boxes, sample_token):
    """lidar frame -> ego -> global using the sample's calibrated_sensor and
    ego_pose records (reference :401-420)."""
    s_record = nusc.get("sample", sample_token)
    sd_record = nusc.get("sample_data", s_record["data"]["LIDAR_TOP"])
    cs_record = nusc.get("calibrated_sensor", sd_record["calibrated_sensor_token"])
    pose_record = nusc.get("ego_pose", sd_record["ego_pose_token"])
    out = []
    for box in boxes:
        box = _transform_box(box, cs_record["rotation"], cs_record["translation"])
        box = _transform_box(box, pose_record["rotation"], pose_record["translation"])
        out.append(box)
    return out


def transform_det_annos_to_nusc_annos(det_annos, nusc):
    """Build the nuScenes submission 'results' dict with speed-based attribute
    assignment (reference :423-468)."""
    nusc_annos = {"results": {}, "meta": None}
    for det in det_annos:
        annos = []
        box_list = boxes_lidar_to_nusenes(det)
        box_list = lidar_nusc_box_to_global(
            nusc=nusc, boxes=box_list, sample_token=det["metadata"]["token"])
        for k, box in enumerate(box_list):
            name = det["name"][k]
            speed = float(np.hypot(box["velocity"][0], box["velocity"][1]))
            if speed > 0.2:
                if name in ("car", "construction_vehicle", "bus", "truck", "trailer"):
                    attr = "vehicle.moving"
                elif name in ("bicycle", "motorcycle"):
                    attr = "cycle.with_rider"
                else:
                    attr = None
            else:
                if name == "pedestrian":
                    attr = "pedestrian.standing"
                elif name == "bus":
                    attr = "vehicle.stopped"
                else:
                    attr = None
            if attr is None:
                dist = cls_attr_dist.get(name, {})
                attr = max(dist.items(), key=operator.itemgetter(1))[0] if dist else ""
            annos.append({
                "sample_token": det["metadata"]["token"],
                "translation": box["center"].tolist(),
                "size": box["wlh"].tolist(),
                "rotation": box["quat"].tolist(),
                "velocity": box["velocity"][:2].tolist(),
                "detection_name": name,
                "detection_score": box["score"],
                "attribute_name": attr,
            })
        nusc_annos["results"][det["metadata"]["token"]] = annos
    return nusc_annos


def format_nuscene_results(metrics, class_names, version="default"):
    """Pretty-print official eval metrics dict (reference :471-500)."""
    result = "----------------Nuscene %s results-----------------\n" % version
    for name in class_names:
        threshs = ", ".join(list(metrics["label_aps"][name].keys()))
        ap_list = list(metrics["label_aps"][name].values())
        err_name = ", ".join(
            [x.split("_")[0] for x in metrics["label_tp_errors"][name].keys()])
        error_list = list(metrics["label_tp_errors"][name].values())
        result += f"***{name} error@{err_name} | AP@{threshs}\n"
        result += ", ".join(["%.2f" % x for x in error_list]) + " | "
        result += ", ".join(["%.2f" % (x * 100) for x in ap_list])
        result += f" | mean AP: {metrics['mean_dist_aps'][name]}\n"
    result += "--------------average performance-------------\n"
    details = {}
    for key, val in metrics["tp_errors"].items():
        result += "%s:\t %.4f\n" % (key, val)
        details[key] = val
    result += "mAP:\t %.4f\n" % metrics["mean_ap"]
    result += "NDS:\t %.4f\n" % metrics["nd_score"]
    details.update({"mAP": metrics["mean_ap"], "NDS": metrics["nd_score"]})
    return result, details


# ---------------- info creation (devkit-gated) ----------------------------- #
def get_available_scenes(nusc):
    """Scenes whose lidar files exist on disk (reference :157-182)."""
    from pathlib import Path

    available = []
    for scene in nusc.scene:
        scene_token = scene["token"]
        scene_rec = nusc.get("scene", scene_token)
        sample_rec = nusc.get("sample", scene_rec["first_sample_token"])
        sd_rec = nusc.get("sample_data", sample_rec["data"]["LIDAR_TOP"])
        lidar_path, *_ = nusc.get_sample_data(sd_rec["token"])
        if Path(lidar_path).exists():
            available.append(scene)
    return available


def fill_trainval_infos(data_path, nusc, train_scenes, val_scenes, test=False,
                        max_sweeps=10):
    """Build train/val info dicts with sweep transform chains (reference
    :252-380).  Devkit-free math: quaternions are handled by
    :func:`quat_rotmat`, so only the ``nusc`` table object itself needs the
    nuscenes package (and it is injectable for tests)."""

    def transform_matrix(translation, rotation, inverse=False):
        tm = np.eye(4)
        rot = quat_rotmat(rotation)
        if inverse:
            tm[:3, :3] = rot.T
            tm[:3, 3] = rot.T @ (-np.asarray(translation))
        else:
            tm[:3, :3] = rot
            tm[:3, 3] = np.asarray(translation)
        return tm

    train_infos, val_infos = [], []
    for index, sample in enumerate(nusc.sample):
        ref_sd_token = sample["data"]["LIDAR_TOP"]
        ref_sd = nusc.get("sample_data", ref_sd_token)
        ref_cs = nusc.get("calibrated_sensor", ref_sd["calibrated_sensor_token"])
        ref_pose = nusc.get("ego_pose", ref_sd["ego_pose_token"])
        ref_time = 1e-6 * ref_sd["timestamp"]
        ref_lidar_path, ref_boxes, _ = nusc.get_sample_data(ref_sd_token)

        ref_from_car = transform_matrix(
            ref_cs["translation"], ref_cs["rotation"], inverse=True)
        car_from_global = transform_matrix(
            ref_pose["translation"], ref_pose["rotation"], inverse=True)

        info = {
            "lidar_path": str(ref_lidar_path),
            "token": sample["token"],
            "sweeps": [],
            "ref_from_car": ref_from_car,
            "car_from_global": car_from_global,
            "timestamp": ref_time,
        }

        sd = ref_sd
        while len(info["sweeps"]) < max_sweeps - 1:
            if sd["prev"] == "":
                if len(info["sweeps"]) == 0:
                    info["sweeps"].append({
                        "lidar_path": str(ref_lidar_path),
                        "sample_data_token": sd["token"],
                        "transform_matrix": None,
                        "time_lag": 0.0,
                    })
                else:
                    info["sweeps"].append(info["sweeps"][-1])
                continue
            sd = nusc.get("sample_data", sd["prev"])
            pose = nusc.get("ego_pose", sd["ego_pose_token"])
            gfc = transform_matrix(
                pose["translation"], pose["rotation"], inverse=False)
            cs = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
            cfc = transform_matrix(
                cs["translation"], cs["rotation"], inverse=False)
            tm = ref_from_car @ car_from_global @ gfc @ cfc
            info["sweeps"].append({
                "lidar_path": str(nusc.get_sample_data_path(sd["token"])),
                "sample_data_token": sd["token"],
                "transform_matrix": tm,
                "global_from_car": gfc,
                "car_from_current": cfc,
                "time_lag": ref_time - 1e-6 * sd["timestamp"],
            })

        if not test:
            annotations = [nusc.get("sample_annotation", t) for t in sample["anns"]]
            locs = np.array([b.center for b in ref_boxes]).reshape(-1, 3)
            dims = np.array([b.wlh for b in ref_boxes]).reshape(-1, 3)[:, [1, 0, 2]]
            velocity = np.array(
                [nusc.box_velocity(t)[:2] for t in sample["anns"]]).reshape(-1, 2)
            rots = np.array(
                [quaternion_yaw(b.orientation.elements) for b in ref_boxes]
            ).reshape(-1, 1)
            names = np.array([b.name for b in ref_boxes])
            for i in range(len(names)):
                names[i] = map_name_from_general_to_detection.get(names[i], names[i])
            gt_boxes = np.concatenate([locs, dims, rots, velocity], axis=1)
            info["gt_boxes"] = gt_boxes
            info["gt_boxes_velocity"] = velocity
            info["gt_names"] = names
            info["gt_boxes_token"] = np.array([a["token"] for a in annotations])
            info["num_lidar_pts"] = np.array([a["num_lidar_pts"] for a in annotations])
            info["num_radar_pts"] = np.array([a["num_radar_pts"] for a in annotations])

        scene_token = sample["scene_token"]
        (train_infos if scene_token in train_scenes else val_infos).append(info)
    return train_infos, val_infos
