"""NuScenes raw-data tooling tests on a fake devkit root (no nuscenes /
pyquaternion package needed — the quaternion math is native,
nuscenes_utils.quat_rotmat, and the ``nusc`` table object is injectable).

Covers create_nuscenes_info (scene split -> per-split info pkls with sweep
transform chains) and NuScenesDataset.create_groundtruth_database
(per-object point clips for the gt-sampling augmentor), then loads the
result through the runtime dataset."""
import pickle
from pathlib import Path
from types import SimpleNamespace as NS

import numpy as np

from gdmae_tpu.config import EasyDict
from gdmae_tpu.datasets.nuscenes import nuscenes_utils as nu
from gdmae_tpu.datasets.nuscenes.nuscenes_dataset import (
    NuScenesDataset, create_nuscenes_info,
)

QI = np.array([1.0, 0.0, 0.0, 0.0])  # identity quaternion (wxyz)


class FakeNusc:
    """Duck-typed stand-in for nuscenes.NuScenes: 2 scenes x 2 samples,
    each sample with one prev sweep, identity calibrations."""

    def __init__(self, root):
        self.root = Path(root)
        self.tables = {"scene": {}, "sample": {}, "sample_data": {},
                       "calibrated_sensor": {}, "ego_pose": {},
                       "sample_annotation": {}}
        self.scene = []
        self.sample = []
        rng = np.random.RandomState(0)
        (self.root / "sweeps").mkdir(parents=True, exist_ok=True)

        self.tables["calibrated_sensor"]["cs0"] = {
            "token": "cs0", "translation": [0.0, 0.0, 1.8], "rotation": QI}
        for s_i, s_name in enumerate(["scene-0001", "scene-0002"]):
            sample_tokens = []
            prev_sd = ""
            for f_i in range(2):
                tok = f"samp{s_i}{f_i}"
                sd_tok = f"sd{s_i}{f_i}"
                ep_tok = f"ep{s_i}{f_i}"
                ts = 1_000_000 * (10 * s_i + f_i + 1)
                # lidar file: 200 points, 24 inside the gt box at (5, 2, 0)
                pts = rng.uniform(-20, 20, (200, 5)).astype(np.float32)
                pts[:24, :3] = np.array([5.0, 2.0, 0.0]) + \
                    rng.uniform(-0.5, 0.5, (24, 3))
                rel = f"sweeps/{sd_tok}.bin"
                pts.tofile(self.root / rel)

                self.tables["ego_pose"][ep_tok] = {
                    "token": ep_tok, "translation": [0.0, 0.0, 0.0],
                    "rotation": QI, "timestamp": ts}
                self.tables["sample_data"][sd_tok] = {
                    "token": sd_tok, "sample_token": tok,
                    "calibrated_sensor_token": "cs0",
                    "ego_pose_token": ep_tok, "timestamp": ts,
                    "prev": prev_sd, "filename": rel}
                ann_tok = f"ann{s_i}{f_i}"
                self.tables["sample_annotation"][ann_tok] = {
                    "token": ann_tok, "num_lidar_pts": 24, "num_radar_pts": 0}
                self.tables["sample"][tok] = {
                    "token": tok, "scene_token": f"scn{s_i}",
                    "data": {"LIDAR_TOP": sd_tok}, "anns": [ann_tok]}
                self.sample.append(self.tables["sample"][tok])
                sample_tokens.append(tok)
                prev_sd = sd_tok
            self.tables["scene"][f"scn{s_i}"] = {
                "token": f"scn{s_i}", "name": s_name,
                "first_sample_token": sample_tokens[0]}
            self.scene.append(self.tables["scene"][f"scn{s_i}"])

    def get(self, table, token):
        return self.tables[table][token]

    def get_sample_data(self, sd_token):
        sd = self.tables["sample_data"][sd_token]
        box = NS(center=np.array([5.0, 2.0, 0.0]),
                 wlh=np.array([1.9, 4.5, 1.6]),  # w, l, h
                 orientation=NS(elements=nu.quat_from_yaw(0.3)),
                 name="vehicle.car")
        return str(self.root / sd["filename"]), [box], None

    def get_sample_data_path(self, sd_token):
        return str(self.root / self.tables["sample_data"][sd_token]["filename"])

    def box_velocity(self, ann_token):
        return np.array([1.5, -0.5, 0.0])


def _dataset_cfg():
    return EasyDict({
        "DATASET": "NuScenesDataset",
        "VERSION": "v1.0-mini",
        "MAX_SWEEPS": 2,
        "INFO_PATH": {"train": ["nuscenes_infos_2sweeps_train.pkl"],
                      "test": ["nuscenes_infos_2sweeps_val.pkl"]},
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity", "timestamp"],
            "src_feature_list": ["x", "y", "z", "intensity", "timestamp"],
        },
        "POINT_CLOUD_RANGE": [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
        "DATA_PROCESSOR": [],
        "DATA_AUGMENTOR": {"DISABLE_AUG_LIST": ["placeholder"],
                           "AUG_CONFIG_LIST": []},
    })


def test_create_info_and_gt_database(tmp_path):
    nusc = FakeNusc(tmp_path)
    create_nuscenes_info(
        version="v1.0-mini", data_path=tmp_path, save_path=tmp_path,
        max_sweeps=2, nusc=nusc,
        scene_splits={"v1.0-mini": (["scene-0001"], ["scene-0002"])})

    with open(tmp_path / "nuscenes_infos_2sweeps_train.pkl", "rb") as f:
        train_infos = pickle.load(f)
    with open(tmp_path / "nuscenes_infos_2sweeps_val.pkl", "rb") as f:
        val_infos = pickle.load(f)
    assert len(train_infos) == 2 and len(val_infos) == 2

    info = train_infos[1]  # second frame: has a real prev sweep
    assert info["token"] == "samp01"
    assert len(info["sweeps"]) == 1
    sweep = info["sweeps"][0]
    assert sweep["sample_data_token"] == "sd00"
    # identity poses + identity sensor rotation with a z offset: the chain
    # ref_from_car @ car_from_global @ global_from_car @ car_from_current
    # collapses to identity
    np.testing.assert_allclose(sweep["transform_matrix"], np.eye(4), atol=1e-12)
    assert sweep["time_lag"] > 0
    # gt schema: 9-wide boxes (xyz, lwh[from wlh], yaw, vxy)
    assert info["gt_boxes"].shape == (1, 9)
    np.testing.assert_allclose(info["gt_boxes"][0, :3], [5.0, 2.0, 0.0])
    np.testing.assert_allclose(info["gt_boxes"][0, 3:6], [4.5, 1.9, 1.6])
    np.testing.assert_allclose(info["gt_boxes"][0, 6], 0.3, atol=1e-9)
    np.testing.assert_allclose(info["gt_boxes"][0, 7:], [1.5, -0.5])
    assert list(info["gt_names"]) == ["car"]
    assert info["num_lidar_pts"].tolist() == [24]

    # first frame has no prev: the sweep list is the ref frame repeated
    info0 = train_infos[0]
    assert len(info0["sweeps"]) == 1
    assert info0["sweeps"][0]["transform_matrix"] is None

    # ---- gt database over the created infos ---- #
    ds = NuScenesDataset(
        dataset_cfg=_dataset_cfg(), class_names=["car"], training=False,
        root_path=tmp_path)
    assert len(ds.infos) == 2  # val split (training=False)
    ds.infos = train_infos
    db_path = ds.create_groundtruth_database(max_sweeps=1)
    with open(db_path, "rb") as f:
        db = pickle.load(f)
    assert "car" in db and len(db["car"]) == 2
    rec = db["car"][0]
    assert rec["num_points_in_gt"] >= 24
    clip = np.fromfile(tmp_path / rec["path"], np.float32).reshape(-1, 5)
    assert clip.shape[0] == rec["num_points_in_gt"]
    # clip points are box-centered
    assert np.abs(clip[:, :2]).max() < 3.0

    # runtime dataset consumes the infos end-to-end
    item = ds[0]
    assert "points" in item and item["points"].shape[1] == 5
    assert item["gt_boxes"].shape[1] == 8  # 7 + class (PRED_VELOCITY off)
