import json
import pickle

import numpy as np
import pytest

from gdmae_tpu.config import EasyDict


def _make_once_root(tmp_path):
    seq = "000027"
    seq_path = tmp_path / "data" / seq
    (seq_path / "lidar_roof").mkdir(parents=True)
    (tmp_path / "ImageSets").mkdir()
    (tmp_path / "ImageSets" / "train.txt").write_text(seq + "\n")

    rng = np.random.RandomState(0)
    cam_names = ["cam01", "cam03", "cam05", "cam06", "cam07", "cam08", "cam09"]
    frames = []
    for fid in ["1616100000100", "1616100000200"]:
        pts = rng.uniform(-10, 10, (512, 4)).astype(np.float32)
        # plant a cluster inside the gt box at (2, 3, 0)
        pts[:40, :3] = np.array([2.0, 3.0, 0.0]) + rng.uniform(-0.4, 0.4, (40, 3))
        pts.tofile(seq_path / "lidar_roof" / f"{fid}.bin")
        frames.append({
            "frame_id": fid,
            "pose": [0, 0, 0, 1, 0, 0, 0],
            "annos": {
                "names": ["Car"],
                "boxes_3d": [[2.0, 3.0, 0.0, 4.0, 2.0, 1.6, 0.3]],
                "boxes_2d": {c: [[-1, -1, -1, -1]] for c in cam_names},
            },
        })
    calib = {c: {"cam_to_velo": np.eye(4).tolist(),
                 "cam_intrinsic": np.eye(3).tolist(),
                 "distortion": [0] * 5} for c in cam_names}
    with open(seq_path / f"{seq}.json", "w") as f:
        json.dump({"meta_info": {}, "calib": calib, "frames": frames}, f)
    return tmp_path, seq


def _dataset(root):
    from gdmae_tpu.datasets.once.once_dataset import ONCEDataset

    cfg = EasyDict({
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "INFO_PATH": {"train": ["once_infos_train.pkl"], "val": []},
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity"],
        },
        "POINT_CLOUD_RANGE": [-75.2, -75.2, -5.0, 75.2, 75.2, 3.0],
        "DATA_PROCESSOR": [],
        "DATA_AUGMENTOR": {"DISABLE_AUG_LIST": ["placeholder"],
                           "AUG_CONFIG_LIST": []},
    })
    return ONCEDataset(dataset_cfg=cfg, class_names=["Car"], training=True,
                       root_path=root)


def test_once_get_infos_and_gt_database(tmp_path):
    root, seq = _make_once_root(tmp_path)
    ds = _dataset(root)
    infos = ds.get_infos(num_workers=1, sample_seq_list=[seq])
    assert len(infos) == 2
    info = infos[0]
    assert info["sequence_id"] == seq
    assert info["prev_id"] is None and info["next_id"] == "1616100000200"
    assert info["annos"]["boxes_3d"].shape == (1, 7)
    assert info["annos"]["num_points_in_gt"][0] >= 40

    info_path = root / "once_infos_train.pkl"
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)
    db_path = ds.create_groundtruth_database(info_path=info_path, split="train")
    with open(db_path, "rb") as f:
        db = pickle.load(f)
    assert "Car" in db and len(db["Car"]) == 2
    rec = db["Car"][0]
    assert rec["num_points_in_gt"] >= 40
    clip = np.fromfile(root / rec["path"], np.float32).reshape(-1, 4)
    assert len(clip) == rec["num_points_in_gt"]
    # clip points are box-centered
    assert np.abs(clip[:, :3]).max() < 3.0
