"""Waymo raw-data extraction tooling tests (no TF / waymo package needed).

The extraction pipeline (gdmae_tpu/datasets/waymo/waymo_extract.py) is
exercised end-to-end on a FAKE sequence: hand-built tfrecords whose
payloads are pickled duck-typed Frame objects carrying real
zlib-compressed MatrixFloat range images — everything the real path does
except ``Frame.ParseFromString`` itself (guarded on waymo-open-dataset,
like waymo_eval.py).  Geometry is validated by inverting the range-image
projection: points constructed on exact beam directions must be recovered
by the converter, including the per-pixel-pose top-lidar path.
"""
import pickle
import zlib
from types import SimpleNamespace as NS

import numpy as np
import pytest

from gdmae_tpu.datasets.waymo import waymo_extract as wx


# --------------------------------------------------------------------------- #
# container + proto plumbing
# --------------------------------------------------------------------------- #

def test_tfrecord_roundtrip(tmp_path):
    payloads = [b"hello", b"", b"x" * 1000, pickle.dumps({"a": 1})]
    path = tmp_path / "t.tfrecord"
    wx.write_tfrecord(path, payloads)
    assert list(wx.read_tfrecord(path)) == payloads


def test_matrix_float_roundtrip():
    rng = np.random.RandomState(0)
    for shape in [(3,), (4, 5), (2, 3, 4), (64, 2650, 4)]:
        arr = rng.randn(*shape).astype(np.float32)
        out = wx.decode_matrix_float(wx.encode_matrix_float(arr))
        assert out.shape == arr.shape
        np.testing.assert_array_equal(out, arr)


# --------------------------------------------------------------------------- #
# range-image geometry
# --------------------------------------------------------------------------- #

def _grid(h, w, inc_min=-0.3, inc_max=0.2):
    """Beam grid exactly as the converter defines it."""
    inc = (0.5 + np.arange(h)) / h * (inc_max - inc_min) + inc_min
    inc = inc[::-1]  # row 0 = highest beam
    ratios = (np.arange(w, 0, -1) - 0.5) / w
    az = (ratios * 2.0 - 1.0) * np.pi
    return inc, az


def _euler_extrinsic(roll, pitch, yaw, t):
    e = np.eye(4)
    e[:3, :3] = wx._rotation_zyx(roll, pitch, yaw)
    e[:3, 3] = t
    return e


def test_range_image_inversion_identity_extrinsic():
    h, w = 4, 16
    inc, az = _grid(h, w)
    rng = np.random.RandomState(1)
    r = rng.uniform(5.0, 40.0, (h, w))
    pts = wx.range_image_to_points(r, np.eye(4), inc)
    # every recovered point must sit on its beam at its range
    for i in range(h):
        for j in range(w):
            p = pts[i, j]
            assert np.isclose(np.linalg.norm(p), r[i, j])
            assert np.isclose(np.arcsin(p[2] / r[i, j]), inc[i])
            assert np.isclose(np.arctan2(p[1], p[0]), az[j])


def test_range_image_inversion_with_extrinsic():
    """Points planted on exact beam directions in the SENSOR frame and
    pushed through a non-trivial extrinsic must be recovered in the
    vehicle frame (az correction uses only the extrinsic yaw, so use a
    yaw+translation extrinsic, as real Waymo lidar mounts are)."""
    h, w = 3, 12
    inc, az = _grid(h, w, -0.4, 0.1)
    extr = _euler_extrinsic(0.0, 0.0, 0.7, [1.5, -0.3, 2.1])
    az_corr = np.arctan2(extr[1, 0], extr[0, 0])
    assert np.isclose(az_corr, 0.7)
    rng = np.random.RandomState(2)
    r = rng.uniform(5.0, 30.0, (h, w))
    # sensor-frame beam direction for pixel (i, j): azimuth az[j] - az_corr
    expect = np.zeros((h, w, 3))
    for i in range(h):
        for j in range(w):
            a = az[j] - az_corr
            p = r[i, j] * np.array([
                np.cos(a) * np.cos(inc[i]),
                np.sin(a) * np.cos(inc[i]),
                np.sin(inc[i])])
            expect[i, j] = extr[:3, :3] @ p + extr[:3, 3]
    got = wx.range_image_to_points(r, extr, inc)
    np.testing.assert_allclose(got, expect, atol=1e-9)


def test_pixel_pose_identity_matches_no_pose():
    h, w = 4, 10
    inc, _ = _grid(h, w)
    r = np.random.RandomState(3).uniform(3, 20, (h, w))
    extr = _euler_extrinsic(0.1, -0.05, 0.3, [0.5, 0.1, 1.9])
    base = wx.range_image_to_points(r, extr, inc)
    pose = np.zeros((h, w, 6))  # identity per-pixel pose, identity frame
    with_pose = wx.range_image_to_points(
        r, extr, inc, pixel_pose=pose, frame_pose=np.eye(4))
    np.testing.assert_allclose(with_pose, base, atol=1e-9)


def test_pixel_pose_rigid_motion():
    """Uniform per-pixel pose T and frame pose F: output must equal
    F^-1 @ T @ (vehicle-frame points)."""
    h, w = 3, 8
    inc, _ = _grid(h, w)
    r = np.random.RandomState(4).uniform(3, 20, (h, w))
    extr = np.eye(4)
    base = wx.range_image_to_points(r, extr, inc)

    roll, pitch, yaw, t = 0.02, -0.03, 1.1, np.array([10.0, -5.0, 0.2])
    T = _euler_extrinsic(roll, pitch, yaw, t)
    F = _euler_extrinsic(0.0, 0.01, 1.0, [9.0, -4.0, 0.1])
    pose = np.zeros((h, w, 6))
    pose[..., 0], pose[..., 1], pose[..., 2] = roll, pitch, yaw
    pose[..., 3:] = t
    got = wx.range_image_to_points(
        r, extr, inc, pixel_pose=pose, frame_pose=F)
    hom = np.concatenate([base, np.ones((h, w, 1))], axis=-1)
    expect = np.einsum("ij,hwj->hwi", np.linalg.inv(F) @ T, hom)[..., :3]
    np.testing.assert_allclose(got, expect, atol=1e-8)


# --------------------------------------------------------------------------- #
# fake-sequence end-to-end
# --------------------------------------------------------------------------- #

H, W = 4, 32


def _fake_range_image(rng, n_returns):
    """(H, W, 4) [range, intensity, elongation, NLZ]; ~half the pixels
    carry returns."""
    ri = np.zeros((H, W, 4), np.float32)
    mask = rng.rand(H, W) < 0.5
    ri[..., 0] = np.where(mask, rng.uniform(4, 60, (H, W)), 0.0)
    ri[..., 1] = rng.uniform(0, 1, (H, W))
    ri[..., 2] = rng.uniform(0, 1, (H, W))
    ri[..., 3] = np.where(rng.rand(H, W) < 0.2, 1.0, -1.0)
    return ri


def _fake_label(i, type_idx, loc):
    return NS(box=NS(center_x=loc[0], center_y=loc[1], center_z=loc[2],
                     length=4.0, width=1.8, height=1.6, heading=0.3 * i),
              type=type_idx, detection_difficulty_level=1,
              tracking_difficulty_level=2, id=f"obj{i}",
              num_lidar_points_in_box=10 + i)


def _fake_frame(rng, idx, with_second_return=True):
    ri1 = _fake_range_image(rng, 1)
    ri2 = _fake_range_image(rng, 2)
    comp = lambda a: zlib.compress(wx.encode_matrix_float(a))
    ret2 = (NS(range_image_compressed=comp(ri2))
            if with_second_return else NS(range_image_compressed=b""))
    laser = NS(name=wx.TOP_LIDAR_NAME,
               ri_return1=NS(range_image_compressed=comp(ri1),
                             range_image_pose_compressed=b""),
               ri_return2=ret2)
    calib = NS(name=wx.TOP_LIDAR_NAME, beam_inclinations=[],
               beam_inclination_min=-0.3, beam_inclination_max=0.2,
               extrinsic=NS(transform=list(np.eye(4).flatten())))
    labels = [
        _fake_label(0, 1, [5.0, 1.0, 0.5]),    # Vehicle
        _fake_label(1, 2, [-3.0, 4.0, 0.2]),   # Pedestrian
        _fake_label(2, 0, [9.0, -2.0, 0.0]),   # unknown -> dropped
    ]
    n1 = int((ri1[..., 0] > 0).sum())
    n2 = int((ri2[..., 0] > 0).sum()) if with_second_return else 0
    frame = NS(lasers=[laser],
               context=NS(name="fake_context", laser_calibrations=[calib]),
               pose=NS(transform=list(np.eye(4).flatten())),
               timestamp_micros=1_000_000 + idx,
               laser_labels=labels)
    return frame, n1 + n2


def _make_sequence(tmp_path, n_frames=4):
    tmp_path.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(7)
    frames, counts = [], []
    for i in range(n_frames):
        f, n = _fake_frame(rng, i)
        frames.append(f)
        counts.append(n)
    seq = tmp_path / "segment-777_with_camera_labels.tfrecord"
    wx.write_tfrecord(seq, [pickle.dumps(f) for f in frames])
    return seq, counts


def test_process_single_sequence(tmp_path):
    seq, counts = _make_sequence(tmp_path)
    save = tmp_path / "processed"
    infos = wx.process_single_sequence(
        seq, save, sampled_interval=1, has_label=True,
        frame_parser=pickle.loads)
    name = "segment-777_with_camera_labels"
    assert len(infos) == 4
    for i, info in enumerate(infos):
        assert info["point_cloud"] == {"lidar_sequence": name,
                                       "sample_idx": i}
        assert info["metadata"]["context_name"] == "fake_context"
        assert info["metadata"]["timestamp_micros"] == 1_000_000 + i
        assert info["pose"].shape == (4, 4)
        annos = info["annos"]
        # 'unknown' dropped; schema matches the runtime WaymoDataset
        assert list(annos["name"]) == ["Vehicle", "Pedestrian"]
        assert annos["gt_boxes_lidar"].shape == (2, 7)
        assert annos["num_points_in_gt"].tolist() == [10, 11]
        pts = np.load(save / name / ("%04d.npy" % i))
        assert pts.shape == (counts[i], 6)
        assert pts.dtype == np.float32
        assert np.isfinite(pts).all()
        assert set(np.unique(pts[:, 5])) <= {-1.0, 1.0}  # NLZ passthrough
        assert info["num_points_of_each_lidar"] == [counts[i]]

    # sampled_interval: only every 2nd frame (fresh save dir — the pkl
    # skip-if-processed otherwise returns the cached run)
    infos2 = wx.process_single_sequence(
        seq, tmp_path / "p2", sampled_interval=2, has_label=False,
        frame_parser=pickle.loads)
    assert [i["point_cloud"]["sample_idx"] for i in infos2] == [0, 2]
    assert all("annos" not in i for i in infos2)

    # skip-if-processed: second call loads the pkl (no parser needed)
    again = wx.process_single_sequence(
        seq, save, sampled_interval=1, frame_parser=None)
    assert len(again) == 4


def test_dataset_get_infos_and_gt_db(tmp_path):
    """WaymoDataset.get_infos over a fake root, then the (pre-existing)
    gt-database creation consumes the extracted infos — the full raw ->
    training-ready chain a real-user run needs."""
    from gdmae_tpu.config import EasyDict
    from gdmae_tpu.datasets.waymo.waymo_dataset import WaymoDataset

    seq, counts = _make_sequence(tmp_path / "raw_data")
    (tmp_path / "ImageSets").mkdir()
    (tmp_path / "ImageSets" / "train.txt").write_text(seq.name + "\n")
    (tmp_path / "ImageSets" / "val.txt").write_text(seq.name + "\n")
    cfg = EasyDict({
        "DATASET": "WaymoDataset",
        "PROCESSED_DATA_TAG": "waymo_processed_data",
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "SAMPLED_INTERVAL": {"train": 1, "test": 1},
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity"],
        },
        "POINT_CLOUD_RANGE": [-75.2, -75.2, -2, 75.2, 75.2, 4.0],
        "DATA_PROCESSOR": [],
        "DATA_AUGMENTOR": {"DISABLE_AUG_LIST": ["placeholder"],
                           "AUG_CONFIG_LIST": []},
    })
    ds = WaymoDataset(dataset_cfg=cfg, class_names=["Vehicle", "Pedestrian",
                                                    "Cyclist"],
                      training=False, root_path=tmp_path)
    ds.set_split("train")
    infos = ds.get_infos(
        raw_data_path=tmp_path / "raw_data",
        save_path=tmp_path / "waymo_processed_data",
        num_workers=1, has_label=True, sampled_interval=1,
        frame_parser=pickle.loads)
    assert len(infos) == 4

    info_path = tmp_path / "waymo_processed_data_infos_train.pkl"
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)
    db_path = ds.create_groundtruth_database(
        info_path=info_path, save_path=tmp_path, split="train",
        sampled_interval=1)
    with open(db_path, "rb") as f:
        db = pickle.load(f)
    assert set(db) <= {"Vehicle", "Pedestrian"}
    assert sum(len(v) for v in db.values()) > 0

    # the runtime dataset must pick the extraction up directly
    ds2 = WaymoDataset(dataset_cfg=cfg, class_names=["Vehicle"],
                       training=False, root_path=tmp_path)
    assert len(ds2.infos) == 4
    item = ds2[0]
    assert "points" in item
