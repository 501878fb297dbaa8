import numpy as np

from gdmae_tpu.datasets.nuscenes import nuscenes_utils as nu


def test_quaternion_yaw_roundtrip():
    for yaw in [-2.5, -0.3, 0.0, 1.1, 3.0]:
        q = nu.quat_from_yaw(yaw)
        got = nu.quaternion_yaw(q)
        assert abs(np.angle(np.exp(1j * (got - yaw)))) < 1e-6


def test_quat_rotate_matches_rotation_matrix():
    yaw = 0.7
    q = nu.quat_from_yaw(yaw)
    v = np.array([1.0, 2.0, 3.0])
    c, s = np.cos(yaw), np.sin(yaw)
    expect = np.array([c * v[0] - s * v[1], s * v[0] + c * v[1], v[2]])
    np.testing.assert_allclose(nu.quat_rotate(q, v), expect, atol=1e-9)


class _FakeNusc:
    """Identity-pose nusc stub: lidar frame == global frame."""

    def get(self, table, token):
        if table == "sample":
            return {"data": {"LIDAR_TOP": "sd0"}}
        if table == "sample_data":
            return {"calibrated_sensor_token": "cs0", "ego_pose_token": "ep0"}
        ident = {"rotation": [1.0, 0, 0, 0], "translation": [0.0, 0.0, 0.0]}
        if table == "calibrated_sensor":
            cs = dict(ident)
            cs["translation"] = [1.0, 2.0, 0.5]
            return cs
        if table == "ego_pose":
            return ident
        raise KeyError(table)


def test_transform_det_annos_to_nusc_annos():
    det = {
        "boxes_lidar": np.array([[1.0, 2.0, 0.0, 4.0, 1.8, 1.5, 0.3]]),
        "score": np.array([0.9]),
        "pred_labels": np.array([1]),
        "name": np.array(["car"]),
        "metadata": {"token": "tok0"},
    }
    out = nu.transform_det_annos_to_nusc_annos([det], _FakeNusc())
    annos = out["results"]["tok0"]
    assert len(annos) == 1
    a = annos[0]
    # calibrated sensor translation applied
    np.testing.assert_allclose(a["translation"], [2.0, 4.0, 0.5])
    # wlh ordering
    np.testing.assert_allclose(a["size"], [1.8, 4.0, 1.5])
    assert a["detection_name"] == "car"
    # zero velocity -> most-frequent attribute for car = vehicle.parked
    assert a["attribute_name"] == "vehicle.parked"
    assert abs(nu.quaternion_yaw(a["rotation"]) - 0.3) < 1e-6


def test_photo_metric_distortion_runs():
    from gdmae_tpu.config import EasyDict
    from gdmae_tpu.datasets.augmentor.data_augmentor import DataAugmentor

    cfgs = EasyDict({
        "DISABLE_AUG_LIST": [],
        "AUG_CONFIG_LIST": [{
            "NAME": "photo_metric_distortion",
            "BRIGHTNESS_DELTA": 32,
            "CONTRAST_RANGE": [0.5, 1.5],
            "SATURATION_RANGE": [0.5, 1.5],
            "HUE_DELTA": 18,
        }],
    })
    aug = DataAugmentor(root_path=None, augmentor_configs=cfgs, class_names=["Car"])
    np.random.seed(0)
    img = np.random.uniform(0, 255, (8, 8, 3)).astype(np.float32)
    out = aug.data_augmentor_queue[0](
        data_dict={"image": img.copy(), "points": np.zeros((1, 4), np.float32)})
    assert out["image"].shape == (8, 8, 3)
    assert np.isfinite(out["image"]).all()


def test_shm_array_cache(tmp_path, monkeypatch):
    from gdmae_tpu.utils import common_utils

    monkeypatch.setattr(common_utils, "SHM_ROOT", str(tmp_path))
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    view = common_utils.sa_create("shm://seq0___7", arr)
    assert common_utils.sa_exists("seq0___7")
    got = common_utils.sa_attach("seq0___7")
    np.testing.assert_array_equal(np.array(got), arr)
    np.testing.assert_array_equal(np.array(view), arr)
    common_utils.sa_delete("seq0___7")
    assert not common_utils.sa_exists("seq0___7")
