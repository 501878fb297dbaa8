"""Waymo raw-data extraction: tfrecord sequences -> per-sequence infos pkl
+ per-frame ``NNNN.npy`` point files (reference
pcdet/datasets/waymo/waymo_utils.py:230 ``process_single_sequence`` and
waymo_dataset.py:412-465 ``create_waymo_infos``).

TPU-host-native design: the reference rides TensorFlow for everything
(tf.data.TFRecordDataset, tf range-image utils); this module needs NO
TensorFlow and NO torch —
  * the TFRecord container is parsed directly (``read_tfrecord``: the
    framing is just length/crc/payload records),
  * the zlib-compressed ``MatrixFloat`` range images are decoded by a
    minimal protobuf wire parser (``decode_matrix_float`` — the message is
    two fields: packed floats + a dims submessage),
  * the range-image -> point-cloud geometry (waymo_open_dataset
    range_image_utils.extract_point_cloud_from_range_image) is
    re-implemented in numpy (``range_image_to_points``), including the
    per-pixel top-lidar pose path.

Only ``Frame.ParseFromString`` itself still needs the waymo-open-dataset
package (the Frame proto is huge); its import is guarded exactly like
waymo_eval.py, and every function below it accepts duck-typed frame
objects so the pipeline is unit-testable without the package
(tests/test_waymo_extract.py builds fake frames with hand-encoded
MatrixFloat payloads).
"""
from __future__ import annotations

import os
import pickle
import struct
import zlib
from pathlib import Path

import numpy as np

WAYMO_CLASSES = ["unknown", "Vehicle", "Pedestrian", "Sign", "Cyclist"]
TOP_LIDAR_NAME = 1  # dataset_pb2.LaserName.TOP


# --------------------------------------------------------------------------- #
# TFRecord container (pure python)
# --------------------------------------------------------------------------- #

def read_tfrecord(path):
    """Yield record payloads from a TFRecord file.

    Framing per record: u64-LE length, u32 masked-crc(length), payload,
    u32 masked-crc(payload) — the crcs are not verified (crc32c is not in
    the stdlib; corrupt archives fail at proto parse instead)."""
    with open(path, "rb") as f:
        while True:
            header = f.read(12)
            if len(header) < 12:
                return
            (length,) = struct.unpack("<Q", header[:8])
            payload = f.read(length)
            if len(payload) < length:
                raise EOFError(f"truncated tfrecord payload in {path}")
            f.read(4)  # payload crc
            yield payload


def write_tfrecord(path, payloads):
    """Inverse of :func:`read_tfrecord` (zeroed crcs); used by tests and
    handy for re-packing filtered sequences."""
    with open(path, "wb") as f:
        for payload in payloads:
            f.write(struct.pack("<Q", len(payload)))
            f.write(b"\x00\x00\x00\x00")
            f.write(payload)
            f.write(b"\x00\x00\x00\x00")


# --------------------------------------------------------------------------- #
# Minimal protobuf wire parsing for MatrixFloat / MatrixInt32
# (waymo dataset.proto: data = 1 [packed]; shape = 2 { dims = 1 })
# --------------------------------------------------------------------------- #

def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf):
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:  # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:  # 32-bit
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _decode_shape(buf):
    dims = []
    for field, wire, val in _iter_fields(buf):
        if field == 1:
            if wire == 2:  # packed
                pos = 0
                while pos < len(val):
                    d, pos = _read_varint(val, pos)
                    dims.append(d)
            else:
                dims.append(val)
    return dims


def decode_matrix_float(buf):
    """Parse a serialized MatrixFloat into an ndarray of its shape."""
    data = None
    dims = None
    for field, wire, val in _iter_fields(buf):
        if field == 1:
            if wire == 2:  # packed floats
                data = np.frombuffer(val, dtype="<f4")
            elif wire == 5:  # unpacked single float
                v = np.frombuffer(val, dtype="<f4")
                data = v if data is None else np.concatenate([data, v])
        elif field == 2:
            dims = _decode_shape(val)
    if data is None:
        data = np.zeros(0, np.float32)
    return data.reshape(dims) if dims else data


def encode_matrix_float(arr):
    """Inverse of :func:`decode_matrix_float` (tests / re-packing)."""
    arr = np.asarray(arr, dtype="<f4")
    data = arr.reshape(-1).tobytes()

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            if v:
                out += bytes([b7 | 0x80])
            else:
                return out + bytes([b7])

    shape_payload = b""
    dims_packed = b"".join(varint(d) for d in arr.shape)
    shape_payload += bytes([1 << 3 | 2]) + varint(len(dims_packed)) + dims_packed
    out = bytes([1 << 3 | 2]) + varint(len(data)) + data
    out += bytes([2 << 3 | 2]) + varint(len(shape_payload)) + shape_payload
    return out


# --------------------------------------------------------------------------- #
# Range image -> point cloud (numpy port of waymo range_image_utils)
# --------------------------------------------------------------------------- #

def _rotation_zyx(roll, pitch, yaw):
    """R = Rz(yaw) @ Ry(pitch) @ Rx(roll), vectorized over leading dims
    (waymo transform_utils.get_rotation_matrix)."""
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    r = np.empty(np.shape(roll) + (3, 3), np.float64)
    r[..., 0, 0] = cy * cp
    r[..., 0, 1] = cy * sp * sr - sy * cr
    r[..., 0, 2] = cy * sp * cr + sy * sr
    r[..., 1, 0] = sy * cp
    r[..., 1, 1] = sy * sp * sr + cy * cr
    r[..., 1, 2] = sy * sp * cr - cy * sr
    r[..., 2, 0] = -sp
    r[..., 2, 1] = cp * sr
    r[..., 2, 2] = cp * cr
    return r


def range_image_to_points(range_image, extrinsic, inclinations,
                          pixel_pose=None, frame_pose=None):
    """Convert one [H, W] range channel to vehicle-frame xyz.

    numpy port of range_image_utils.extract_point_cloud_from_range_image:
      * azimuth per column from the extrinsic yaw correction
        (compute_range_image_polar),
      * polar -> sensor-frame cartesian -> vehicle frame via extrinsic,
      * optional per-pixel pose path (top lidar): vehicle-at-pixel-time ->
        world via ``pixel_pose`` [H, W, 6] (roll, pitch, yaw, x, y, z),
        then world -> vehicle-at-frame-time via ``frame_pose``^-1.

    Args:
        range_image: (H, W) float ranges (<=0 = no return).
        extrinsic: (4, 4) sensor-to-vehicle.
        inclinations: (H,) beam inclinations, row-aligned (row 0 = first
            row of the range image, i.e. already reversed like the
            reference's ``tf.reverse(beam_inclinations)``).
        pixel_pose: optional (H, W, 6).
        frame_pose: optional (4, 4) vehicle-to-world at frame time.
    Returns:
        (H, W, 3) xyz in vehicle frame (garbage where range <= 0).
    """
    h, w = range_image.shape
    az_correction = np.arctan2(extrinsic[1, 0], extrinsic[0, 0])
    ratios = (np.arange(w, 0, -1, dtype=np.float64) - 0.5) / w
    azimuth = (ratios * 2.0 - 1.0) * np.pi - az_correction  # (W,)

    cos_az, sin_az = np.cos(azimuth)[None, :], np.sin(azimuth)[None, :]
    cos_in = np.cos(inclinations)[:, None]
    sin_in = np.sin(inclinations)[:, None]
    r = range_image.astype(np.float64)
    x = cos_az * cos_in * r
    y = sin_az * cos_in * r
    z = sin_in * r
    pts = np.stack([x, y, z], axis=-1)  # (H, W, 3) sensor frame

    rot = extrinsic[:3, :3]
    trans = extrinsic[:3, 3]
    pts = pts @ rot.T + trans  # vehicle frame

    if pixel_pose is not None:
        pp_rot = _rotation_zyx(pixel_pose[..., 0], pixel_pose[..., 1],
                               pixel_pose[..., 2])  # (H, W, 3, 3)
        pp_trans = pixel_pose[..., 3:6]
        world = np.einsum("hwij,hwj->hwi", pp_rot, pts) + pp_trans
        fr = np.asarray(frame_pose, np.float64)
        inv_rot = fr[:3, :3].T
        pts = (world - fr[:3, 3]) @ inv_rot.T
    return pts


# --------------------------------------------------------------------------- #
# Frame-level extraction (duck-typed frame objects)
# --------------------------------------------------------------------------- #

def _decompress_mf(buf):
    return decode_matrix_float(zlib.decompress(buf))


def parse_range_images(frame):
    """{laser_name: [return1, return2]} ndarrays + top-lidar pixel pose
    (waymo frame_utils.parse_range_image_and_camera_projection, minus the
    camera projections — the extraction never saves them)."""
    range_images = {}
    top_pose = None
    for laser in frame.lasers:
        returns = []
        for ri in (laser.ri_return1, laser.ri_return2):
            if ri is None or not ri.range_image_compressed:
                continue
            returns.append(_decompress_mf(ri.range_image_compressed))
        if returns:
            range_images[laser.name] = returns
        if laser.name == TOP_LIDAR_NAME and getattr(
                laser.ri_return1, "range_image_pose_compressed", b""):
            top_pose = _decompress_mf(
                laser.ri_return1.range_image_pose_compressed)
    return range_images, top_pose


def _beam_inclinations(calib, height):
    inc = np.asarray(list(calib.beam_inclinations), np.float64)
    if inc.size == 0:  # uniform spacing (range_image_utils.compute_inclination)
        lo, hi = calib.beam_inclination_min, calib.beam_inclination_max
        inc = (0.5 + np.arange(height, dtype=np.float64)) / height * (hi - lo) + lo
    return inc[::-1]  # row 0 = highest beam (reference tf.reverse)


def frame_to_points(frame, use_two_returns=True):
    """All lidars' returns -> (N, 6) [x, y, z, intensity, elongation, NLZ]
    in vehicle frame, plus per-lidar point counts (reference
    waymo_utils.convert_range_image_to_point_cloud + save_lidar_points)."""
    range_images, top_pose = parse_range_images(frame)
    frame_pose = np.array(frame.pose.transform, np.float64).reshape(4, 4)
    calibrations = sorted(frame.context.laser_calibrations,
                          key=lambda c: c.name)
    per_lidar, counts = [], []
    for calib in calibrations:
        returns = range_images.get(calib.name, [])
        if not use_two_returns:
            returns = returns[:1]
        extrinsic = np.array(calib.extrinsic.transform,
                             np.float64).reshape(4, 4)
        lidar_pts = []
        for ri in returns:
            ri = np.asarray(ri)
            rng = ri[..., 0]
            mask = rng > 0
            inclinations = _beam_inclinations(calib, ri.shape[0])
            pp = fp = None
            if calib.name == TOP_LIDAR_NAME and top_pose is not None:
                pp, fp = np.asarray(top_pose, np.float64), frame_pose
            xyz = range_image_to_points(rng, extrinsic, inclinations,
                                        pixel_pose=pp, frame_pose=fp)
            feat = np.concatenate([
                xyz[mask],
                ri[..., 1][mask, None],  # intensity
                ri[..., 2][mask, None],  # elongation
                ri[..., 3][mask, None],  # NLZ flag
            ], axis=-1)
            lidar_pts.append(feat)
        pts = (np.concatenate(lidar_pts, axis=0) if lidar_pts
               else np.zeros((0, 6), np.float64))
        per_lidar.append(pts)
        counts.append(len(pts))
    return (np.concatenate(per_lidar, axis=0).astype(np.float32)
            if per_lidar else np.zeros((0, 6), np.float32)), counts


def generate_labels(frame):
    """laser_labels -> annotations dict (reference
    waymo_utils.generate_labels:70-108; 'unknown' rows dropped)."""
    from ...utils import common_utils

    names, difficulty, dims, locs, headings = [], [], [], [], []
    track_diff, obj_ids, num_pts = [], [], []
    for lab in frame.laser_labels:
        box = lab.box
        names.append(WAYMO_CLASSES[lab.type])
        difficulty.append(lab.detection_difficulty_level)
        track_diff.append(lab.tracking_difficulty_level)
        dims.append([box.length, box.width, box.height])
        locs.append([box.center_x, box.center_y, box.center_z])
        headings.append(box.heading)
        obj_ids.append(lab.id)
        num_pts.append(lab.num_lidar_points_in_box)

    annotations = {
        "name": np.array(names),
        "difficulty": np.array(difficulty, np.int32),
        "dimensions": np.array(dims, np.float64).reshape(-1, 3),
        "location": np.array(locs, np.float64).reshape(-1, 3),
        "heading_angles": np.array(headings, np.float64),
        "obj_ids": np.array(obj_ids),
        "tracking_difficulty": np.array(track_diff, np.int32),
        "num_points_in_gt": np.array(num_pts, np.int32),
    }
    annotations = common_utils.drop_info_with_name(annotations, name="unknown")
    if len(annotations["name"]) > 0:
        gt_boxes_lidar = np.concatenate([
            annotations["location"], annotations["dimensions"],
            annotations["heading_angles"][..., None]], axis=1
        ).astype(np.float32)
    else:
        gt_boxes_lidar = np.zeros((0, 7), np.float32)
    annotations["gt_boxes_lidar"] = gt_boxes_lidar
    for k in ("dimensions", "location", "heading_angles"):
        annotations.pop(k)
    return annotations


def default_frame_parser(payload):
    """bytes -> Frame via the waymo-open-dataset protos (guarded import —
    the only waymo-package dependency in this module)."""
    from waymo_open_dataset import dataset_pb2

    frame = dataset_pb2.Frame()
    frame.ParseFromString(bytearray(payload))
    return frame


def process_single_sequence(sequence_file, save_path, sampled_interval,
                            has_label=True, use_two_returns=True,
                            frame_parser=None):
    """One tfrecord -> ``<seq>/<seq>.pkl`` infos + ``NNNN.npy`` per frame
    (reference waymo_utils.process_single_sequence:230-283; same skip-if-
    processed and sampling semantics, same info schema)."""
    sequence_file = Path(sequence_file)
    save_path = Path(save_path)
    sequence_name = os.path.splitext(sequence_file.name)[0]
    if not sequence_file.exists():
        print(f"NotFoundError: {sequence_file}")
        return []
    cur_save_dir = save_path / sequence_name
    pkl_file = cur_save_dir / f"{sequence_name}.pkl"
    if pkl_file.exists():
        with open(pkl_file, "rb") as f:
            return pickle.load(f)
    cur_save_dir.mkdir(parents=True, exist_ok=True)
    if frame_parser is None:
        frame_parser = default_frame_parser

    sequence_infos = []
    for cnt, payload in enumerate(read_tfrecord(sequence_file)):
        if cnt % sampled_interval != 0:
            continue
        frame = frame_parser(payload)
        info = {
            "point_cloud": {"lidar_sequence": sequence_name,
                            "sample_idx": cnt},
            "metadata": {
                "context_name": frame.context.name,
                "timestamp_micros": frame.timestamp_micros,
            },
            "pose": np.array(frame.pose.transform,
                             np.float32).reshape(4, 4),
        }
        if has_label:
            info["annos"] = generate_labels(frame)
        points, num_points_of_each_lidar = frame_to_points(
            frame, use_two_returns=use_two_returns)
        np.save(cur_save_dir / ("%04d.npy" % cnt), points)
        info["num_points_of_each_lidar"] = num_points_of_each_lidar
        sequence_infos.append(info)

    with open(pkl_file, "wb") as f:
        pickle.dump(sequence_infos, f)
    print(f"Infos are saved to (sampled_interval={sampled_interval}): {pkl_file}")
    return sequence_infos


def create_waymo_infos(dataset_cfg, class_names, data_path, save_path,
                       raw_data_tag="raw_data",
                       processed_data_tag="waymo_processed_data",
                       workers=4, frame_parser=None):
    """Full raw->training-ready pipeline (reference
    waymo_dataset.py:412-465): per-split infos pkls + the train gt
    database for the sampling augmentor."""
    from ...utils import common_utils
    from .waymo_dataset import WaymoDataset

    data_path, save_path = Path(data_path), Path(save_path)
    dataset = WaymoDataset(
        dataset_cfg=dataset_cfg, class_names=class_names,
        root_path=data_path, training=False,
        logger=common_utils.create_logger())
    splits = {"train": True, "val": True, "test": False}
    filenames = {}
    for split, has_label in splits.items():
        dataset.set_split(split)
        infos = dataset.get_infos(
            raw_data_path=data_path / raw_data_tag,
            save_path=save_path / processed_data_tag,
            num_workers=workers, has_label=has_label, sampled_interval=1,
            frame_parser=frame_parser)
        filename = save_path / f"{processed_data_tag}_infos_{split}.pkl"
        with open(filename, "wb") as f:
            pickle.dump(infos, f)
        filenames[split] = filename
        print(f"Waymo info {split} file is saved to {filename}")

    dataset.set_split("train")
    dataset.create_groundtruth_database(
        info_path=filenames["train"], save_path=save_path, split="train",
        sampled_interval=1, processed_data_tag=processed_data_tag)
    print("Data preparation done")
    return filenames


if __name__ == "__main__":
    import argparse

    import yaml

    from ...config import as_easy

    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", required=True,
                        help="dataset config yaml (waymo_dataset.yaml)")
    parser.add_argument("--data_path", required=True)
    parser.add_argument("--save_path", default=None)
    parser.add_argument("--processed_data_tag",
                        default="waymo_processed_data")
    parser.add_argument("--workers", type=int, default=4)
    args = parser.parse_args()

    with open(args.cfg_file) as f:
        dataset_cfg = as_easy(yaml.safe_load(f))
    dataset_cfg.PROCESSED_DATA_TAG = args.processed_data_tag
    create_waymo_infos(
        dataset_cfg=dataset_cfg,
        class_names=["Vehicle", "Pedestrian", "Cyclist"],
        data_path=Path(args.data_path),
        save_path=Path(args.save_path or args.data_path),
        processed_data_tag=args.processed_data_tag,
        workers=args.workers,
    )
