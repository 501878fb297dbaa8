"""Common utilities: logging, seeding, angle helpers, misc.

TPU-native counterpart of reference pcdet/utils/common_utils.py. Functions
that run on device are written against ``jax.numpy``; host-pipeline helpers
take/return numpy. Most small math helpers are namespace-generic and work on
both numpy and jax arrays.
"""
from __future__ import annotations

import logging
import os
import pickle
import random
import shutil

import numpy as np

try:
    import jax
    import jax.numpy as jnp
except ImportError:  # pragma: no cover - jax is a hard dep in practice
    jax = None
    jnp = None


def _xp(*arrays):
    """Pick the array namespace (numpy vs jax.numpy) from the inputs."""
    if jnp is not None:
        for a in arrays:
            if isinstance(a, jnp.ndarray) and not isinstance(a, np.ndarray):
                return jnp
    return np


def limit_period(val, offset=0.5, period=np.pi):
    """Wrap ``val`` into [-offset*period, (1-offset)*period).

    Matches reference common_utils.limit_period (pcdet/utils/common_utils.py).
    """
    xp = _xp(val)
    return val - xp.floor(val / period + offset) * period


def rotate_points_along_z(points, angle):
    """Rotate points around the z axis (counterclockwise).

    Args:
        points: (B, N, 3 + C)
        angle: (B,) radians
    Returns:
        rotated points, same shape/namespace.

    Matches reference common_utils.rotate_points_along_z semantics.
    """
    xp = _xp(points, angle)
    cosa = xp.cos(angle)
    sina = xp.sin(angle)
    zeros = xp.zeros_like(angle)
    ones = xp.ones_like(angle)
    rot = xp.stack([
        xp.stack([cosa, sina, zeros], axis=-1),
        xp.stack([-sina, cosa, zeros], axis=-1),
        xp.stack([zeros, zeros, ones], axis=-1),
    ], axis=-2)  # (B, 3, 3)
    xyz = points[..., 0:3]
    rotated = xp.matmul(xyz, rot)
    return xp.concatenate([rotated, points[..., 3:]], axis=-1)


def angle_difference(a, b):
    """Smallest signed difference a-b wrapped to (-pi, pi]."""
    xp = _xp(a, b)
    d = a - b
    return d - xp.floor(d / (2 * np.pi) + 0.5) * 2 * np.pi


def mask_points_by_range(points, limit_range):
    """Host-side: boolean mask of points inside the xy(z) range.

    Matches reference common_utils.mask_points_by_range (xy only).
    """
    return (
        (points[:, 0] >= limit_range[0]) & (points[:, 0] <= limit_range[3])
        & (points[:, 1] >= limit_range[1]) & (points[:, 1] <= limit_range[4])
    )


def get_voxel_centers(voxel_coords, downsample_times, voxel_size, point_cloud_range, dim=3):
    """Convert integer voxel coords (Z, Y, X order) to metric centers (x, y, z).

    Args:
        voxel_coords: (N, 3) [z_idx, y_idx, x_idx] (or (N, 2) [y, x] with dim=2)
    Matches reference common_utils.get_voxel_centers.
    """
    xp = _xp(voxel_coords)
    coords = voxel_coords[:, ::-1].astype(xp.float32)
    voxel_size = xp.asarray(voxel_size[: coords.shape[-1]], dtype=coords.dtype) * downsample_times
    pc_range = xp.asarray(point_cloud_range[: coords.shape[-1]], dtype=coords.dtype)
    centers = (coords + 0.5) * voxel_size + pc_range
    if dim == 3 and centers.shape[-1] == 2:
        z = xp.zeros_like(centers[:, :1])
        centers = xp.concatenate([centers, z], axis=-1)
    return centers


def keep_arrays_by_name(gt_names, used_classes):
    inds = [i for i, x in enumerate(gt_names) if x in used_classes]
    return np.array(inds, dtype=np.int64)


def drop_info_with_name(info, name):
    ret_info = {}
    keep_indices = [i for i, x in enumerate(info["name"]) if x != name]
    for key in info.keys():
        ret_info[key] = info[key][keep_indices]
    return ret_info


def set_random_seed(seed):
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def create_logger(log_file=None, rank=0, log_level=logging.INFO):
    logger = logging.getLogger(f"gdmae_tpu.rank{rank}")
    logger.setLevel(log_level if rank == 0 else logging.WARNING)
    logger.propagate = False
    if logger.handlers:
        return logger
    formatter = logging.Formatter("%(asctime)s  %(levelname)5s  %(message)s")
    console = logging.StreamHandler()
    console.setLevel(log_level if rank == 0 else logging.WARNING)
    console.setFormatter(formatter)
    logger.addHandler(console)
    if log_file is not None:
        file_handler = logging.FileHandler(log_file)
        file_handler.setLevel(log_level if rank == 0 else logging.WARNING)
        file_handler.setFormatter(formatter)
        logger.addHandler(file_handler)
    return logger


class AverageMeter:
    """Running average tracker (reference common_utils.AverageMeter)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def save_pickle(obj, path):
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_pickle(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def merge_results_dist(result_part, size, tmpdir):
    """Multi-process eval-result merge via the filesystem.

    TPU-native equivalent of reference common_utils.merge_results_dist
    (pcdet/utils/common_utils.py:244-265): each process dumps its partial
    result list, process 0 concatenates in round-robin order and truncates to
    ``size``. Uses jax.process_index()/process_count() instead of torch.dist.
    """
    import jax

    rank = jax.process_index()
    world = jax.process_count()
    os.makedirs(tmpdir, exist_ok=True)
    save_pickle(result_part, os.path.join(tmpdir, f"result_part_{rank}.pkl"))
    # barrier: all processes write, then all read
    if world > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("merge_results_dist_write")
    if rank != 0:
        return None
    part_list = [load_pickle(os.path.join(tmpdir, f"result_part_{i}.pkl")) for i in range(world)]
    # interleave in sampler order (rank-strided), then truncate padding
    ordered_results = []
    max_len = max(len(p) for p in part_list)
    for i in range(max_len):
        for p in part_list:
            if i < len(p):
                ordered_results.append(p[i])
    ordered_results = ordered_results[:size]
    shutil.rmtree(tmpdir, ignore_errors=True)
    return ordered_results


# ---- /dev/shm array cache (reference common_utils.py:309-313 sa_create; the
# SharedArray package is replaced by tmpfs-backed .npy files + mmap reads,
# which gives the same zero-copy multi-worker sharing on TPU hosts) --------- #
SHM_ROOT = "/dev/shm"


def sa_key_to_path(key):
    import os.path as osp

    return osp.join(SHM_ROOT, key.replace("shm://", "") + ".npy")


def sa_create(key, var):
    """Publish a numpy array under /dev/shm; returns a read-only mmap view."""
    import os

    path = sa_key_to_path(key)
    tmp = path[:-4] + ".tmp%d.npy" % os.getpid()
    np.save(tmp, var)
    os.replace(tmp, path)  # atomic vs concurrent workers
    return np.load(path, mmap_mode="r")


def sa_exists(key):
    import os.path as osp

    return osp.exists(sa_key_to_path(key))


def sa_attach(key):
    return np.load(sa_key_to_path(key), mmap_mode="r")


def sa_delete(key):
    import os

    try:
        os.remove(sa_key_to_path(key))
    except FileNotFoundError:
        pass
