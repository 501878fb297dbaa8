"""Distributed communication helpers (reference pcdet/utils/commu_utils.py).

API-compatible facade over the mesh runtime: every helper degrades to a
single-process no-op when only one process exists — the same de-facto
"fake backend" behavior the reference has when torch.distributed is
uninitialized (commu_utils.py:15-47).  Device-side reductions belong inside
the jitted step (XLA psum); these helpers are for host-side coordination
(metric averaging, eval-result merging).
"""
from __future__ import annotations

import numpy as np

from ..parallel.mesh import (  # noqa: F401  (re-exported API)
    all_gather_object,
    average_reduce_value,
    get_rank,
    get_world_size,
    is_main_process,
)


def all_gather(data):
    """Gather arbitrary picklable objects from all processes (reference
    :50-111)."""
    return all_gather_object(data)


def reduce_dict(input_dict, average=True):
    """Mean/sum-reduce a dict of scalars across processes (reference
    :114-140)."""
    world = get_world_size()
    if world == 1:
        return dict(input_dict)
    keys = sorted(input_dict.keys())
    vals = np.array([float(input_dict[k]) for k in keys])
    gathered = np.stack(all_gather_object(vals))
    red = gathered.mean(0) if average else gathered.sum(0)
    return {k: red[i] for i, k in enumerate(keys)}


def concat_all_gather(array):
    """Concatenate a per-process array across processes (reference
    :171-182)."""
    if get_world_size() == 1:
        return np.asarray(array)
    return np.concatenate(all_gather_object(np.asarray(array)), axis=0)
