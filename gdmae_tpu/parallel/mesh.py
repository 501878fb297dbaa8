"""Data-parallel mesh runtime.

TPU-native replacement for the reference's DDP/NCCL stack
(tools/train.py:68-70 + pcdet/utils/commu_utils.py): a 1-D ``data`` mesh
over all devices, params/optimizer replicated, the batch sharded along its
leading axis.  Gradient all-reduce is inserted by XLA under jit — there is
no explicit collective code to write, which is the point.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
feed each process its per-host shard; the mesh spans all processes' devices
(DCN rendezvous replaces torch.distributed.launch).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Device-put a host batch dict with the leading axis sharded."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh) if hasattr(x, "ndim") and x.ndim >= 1 else x,
        batch,
    )


def make_parallel_train_step(train_step: Callable, mesh: Mesh,
                             axis_name: str = "data") -> Callable:
    """Wrap a (state, batch, rng) train step with explicit shardings:
    state replicated, batch data-sharded, outputs replicated.  XLA inserts
    the gradient psum across ``axis_name`` automatically."""
    rep = replicated(mesh)
    data = batch_sharding(mesh, axis_name)

    def spec_of(tree, sharding):
        return jax.tree_util.tree_map(lambda _: sharding, tree)

    def wrapped(state, batch, rng):
        return train_step(state, batch, rng)

    return jax.jit(
        wrapped,
        in_shardings=(rep, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


# ------------------------------------------------------------------------- #
# commu_utils-equivalents (reference pcdet/utils/commu_utils.py).  All
# degrade to single-process no-ops when only one process exists, preserving
# the reference's de-facto "fake backend" behavior (commu_utils.py:15-47).
# ------------------------------------------------------------------------- #

def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def all_gather_object(obj):
    """Gather arbitrary picklable objects from every process (reference
    commu_utils.all_gather:50-111).  Single-process: [obj].

    ``process_allgather`` only accepts (pytrees of) same-shape arrays, so —
    like the reference's byte-tensor protocol — the object is pickled to a
    uint8 buffer, padded to the max size across processes (gathered first),
    gathered, and unpickled per process."""
    if get_world_size() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    buf = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray(buf.size, np.int64))  # (world,)
    max_size = int(np.max(sizes))
    padded = np.zeros((max_size,), np.uint8)
    padded[:buf.size] = buf
    gathered = multihost_utils.process_allgather(padded)  # (world, max_size)
    return [pickle.loads(gathered[r, :int(sizes[r])].tobytes())
            for r in range(get_world_size())]


def average_reduce_value(value: float) -> float:
    """Mean of a scalar across processes (reference
    commu_utils.average_reduce_value:143-145)."""
    if get_world_size() == 1:
        return value
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray(value))
    return float(np.mean(arr))
