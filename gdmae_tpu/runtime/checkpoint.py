"""Checkpoint save/restore with rotation and shape-tolerant partial load.

TPU-native counterpart of reference tools/train_utils/train_utils.py:123-174
(checkpoint_state/save_checkpoint + max_ckpt_save_num rotation) and
pcdet/models/detectors/detector3d_template.py:361-442 (load_params_from_file
partial restore — the path by which MAE-pretrained encoders flow into
detection fine-tuning).

Format: flax msgpack bytes for params/batch_stats/opt_state + a pickled
meta dict — a single ``checkpoint_epoch_N.pkl`` per save.
"""
from __future__ import annotations

import pickle
import re
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization, traverse_util


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(state, ckpt_dir, epoch: int, it: int = 0,
                    max_ckpt_save_num: int = 30, extra: Optional[Dict] = None):
    """Save and rotate (reference save_checkpoint + rotation :125-137)."""
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    payload = {
        "epoch": epoch,
        "it": it,
        "version": "gdmae_tpu",
        "params": serialization.to_bytes(_to_host(state.params)),
        "batch_stats": serialization.to_bytes(_to_host(state.batch_stats)),
        "opt_state": serialization.to_bytes(_to_host(state.opt_state)),
        "step": int(state.step),
    }
    if extra:
        payload.update(extra)
    path = ckpt_dir / f"checkpoint_epoch_{epoch}.pkl"
    with open(path, "wb") as f:
        pickle.dump(payload, f)

    ckpts = sorted(ckpt_dir.glob("checkpoint_epoch_*.pkl"),
                   key=lambda p: p.stat().st_mtime)
    while len(ckpts) > max_ckpt_save_num:
        ckpts.pop(0).unlink()
    return path


def latest_checkpoint(ckpt_dir) -> Optional[Path]:
    ckpts = sorted(Path(ckpt_dir).glob("checkpoint_epoch_*.pkl"),
                   key=lambda p: p.stat().st_mtime)
    return ckpts[-1] if ckpts else None


def load_checkpoint(path, state):
    """Full resume: params + batch_stats + opt_state + counters."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    params = serialization.from_bytes(_to_host(state.params), payload["params"])
    batch_stats = serialization.from_bytes(
        _to_host(state.batch_stats), payload["batch_stats"])
    opt_state = serialization.from_bytes(
        _to_host(state.opt_state), payload["opt_state"])
    new_state = state.replace(
        params=params, batch_stats=batch_stats, opt_state=opt_state,
        step=jax.numpy.asarray(payload.get("step", 0)),
    )
    return new_state, payload.get("epoch", 0), payload.get("it", 0)


def load_params_partial(path, params, batch_stats, logger=None,
                        rename_map: Optional[Dict[str, str]] = None):
    """Shape-tolerant partial restore (reference load_params_from_file
    :361-411): load every leaf whose (possibly renamed) path exists in the
    target with a matching shape; leave the rest at init.

    ``rename_map``: {target-path-prefix: source-path-prefix}.  The MAE ->
    detection handoff nests the pyramid one level deeper on the pretrain
    side (SPTBackboneMAE holds the SPTBackbone as 'encoder'), so
    tools/train.py passes {"backbone_3d": "backbone_3d/encoder"} and a
    target leaf 'backbone_3d/sst_block_0/...' restores from the
    checkpoint's 'backbone_3d/encoder/sst_block_0/...'.

    (A round-4 regression test, tests/test_two_stage.py::
    test_mae_pretrain_to_detect_handoff, caught the previous fragment
    semantics silently matching NOTHING — the handoff left the whole
    pyramid at random init while only the VFE transferred.)"""
    with open(path, "rb") as f:
        payload = pickle.load(f)

    def restore(target, blob, label):
        src_tree = serialization.msgpack_restore(blob)
        src_flat = traverse_util.flatten_dict(src_tree, sep="/")
        tgt_flat = traverse_util.flatten_dict(
            serialization.to_state_dict(_to_host(target)), sep="/")
        loaded, skipped = 0, []
        for key, val in tgt_flat.items():
            cand_keys = [key]
            if rename_map:
                for tgt_pre, src_pre in rename_map.items():
                    if key == tgt_pre or key.startswith(tgt_pre + "/"):
                        cand_keys.append(src_pre + key[len(tgt_pre):])
            for ck in cand_keys:
                if ck in src_flat and np.shape(src_flat[ck]) == np.shape(val):
                    tgt_flat[key] = np.asarray(src_flat[ck])
                    loaded += 1
                    break
            else:
                skipped.append(key)
        if logger is not None:
            logger.info("%s: restored %d/%d tensors", label, loaded, len(tgt_flat))
            for k in skipped[:20]:
                logger.info("  not found/shape-mismatch: %s", k)
        restored = traverse_util.unflatten_dict(
            {tuple(k.split("/")): v for k, v in tgt_flat.items()})
        return serialization.from_state_dict(target, restored)

    new_params = restore(params, payload["params"], "params")
    new_bs = restore(batch_stats, payload["batch_stats"], "batch_stats")
    return new_params, new_bs
