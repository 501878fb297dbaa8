"""Optimizers + LR/momentum schedules (optax).

Reproduces the reference training recipe
(tools/train_utils/optimization/__init__.py + learning_schedules_fastai.py +
fastai_optim.py):

  * ``adam_onecycle``: Adam with betas=(mom_t, 0.99) where mom_t follows the
    fastai OneCycle cosine momentum schedule, decoupled ("true") weight decay
    scaled by lr (OptimWrapper true_wd=True, bn_wd=True — decay applies to
    every parameter), and the two-phase cosine OneCycle LR schedule
    (learning_schedules_fastai.py:60-78).
  * ``adam`` / ``sgd``: plain optimizers with the LambdaLR step-decay
    schedule (+ optional cosine warmup) of build_scheduler (:39-63).

All schedules are jnp-traceable functions of the step counter so the whole
update lives inside one jitted train step.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Tuple

import jax.numpy as jnp
import optax


def annealing_cos(start: float, end: float, pct):
    """Cosine anneal from start to end as pct goes 0 -> 1 (reference
    learning_schedules_fastai.py:54-58)."""
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def one_cycle_lr_fn(total_steps: int, lr_max: float, div_factor: float,
                    pct_start: float) -> Callable:
    a1 = int(total_steps * pct_start)
    low_lr = lr_max / div_factor

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        up = annealing_cos(low_lr, lr_max, step / max(a1, 1))
        down = annealing_cos(lr_max, low_lr / 1e4,
                             (step - a1) / max(total_steps - a1, 1))
        return jnp.where(step < a1, up, down)

    return fn


def one_cycle_mom_fn(total_steps: int, moms: Tuple[float, float],
                     pct_start: float) -> Callable:
    a1 = int(total_steps * pct_start)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        up = annealing_cos(moms[0], moms[1], step / max(a1, 1))
        down = annealing_cos(moms[1], moms[0],
                             (step - a1) / max(total_steps - a1, 1))
        return jnp.where(step < a1, up, down)

    return fn


def step_decay_lr_fn(optim_cfg, total_iters_each_epoch: int) -> Callable:
    """LambdaLR decay-by-epoch-list schedule (reference build_scheduler
    lr_lbmd, optimization/__init__.py:41-47)."""
    lr = float(optim_cfg.LR)
    decay_steps = [int(x * total_iters_each_epoch) for x in optim_cfg.DECAY_STEP_LIST]
    lr_decay = float(optim_cfg.LR_DECAY)
    lr_clip = float(optim_cfg.LR_CLIP)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        decay = jnp.ones(())
        for ds in decay_steps:
            decay = decay * jnp.where(step >= ds, lr_decay, 1.0)
        return lr * jnp.maximum(decay, lr_clip / lr)

    return fn


def build_optimizer(optim_cfg, total_iters_each_epoch: int, total_epochs: int):
    """Returns (optax transform, lr_fn-for-logging)."""
    total_steps = total_iters_each_epoch * total_epochs
    name = optim_cfg.OPTIMIZER
    wd = float(optim_cfg.get("WEIGHT_DECAY", 0.0))
    clip = float(optim_cfg.get("GRAD_NORM_CLIP", 0.0))

    if name == "adam_onecycle":
        lr_fn = one_cycle_lr_fn(
            total_steps, float(optim_cfg.LR), float(optim_cfg.DIV_FACTOR),
            float(optim_cfg.PCT_START))
        mom_fn = one_cycle_mom_fn(
            total_steps, tuple(float(m) for m in optim_cfg.MOMS),
            float(optim_cfg.PCT_START))

        @optax.inject_hyperparams
        def make(b1, learning_rate):
            return optax.chain(
                optax.scale_by_adam(b1=b1, b2=0.99, eps=1e-8),
                optax.add_decayed_weights(wd),
                optax.scale_by_learning_rate(learning_rate),
            )

        tx = make(b1=mom_fn, learning_rate=lr_fn)
    elif name == "adam":
        lr_fn = step_decay_lr_fn(optim_cfg, total_iters_each_epoch)
        tx = optax.chain(
            optax.scale_by_adam(),
            optax.add_decayed_weights(wd),
            optax.scale_by_learning_rate(lr_fn),
        )
    elif name == "sgd":
        lr_fn = step_decay_lr_fn(optim_cfg, total_iters_each_epoch)
        tx = optax.chain(
            optax.trace(decay=float(optim_cfg.MOMENTUM)),
            optax.add_decayed_weights(wd),
            optax.scale_by_learning_rate(lr_fn),
        )
    else:
        raise NotImplementedError(name)

    if clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    if bool(optim_cfg.get("TPU_FLAT_OPT", True)):
        # run the whole chain over ONE raveled vector: the per-parameter
        # form is hundreds of tiny elementwise kernels (~15 ms/step of
        # pure dispatch on the MAE bench); numerics are identical (global
        # norm, adam and weight decay are all elementwise or whole-tree)
        tx = optax.flatten(tx)
    return tx, lr_fn


def build_param_freeze_mask(params, freeze_patterns):
    """Pytree mask for optax.masked: True = trainable, False = frozen.

    Mirrors the reference's FREEZE_LAYERS mechanism
    (detectors/graph_rcnn.py:8-9 + detector3d_template.py:30-36 layer
    freezing): any parameter whose path contains one of the patterns is
    excluded from updates.  (The reference also converts frozen BN to
    FrozenBatchNorm; here frozen modules' running stats keep updating only
    if the train step chooses to — pair this with use_running_average for
    exact parity.)
    """
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(path):
        return "/".join(str(getattr(k, "key", k)) for k in path)

    def mask_fn(path, _):
        p = path_str(path)
        return not any(pat in p for pat in freeze_patterns)

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def apply_freeze(tx, params, freeze_patterns):
    import optax as _optax

    if not freeze_patterns:
        return tx
    mask = build_param_freeze_mask(params, freeze_patterns)
    return _optax.chain(
        _optax.masked(tx, mask),
    )
