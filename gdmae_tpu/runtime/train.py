"""Jitted train/eval step builders + TrainState.

TPU-native counterpart of the reference hot loop
(tools/train_utils/train_utils.py:11-86 train_one_epoch): forward, loss,
backward, grad-clip, optimizer step — all fused into one jitted, donated
step.  Gradient synchronization across the data mesh is implicit in pjit
(psum inserted by XLA), replacing DDP's NCCL all-reduce.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
        )


def init_model(model, example_batch, seed: int = 0):
    """Initialize variables for a detector on an example batch.

    The init itself is jitted: eager (op-by-op) init would dispatch
    thousands of tiny programs, which is pathological on remote/tunnelled
    accelerators."""
    rngs = {
        "params": jax.random.PRNGKey(seed),
        "mae_mask": jax.random.PRNGKey(seed + 1),
        "proposal_sampler": jax.random.PRNGKey(seed + 2),
    }

    @jax.jit
    def _init(rngs, batch):
        return model.init(rngs, batch, train=True)

    variables = _init(rngs, example_batch)
    return variables["params"], variables.get("batch_stats", FrozenDict())


def make_train_step(model, donate: bool = True) -> Callable:
    """Build the jitted train step: (state, batch, rng) -> (state, metrics)."""

    def loss_fn(params, batch_stats, batch, rng):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch,
            train=True,
            rngs={"mae_mask": rng,
                  "proposal_sampler": jax.random.fold_in(rng, 1)},
            mutable=["batch_stats"],
        )
        return out["loss"], (mutated["batch_stats"], out.get("tb_dict", {}))

    def train_step(state: TrainState, batch, rng):
        (loss, (new_bs, tb)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng
        )
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **tb}
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_scan_train_step(model, donate: bool = True) -> Callable:
    """Multi-step train loop fused into ONE device program via ``lax.scan``.

    (state, batches, rng) -> (state, stacked_metrics), where every leaf of
    ``batches`` carries a leading micro-step axis K.  One dispatch executes K
    optimizer steps back-to-back on device — essential when the host↔device
    link has high latency (remote accelerators) and useful everywhere to hide
    host dataloader jitter.  The reference's torch loop pays a python+launch
    round-trip per step (tools/train_utils/train_utils.py:19-60); here the
    loop lives in the compiled program.
    """
    def loss_fn(params, batch_stats, batch, rng):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch,
            train=True,
            rngs={"mae_mask": rng,
                  "proposal_sampler": jax.random.fold_in(rng, 1)},
            mutable=["batch_stats"],
        )
        return out["loss"], (mutated["batch_stats"], out.get("tb_dict", {}))

    def one_step(state, batch, rng):
        (loss, (new_bs, tb)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng
        )
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **tb, "grad_norm": optax.global_norm(grads)}
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_bs, opt_state=new_opt), metrics

    def scan_step(state: TrainState, batches, rng):
        def body(carry, xs):
            st, i = carry
            batch = xs
            new_st, metrics = one_step(st, batch, jax.random.fold_in(rng, i))
            return (new_st, i + 1), metrics

        (state, _), metrics = jax.lax.scan(
            body, (state, jnp.int32(0)), batches)
        return state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(scan_step, donate_argnums=donate_argnums)


def make_eval_step(model) -> Callable:
    def eval_step(params, batch_stats, batch):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, batch, train=False
        )

    return jax.jit(eval_step)
