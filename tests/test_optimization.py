"""Optimizer/schedule parity tests vs the reference fastai formulas."""
import numpy as np
import jax.numpy as jnp

from gdmae_tpu.config import EasyDict
from gdmae_tpu.runtime import optimization as opt


def ref_annealing_cos(start, end, pct):
    return end + (start - end) / 2.0 * (np.cos(np.pi * pct) + 1)


def ref_one_cycle(total_steps, lr_max, moms, div_factor, pct_start):
    """Direct transcription of the reference OneCycle phase logic
    (learning_schedules_fastai.py:60-78 + LRSchedulerStep.step)."""
    a1 = int(total_steps * pct_start)
    low_lr = lr_max / div_factor
    lrs, ms = [], []
    for step in range(total_steps):
        if step < a1:
            lr = ref_annealing_cos(low_lr, lr_max, step / a1)
            m = ref_annealing_cos(moms[0], moms[1], step / a1)
        else:
            lr = ref_annealing_cos(lr_max, low_lr / 1e4, (step - a1) / (total_steps - a1))
            m = ref_annealing_cos(moms[1], moms[0], (step - a1) / (total_steps - a1))
        lrs.append(lr)
        ms.append(m)
    return np.array(lrs), np.array(ms)


def test_one_cycle_matches_reference():
    total, lr_max, moms, div, pct = 1000, 3e-3, (0.95, 0.85), 10.0, 0.4
    lr_fn = opt.one_cycle_lr_fn(total, lr_max, div, pct)
    mom_fn = opt.one_cycle_mom_fn(total, moms, pct)
    ref_lr, ref_mom = ref_one_cycle(total, lr_max, moms, div, pct)
    steps = np.arange(total)
    got_lr = np.array([float(lr_fn(s)) for s in steps[::37]])
    got_mom = np.array([float(mom_fn(s)) for s in steps[::37]])
    np.testing.assert_allclose(got_lr, ref_lr[::37], rtol=1e-4)  # f32 cos
    np.testing.assert_allclose(got_mom, ref_mom[::37], rtol=1e-4)
    # peak lr at pct_start
    assert abs(float(lr_fn(400)) - lr_max) < 1e-5


def test_step_decay_schedule():
    cfg = EasyDict({"LR": 0.01, "DECAY_STEP_LIST": [2, 4], "LR_DECAY": 0.1,
                    "LR_CLIP": 1e-7})
    fn = opt.step_decay_lr_fn(cfg, total_iters_each_epoch=10)
    assert abs(float(fn(5)) - 0.01) < 1e-9
    assert abs(float(fn(25)) - 0.001) < 1e-9
    assert abs(float(fn(45)) - 0.0001) < 1e-9


def test_adam_onecycle_updates_params():
    import optax

    cfg = EasyDict({
        "OPTIMIZER": "adam_onecycle", "LR": 0.003, "WEIGHT_DECAY": 0.01,
        "MOMENTUM": 0.9, "MOMS": [0.95, 0.85], "PCT_START": 0.4,
        "DIV_FACTOR": 10, "DECAY_STEP_LIST": [35, 45], "LR_DECAY": 0.1,
        "LR_CLIP": 1e-7, "GRAD_NORM_CLIP": 10.0,
    })
    tx, lr_fn = opt.build_optimizer(cfg, 10, 10)
    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    state = tx.init(params)
    grads = {"w": jnp.full((4,), 0.1), "b": jnp.full((2,), -0.2)}
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert not np.allclose(np.asarray(new["w"]), 1.0)
    # weight decay pulls weights toward zero even with zero grads
    updates2, _ = tx.update(
        {"w": jnp.zeros((4,)), "b": jnp.zeros((2,))}, state, params)
    assert np.all(np.asarray(updates2["w"]) < 0)


def test_freeze_mask():
    params = {"backbone": {"w": jnp.ones((2,))}, "head": {"w": jnp.ones((2,))}}
    mask = opt.build_param_freeze_mask(params, ["backbone"])
    assert mask["backbone"]["w"] is False
    assert mask["head"]["w"] is True
