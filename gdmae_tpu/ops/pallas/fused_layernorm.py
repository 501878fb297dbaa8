"""Fused residual-add + LayerNorm (Pallas TPU kernel).

Each SST encoder layer does ``LayerNorm(x + residual)`` twice.  XLA lowers
that as separate add / f32-upcast / mean / var / normalize ops with several
HBM round-trips over the (tokens, C) activations — measured ~2.2 ms per LN
at (163840, 128) bf16 on v5e, ~15x the bandwidth roofline.  Here the whole
thing is one pass: a block of rows is loaded once, stats are computed in
VMEM in f32, and only the normalized result is written back.  C = d_model
(128/256) is exactly lane-aligned, so tiling is perfect — unlike the tiny
per-window attention matmuls, this is a shape Pallas wins on.

The backward recomputes the row stats from the saved sum (flash-style, no
stored mean/var) and accumulates dgamma/dbeta across grid steps in a VMEM
f32 accumulator (all grid steps map to the same output block).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _fwd_kernel(eps, x_ref, r_ref, g_ref, b_ref, y_ref):
    x = (x_ref[:] + r_ref[:]).astype(jnp.float32)  # residual add
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xhat = xc * jax.lax.rsqrt(var + eps)
    y = xhat * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _fwd_save_kernel(eps, x_ref, r_ref, g_ref, b_ref, y_ref, s_ref):
    x = (x_ref[:] + r_ref[:]).astype(jnp.float32)
    s_ref[:] = x.astype(s_ref.dtype)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xhat = xc * jax.lax.rsqrt(var + eps)
    y = xhat * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _bwd_kernel(eps, x_ref, g_ref, dy_ref, dx_ref, dg_ref, db_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dg_ref[:] = jnp.zeros_like(dg_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    x = x_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    gamma = g_ref[0].astype(jnp.float32)
    c = x.shape[-1]

    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv

    dg_ref[:] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_ref[:] += jnp.sum(dy, axis=0, keepdims=True)

    dyg = dy * gamma[None, :]
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    dx = inv * (dyg - m1 - xhat * m2)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _pick_rows(n, c):
    """Rows per block: ~512 KB f32 working set, divisor of n."""
    target = max(8, min(n, (1 << 19) // (4 * c)))
    r = target
    while n % r:
        r -= 1
    return r


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_add_ln(x, res, gamma, beta, eps, interpret):
    n, c = x.shape
    r = _pick_rows(n, c)
    blk = pl.BlockSpec((r, c), lambda i: (i, 0))
    pblk = pl.BlockSpec((1, c), lambda i: (0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        grid=(n // r,),
        in_specs=[blk, blk, pblk, pblk],
        out_specs=blk,
        interpret=interpret,
    )(x, res, gamma.reshape(1, c), beta.reshape(1, c))


def _fused_add_ln_fwd(x, res, gamma, beta, eps, interpret):
    n, c = x.shape
    r = _pick_rows(n, c)
    blk = pl.BlockSpec((r, c), lambda i: (i, 0))
    pblk = pl.BlockSpec((1, c), lambda i: (0, 0))
    # one pass: emit y and the saved sum (bf16) together
    y, xs = pl.pallas_call(
        functools.partial(_fwd_save_kernel, eps),
        out_shape=[jax.ShapeDtypeStruct((n, c), x.dtype)] * 2,
        grid=(n // r,),
        in_specs=[blk, blk, pblk, pblk],
        out_specs=[blk, blk],
        interpret=interpret,
    )(x, res, gamma.reshape(1, c), beta.reshape(1, c))
    return y, (xs, gamma)


def _fused_add_ln_bwd(eps, interpret, saved, dy):
    xs, gamma = saved
    n, c = xs.shape
    r = _pick_rows(n, c)
    blk = pl.BlockSpec((r, c), lambda i: (i, 0))
    pblk = pl.BlockSpec((1, c), lambda i: (0, 0))
    dx, dg, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps),
        out_shape=[
            jax.ShapeDtypeStruct((n, c), xs.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        grid=(n // r,),
        in_specs=[blk, pblk, blk],
        out_specs=[blk, pblk, pblk],
        interpret=interpret,
    )(xs, gamma.reshape(1, c), dy)
    return dx, dx, dg.reshape(c).astype(gamma.dtype), db.reshape(c).astype(gamma.dtype)


_fused_add_ln.defvjp(_fused_add_ln_fwd, _fused_add_ln_bwd)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_add_layernorm(x, res, gamma, beta, eps: float = 1e-5,
                        interpret: bool = False):
    """``LayerNorm(x + res) * gamma + beta`` in one HBM pass.

    Args:
        x, res: (..., C) — same shape; the leading dims are flattened.
        gamma, beta: (C,)
    """
    shape = x.shape
    c = shape[-1]
    y = _fused_add_ln(x.reshape(-1, c), res.reshape(-1, c), gamma, beta,
                      eps, interpret)
    return y.reshape(shape)


def reference_add_layernorm(x, res, gamma, beta, eps: float = 1e-5):
    """Pure-XLA oracle."""
    s = (x + res).astype(jnp.float32)
    mu = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.var(s, axis=-1, keepdims=True)
    y = (s - mu) * jax.lax.rsqrt(var + eps) * gamma + beta
    return y.astype(x.dtype)
