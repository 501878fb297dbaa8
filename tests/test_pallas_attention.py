import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdmae_tpu.ops.pallas.window_attention import (
    fused_window_attention, reference_window_attention)


@pytest.mark.parametrize("w,h,t,d", [(8, 4, 16, 16), (6, 8, 64, 32), (1, 2, 32, 16)])
def test_fused_matches_reference(w, h, t, d):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(w, h, t, d).astype(np.float32))
    k = jnp.asarray(rng.randn(w, h, t, d).astype(np.float32))
    v = jnp.asarray(rng.randn(w, h, t, d).astype(np.float32))
    valid = jnp.asarray(rng.rand(w, t) > 0.3)
    # never fully-invalid windows (matches bucket plans: window 0 token 0 real)
    valid = valid.at[:, 0].set(True)

    ref = reference_window_attention(q, k, v, valid)
    got = fused_window_attention(q, k, v, valid, interpret=True)
    # compare only valid query rows (invalid rows are masked by the caller)
    m = np.asarray(valid)[:, None, :, None]
    np.testing.assert_allclose(
        np.asarray(got) * m, np.asarray(ref) * m, rtol=2e-5, atol=2e-5)


def test_fused_handles_nondivisible_group():
    rng = np.random.RandomState(1)
    w, h, t, d = 10, 2, 16, 16  # group=8 doesn't divide 10 -> falls to 5
    q = jnp.asarray(rng.randn(w, h, t, d).astype(np.float32))
    valid = jnp.ones((w, t), bool)
    ref = reference_window_attention(q, q, q, valid)
    got = fused_window_attention(q, q, q, valid, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_fused_gradients_match_reference():
    rng = np.random.RandomState(2)
    w, h, t, d = 4, 2, 16, 16
    q = jnp.asarray(rng.randn(w, h, t, d).astype(np.float32))
    k = jnp.asarray(rng.randn(w, h, t, d).astype(np.float32))
    v = jnp.asarray(rng.randn(w, h, t, d).astype(np.float32))
    valid = jnp.asarray(rng.rand(w, t) > 0.3).at[:, 0].set(True)
    # weight the loss by valid queries only (garbage rows excluded, as the
    # model layer does)
    wmask = valid[:, None, :, None].astype(jnp.float32)
    tgt = jnp.asarray(rng.randn(w, h, t, d).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.sum(((reference_window_attention(q, k, v, valid) - tgt)
                        * wmask) ** 2)

    def loss_fused(q, k, v):
        return jnp.sum(((fused_window_attention(q, k, v, valid, interpret=True)
                         - tgt) * wmask) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_blocked_matches_reference():
    from gdmae_tpu.ops.pallas.window_attention import blocked_window_attention
    rng = np.random.RandomState(3)
    for w, t in [(6, 16), (8, 32), (4, 64), (3, 128)]:
        b, h, d = 2, 4, 16
        q = jnp.asarray(rng.randn(b, w, h, t, d).astype(np.float32))
        k = jnp.asarray(rng.randn(b, w, h, t, d).astype(np.float32))
        v = jnp.asarray(rng.randn(b, w, h, t, d).astype(np.float32))
        valid = jnp.asarray(rng.rand(b, w, t) > 0.3).at[..., 0].set(True)
        ref = reference_window_attention(q, k, v, valid)
        got = blocked_window_attention(q, k, v, valid)
        # rows with an invalid query are garbage in both paths; compare
        # valid rows only
        m = np.asarray(valid)[:, :, None, :, None]
        np.testing.assert_allclose(np.asarray(got) * m, np.asarray(ref) * m,
                                   rtol=2e-5, atol=2e-5)
