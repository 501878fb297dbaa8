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


def test_packed_mha_matches_biased_reference():
    from gdmae_tpu.ops.pallas.window_attention import (
        biased_window_attention, packed_window_mha)
    from gdmae_tpu.ops import window as W

    rng = np.random.RandomState(7)
    b, c, h = 2, 64, 4
    ts = (16,) * 2 + (32,) * 2 + (64,) * 2  # mixed levels, 6 blocks
    s_tot = len(ts) * 128
    q = jnp.asarray(rng.randn(b, s_tot, c).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s_tot, c).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s_tot, c).astype(np.float32))
    valid = jnp.asarray(rng.rand(b, s_tot) > 0.3)
    # keep one valid key per sub-window to avoid all-masked softmax rows
    valid = valid.reshape(b, -1, 16).at[..., 0].set(True).reshape(b, s_tot)

    got = packed_window_mha(q, k, v, valid, ts, h, interpret=True)

    nb = len(ts)
    hd = c // h

    def heads(x):
        return jnp.moveaxis(x.reshape(b, nb, 128, h, hd), -2, -3)

    bias = W.packed_block_bias(ts)
    ref = biased_window_attention(
        heads(q), heads(k), heads(v), valid.reshape(b, nb, 128), bias)
    ref = jnp.moveaxis(ref, -3, -2).reshape(b, s_tot, c)

    m = np.asarray(valid)[..., None]
    np.testing.assert_allclose(np.asarray(got) * m, np.asarray(ref) * m,
                               rtol=3e-5, atol=3e-5)


def test_packed_mha_gradients_match():
    from gdmae_tpu.ops.pallas.window_attention import (
        biased_window_attention, packed_window_mha)
    from gdmae_tpu.ops import window as W

    rng = np.random.RandomState(8)
    b, c, h = 1, 32, 2
    ts = (16,) + (32,)
    s_tot = len(ts) * 128
    q = jnp.asarray(rng.randn(b, s_tot, c).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s_tot, c).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s_tot, c).astype(np.float32))
    valid = jnp.asarray(rng.rand(b, s_tot) > 0.3)
    valid = valid.reshape(b, -1, 16).at[..., 0].set(True).reshape(b, s_tot)
    tgt = jnp.asarray(rng.randn(b, s_tot, c).astype(np.float32))
    wm = valid[..., None].astype(jnp.float32)

    nb = len(ts)
    hd = c // h

    def heads(x):
        return jnp.moveaxis(x.reshape(b, nb, 128, h, hd), -2, -3)

    bias = W.packed_block_bias(ts)

    def loss_ref(q, k, v):
        r = biased_window_attention(
            heads(q), heads(k), heads(v), valid.reshape(b, nb, 128), bias)
        r = jnp.moveaxis(r, -3, -2).reshape(b, s_tot, c)
        return jnp.sum(((r - tgt) * wm) ** 2)

    def loss_packed(q, k, v):
        r = packed_window_mha(q, k, v, valid, ts, h, interpret=True)
        return jnp.sum(((r - tgt) * wm) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-4, atol=2e-4)


def test_tokmajor_matches_headmajor_biased():
    from gdmae_tpu.ops.pallas.window_attention import (
        biased_window_attention, biased_window_attention_tokmajor)
    from gdmae_tpu.ops import window as W

    rng = np.random.RandomState(9)
    b, c, h = 2, 64, 4
    ts = (16,) * 2 + (32,) + (64,)
    nb = len(ts)
    s_tot = nb * 128
    hd = c // h
    q = jnp.asarray(rng.randn(b, nb, 128, c).astype(np.float32))
    k = jnp.asarray(rng.randn(b, nb, 128, c).astype(np.float32))
    v = jnp.asarray(rng.randn(b, nb, 128, c).astype(np.float32))
    valid = jnp.asarray(rng.rand(b, nb, 128) > 0.3)
    valid = valid.reshape(b, -1, 16).at[..., 0].set(True).reshape(b, nb, 128)
    bias = W.packed_block_bias(ts)

    def heads(x):
        return jnp.moveaxis(x.reshape(b, nb, 128, h, hd), -2, -3)

    ref = biased_window_attention(heads(q), heads(k), heads(v), valid, bias)
    ref = jnp.moveaxis(ref, -3, -2).reshape(b, nb, 128, c)
    got = biased_window_attention_tokmajor(q, k, v, valid, bias, True, h)
    m = np.asarray(valid)[..., None]
    np.testing.assert_allclose(np.asarray(got) * m, np.asarray(ref) * m,
                               rtol=2e-5, atol=2e-5)

    # gradients too (the model wraps it in jax.checkpoint)
    tgt = jnp.asarray(rng.randn(b, nb, 128, c).astype(np.float32))
    wm = valid[..., None].astype(jnp.float32)

    def loss_ref(q, k, v):
        r = biased_window_attention(heads(q), heads(k), heads(v), valid, bias)
        r = jnp.moveaxis(r, -3, -2).reshape(b, nb, 128, c)
        return jnp.sum(((r - tgt) * wm) ** 2)

    def loss_tok(q, k, v):
        r = jax.checkpoint(
            biased_window_attention_tokmajor, static_argnums=(5, 6))(
            q, k, v, valid, bias, True, h)
        return jnp.sum(((r - tgt) * wm) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss_tok, argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-4, atol=2e-4)
