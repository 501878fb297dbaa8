import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdmae_tpu.ops.pallas.fused_layernorm import (
    fused_add_layernorm, reference_add_layernorm)


@pytest.mark.parametrize("n,c", [(256, 128), (96, 256), (1024, 128)])
def test_fused_ln_matches_reference(n, c):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, c).astype(np.float32))
    res = jnp.asarray(rng.randn(n, c).astype(np.float32))
    gamma = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
    beta = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    ref = reference_add_layernorm(x, res, gamma, beta)
    got = fused_add_layernorm(x, res, gamma, beta, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_fused_ln_gradients():
    rng = np.random.RandomState(1)
    n, c = 64, 128
    x = jnp.asarray(rng.randn(n, c).astype(np.float32))
    res = jnp.asarray(rng.randn(n, c).astype(np.float32))
    gamma = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
    beta = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    tgt = jnp.asarray(rng.randn(n, c).astype(np.float32))

    def loss(fn):
        def inner(x, res, gamma, beta):
            kwargs = {"interpret": True} if fn is fused_add_layernorm else {}
            return jnp.sum((fn(x, res, gamma, beta, **kwargs) - tgt) ** 2)
        return inner

    g_ref = jax.grad(loss(reference_add_layernorm), argnums=(0, 1, 2, 3))(
        x, res, gamma, beta)
    g_fus = jax.grad(loss(fused_add_layernorm), argnums=(0, 1, 2, 3))(
        x, res, gamma, beta)
    for a, b in zip(g_fus, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-4)


def test_fused_ln_3d_shape():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(8, 16, 128).astype(np.float32))
    res = jnp.asarray(rng.randn(8, 16, 128).astype(np.float32))
    gamma = jnp.ones((128,), jnp.float32)
    beta = jnp.zeros((128,), jnp.float32)
    got = fused_add_layernorm(x, res, gamma, beta, interpret=True)
    ref = reference_add_layernorm(x, res, gamma, beta)
    assert got.shape == (8, 16, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)
