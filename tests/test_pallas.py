"""Pallas RBF Gram kernel: forward and VJP vs the XLA reference (interpret
mode on CPU; compiled on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gumbi_tpu.ops.kernels import GPSpec, GPTerm, gram


def _xla_rbf(x1, x2, ls, eta):
    spec = GPSpec(terms=(GPTerm(suffix="total", kernel="ExpQuad"),), d_cont=x1.shape[1])
    params = {"ls_total": ls, "η_total": eta, "σ": jnp.asarray(0.1)}
    xk1 = jnp.zeros((x1.shape[0], 0), dtype=jnp.int32)
    xk2 = jnp.zeros((x2.shape[0], 0), dtype=jnp.int32)
    return gram(spec, params, x1, xk1, x2, xk2)


@pytest.fixture()
def interpreted_rbf(monkeypatch):
    """Force interpret mode so the kernel runs on CPU."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", jax.default_backend() != "tpu")
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    from gumbi_tpu.ops.pallas_kernels import rbf_gram

    return rbf_gram


def test_rbf_gram_forward_matches_xla(interpreted_rbf):
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(37, 2)), dtype=jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(23, 2)), dtype=jnp.float32)
    ls = jnp.asarray([0.7, 1.2], dtype=jnp.float32)
    eta = jnp.asarray(1.4, dtype=jnp.float32)

    K_pl = interpreted_rbf(x1, x2, ls, eta)
    K_xla = _xla_rbf(x1, x2, ls, eta)
    assert K_pl.shape == (37, 23)
    assert np.allclose(np.asarray(K_pl), np.asarray(K_xla), atol=1e-4)


def test_rbf_gram_vjp_matches_xla(interpreted_rbf):
    rng = np.random.default_rng(1)
    x1 = jnp.asarray(rng.normal(size=(12, 2)), dtype=jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(9, 2)), dtype=jnp.float32)
    ls = jnp.asarray([0.8, 0.9], dtype=jnp.float32)
    eta = jnp.asarray(1.1, dtype=jnp.float32)
    gbar = jnp.asarray(rng.normal(size=(12, 9)), dtype=jnp.float32)

    def loss_pl(x1, x2, ls, eta):
        return jnp.sum(interpreted_rbf(x1, x2, ls, eta) * gbar)

    def loss_xla(x1, x2, ls, eta):
        return jnp.sum(_xla_rbf(x1, x2, ls, eta) * gbar)

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(x1, x2, ls, eta)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(x1, x2, ls, eta)
    for a, b in zip(g_pl, g_xla):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_rbf_gram_shared_lengthscale(interpreted_rbf):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(10, 3)), dtype=jnp.float32)
    ls = jnp.asarray([0.85], dtype=jnp.float32)  # shared (non-ARD)
    eta = jnp.asarray(0.9, dtype=jnp.float32)
    K_pl = interpreted_rbf(x, x, ls, eta)
    naive = 0.9**2 * np.exp(
        -0.5
        * np.sum(
            ((np.asarray(x)[:, None, :] - np.asarray(x)[None, :, :]) / 0.85) ** 2, axis=-1
        )
    )
    assert np.allclose(np.asarray(K_pl), naive, atol=1e-4)
