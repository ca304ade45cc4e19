"""Unit tests for the custom-VJP linear algebra (ops/linalg.py).

The recursive triangular inverse and the barrier-gated backward path only
activate above _TRI_INV_RECURSION_MIN on the hot path; here they are
exercised directly (explicit base sizes / monkeypatched threshold) so CPU CI
covers the code the TPU bench runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gumbi_tpu.ops.linalg as linalg
from gumbi_tpu.ops.linalg import quad_and_logdet, spd_solve, tri_inverse


def _spd(n, batch=(), seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=batch + (n, 32)).astype(dtype)
    K = X @ np.swapaxes(X, -1, -2) / 32 + 2.0 * np.eye(n, dtype=dtype)
    return jnp.asarray(K)


@pytest.mark.parametrize("n,base", [(300, 64), (257, 50), (512, 512)])
def test_tri_inverse_matches_solve(n, base):
    L = jnp.linalg.cholesky(_spd(n))
    V = tri_inverse(L, base=base)
    np.testing.assert_allclose(
        np.asarray(V @ L), np.eye(n), rtol=0, atol=1e-9
    )


def test_tri_inverse_batched():
    L = jnp.linalg.cholesky(_spd(200, batch=(3,)))
    V = tri_inverse(L, base=64)
    eye = np.broadcast_to(np.eye(200), (3, 200, 200))
    np.testing.assert_allclose(np.asarray(V @ L), eye, rtol=0, atol=1e-9)


def test_qld_gradient_recursive_path_matches_small_path(monkeypatch):
    """The barrier-gated recursive backward must produce the same gradients
    as the plain triangular-solve backward (what CPU-size problems use)."""
    A = _spd(320, batch=(2,), seed=1)
    z = jnp.asarray(np.random.default_rng(2).normal(size=(2, 320)))

    def loss(A, z):
        quad, logdet = quad_and_logdet(A, z)
        return jnp.sum(0.7 * quad + 1.3 * logdet)

    gA_small, gz_small = jax.grad(loss, argnums=(0, 1))(A, z)
    monkeypatch.setattr(linalg, "_TRI_INV_RECURSION_MIN", 64)
    gA_rec, gz_rec = jax.grad(loss, argnums=(0, 1))(A, z)
    np.testing.assert_allclose(np.asarray(gA_rec), np.asarray(gA_small), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(gz_rec), np.asarray(gz_small), rtol=1e-9)


def test_qld_gradient_matches_finite_differences(monkeypatch):
    monkeypatch.setattr(linalg, "_TRI_INV_RECURSION_MIN", 64)
    A = _spd(96, seed=3)
    z = jnp.asarray(np.random.default_rng(4).normal(size=96))

    def loss(A):
        quad, logdet = quad_and_logdet(A, z)
        return 0.4 * quad - 0.9 * logdet

    g = jax.grad(loss)(A)
    rng = np.random.default_rng(5)
    V = rng.normal(size=(96, 96))
    V = jnp.asarray((V + V.T) / 2)
    h = 1e-6
    fd = (float(loss(A + h * V)) - float(loss(A - h * V))) / (2 * h)
    assert float(jnp.sum(g * V)) == pytest.approx(fd, rel=1e-6)


def test_spd_solve_value_and_grad():
    A = _spd(64, seed=6)
    B = jnp.asarray(np.random.default_rng(7).normal(size=(64, 3)))
    X = spd_solve(A, B)
    np.testing.assert_allclose(np.asarray(A @ X), np.asarray(B), atol=1e-9)

    def loss(A, B):
        return jnp.sum(spd_solve(A, B) ** 2)

    gA, gB = jax.grad(loss, argnums=(0, 1))(A, B)
    rng = np.random.default_rng(8)
    V = rng.normal(size=A.shape)
    V = jnp.asarray((V + V.T) / 2)
    h = 1e-6
    fd = (float(loss(A + h * V, B)) - float(loss(A - h * V, B))) / (2 * h)
    assert float(jnp.sum(gA * V)) == pytest.approx(fd, rel=1e-6)
