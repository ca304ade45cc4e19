"""Validate the analytic Laplace-MLL gradient (GPML eqs. 5.21-5.24).

The custom VJP must match (a) autodiff straight through the Newton loop and
(b) central finite differences, at float64. Both oracles include the implicit
mode-shift term, so agreement confirms the full formula, not just the
explicit part.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gumbi_tpu.ops.laplace import _laplace_Z, laplace_mll, laplace_mode


def _problem(n=40, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-2, 2, size=(n, 1))
    d2 = (X[:, None, 0] - X[None, :, 0]) ** 2
    K = 1.3 * np.exp(-0.5 * d2 / 0.6**2) + 1e-6 * np.eye(n)
    f_true = np.sin(1.5 * X[:, 0]) * 2.0
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-f_true))).astype(np.float64)
    return jnp.asarray(K), jnp.asarray(y)


def _mll_through_loop(K, y, n_iter=40):
    """Plain (autodiff-through-Newton) version — the gradient oracle."""
    f, a, L, _ = laplace_mode(K, y, n_iter)
    return _laplace_Z(f, a, L, y, jnp.ones_like(y))


def test_laplace_vjp_matches_autodiff_through_newton():
    K, y = _problem()
    g_custom = jax.grad(lambda K: laplace_mll(K, y, n_iter=40))(K)
    g_loop = jax.grad(lambda K: _mll_through_loop(K, y, n_iter=40))(K)
    # The raw cotangents may differ by a skew-symmetric matrix (the two
    # computations distribute the K_ij/K_ji dependence differently); K only
    # ever enters symmetrically (built by gram), so compare the symmetric
    # parts — the directional FD test below confirms exact agreement on
    # symmetric perturbations.
    sym = lambda M: 0.5 * (M + jnp.swapaxes(M, -1, -2))
    np.testing.assert_allclose(
        np.asarray(sym(g_custom)), np.asarray(sym(g_loop)), rtol=1e-6, atol=1e-9
    )


def test_laplace_vjp_matches_finite_differences():
    K, y = _problem(n=24, seed=1)
    rng = np.random.default_rng(2)
    # symmetric random direction (K is used symmetrically)
    V = rng.normal(size=K.shape)
    V = jnp.asarray((V + V.T) / 2)

    g = jax.grad(lambda K: laplace_mll(K, y, n_iter=60))(K)
    directional = float(jnp.sum(g * V))

    h = 1e-6
    zp = float(laplace_mll(K + h * V, y, n_iter=60))
    zm = float(laplace_mll(K - h * V, y, n_iter=60))
    fd = (zp - zm) / (2 * h)
    assert directional == pytest.approx(fd, rel=1e-5, abs=1e-7)


def _pad_problem(K, y, n_pad=7, seed=5):
    """Embed (K, y) in a padded problem with arbitrary junk in the pad block."""
    n = K.shape[0]
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n + n_pad, n + n_pad))
    junk = A @ A.T  # SPD junk; only the obs block should matter
    K_pad = jnp.asarray(junk).at[:n, :n].set(K)
    y_pad = jnp.concatenate([y, jnp.asarray(rng.integers(0, 2, n_pad), dtype=y.dtype)])
    m = jnp.concatenate([jnp.ones(n, dtype=y.dtype), jnp.zeros(n_pad, dtype=y.dtype)])
    return K_pad, y_pad, m


def test_masked_laplace_mll_exactly_ignores_padding():
    """Masked evidence on a padded problem == unpadded evidence: padded rows
    carry zero likelihood, so W (and B's off-identity structure) vanish there
    regardless of the pad block's contents."""
    K, y = _problem(n=24, seed=4)
    K_pad, y_pad, m = _pad_problem(K, y)
    z_ref = float(laplace_mll(K, y, n_iter=40))
    z_masked = float(laplace_mll(K_pad, y_pad, n_iter=40, mask=m))
    assert z_masked == pytest.approx(z_ref, rel=1e-9, abs=1e-8)


def test_masked_laplace_vjp_matches_finite_differences():
    K, y = _problem(n=20, seed=6)
    K_pad, y_pad, m = _pad_problem(K, y, n_pad=5, seed=7)
    rng = np.random.default_rng(8)
    V = rng.normal(size=K_pad.shape)
    V = jnp.asarray((V + V.T) / 2)

    g = jax.grad(lambda K: laplace_mll(K, y_pad, n_iter=60, mask=m))(K_pad)
    directional = float(jnp.sum(g * V))
    h = 1e-6
    zp = float(laplace_mll(K_pad + h * V, y_pad, n_iter=60, mask=m))
    zm = float(laplace_mll(K_pad - h * V, y_pad, n_iter=60, mask=m))
    fd = (zp - zm) / (2 * h)
    assert directional == pytest.approx(fd, rel=1e-5, abs=1e-7)

    # Gradient w.r.t. pad-only entries is exactly zero
    n = K.shape[0]
    g_np = np.asarray(g)
    assert np.abs(g_np[n:, :]).max() == 0.0 and np.abs(g_np[:, n:]).max() == 0.0


def test_laplace_vjp_vmappable():
    K, y = _problem(n=24, seed=3)
    scales = jnp.asarray([0.8, 1.0, 1.25])

    def obj(s):
        return laplace_mll(s * K, y, n_iter=40)

    vals, grads = jax.vmap(jax.value_and_grad(obj))(scales)
    vals2 = jnp.stack([obj(s) for s in scales])
    grads2 = jnp.stack([jax.grad(obj)(s) for s in scales])
    np.testing.assert_allclose(np.asarray(vals), np.asarray(vals2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(grads), np.asarray(grads2), rtol=1e-8)
