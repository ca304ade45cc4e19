"""FITC sparse Laplace approximation for the latent Bernoulli classifier.

Sparse + latent is NotImplemented in the reference
(ref gumbi/regression/pymc/GP.py:587 — MarginalSparse exists only for the
Gaussian likelihood); this module supplies the classifier's long-axis
scaling path: the FITC prior K ≈ ΦΦᵀ + D (Φ = K_fu L_uu⁻ᵀ whitened
cross-Gram, D the exact-diagonal correction) drops every O(N²) object from
GPML Algorithm 3.1. All Newton algebra runs through the Woodbury identity
on B = diag(A) + (SΦ)(SΦ)ᵀ with A = 1 + W·D, so one iteration costs
O(N·m² + m³) and the N×m cross-Gram matmuls ride the MXU.

Gradients differentiate straight through the fixed-iteration Newton loop:
unlike the dense path (whose N×N Cholesky inside the loop forced the
hand-derived custom VJP in ops/laplace.py), the only factorization here is
the m×m chol(M) — cheap to roll back through 30 iterations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .kernels import GPSpec, gram, gram_diag
from .mll import DEFAULT_JITTER
from .priors import constrain, log_prior

__all__ = [
    "fitc_laplace_mll",
    "fitc_laplace_neg_logp",
    "fitc_laplace_predict",
    "fitc_laplace_draw_latent",
]


def _whitened_features(spec: GPSpec, params, xc, xk, xu_c, xu_k, jitter):
    """Φ = K_fu L_uu⁻ᵀ (N, m) and the FITC diag correction D (N,)."""
    Kuu = gram(spec, params, xu_c, xu_k, xu_c, xu_k)
    m_u = Kuu.shape[0]
    # Inducing Gram needs a stronger floor than the data Gram: k-means
    # centers can nearly coincide (same policy as ops/fitc._stabilized_kuu).
    Kuu = Kuu + (100.0 * jitter) * jnp.eye(m_u, dtype=Kuu.dtype)
    Luu = jnp.linalg.cholesky(Kuu)
    Kfu = gram(spec, params, xc, xk, xu_c, xu_k)  # (N, m)
    Phi = jsl.solve_triangular(Luu, Kfu.T, lower=True).T  # (N, m)
    D = gram_diag(spec, params, xc, xk) - jnp.sum(Phi * Phi, axis=1)
    D = jnp.maximum(D, 0.0) + jitter
    return Phi, D, Luu


def _woodbury_pieces(Phi, D, W):
    """Factor B = diag(A) + UUᵀ with A = 1 + W·D, U = √W·Φ.

    Returns (A, U, Lm) with Lm = chol(I_m + Uᵀ A⁻¹ U); solves and logdet
    of B come from the Woodbury/determinant-lemma identities.
    """
    A = 1.0 + W * D
    S = jnp.sqrt(jnp.maximum(W, 0.0))  # masked rows: W=0 → S=0 exactly
    U = S[:, None] * Phi
    P = U.T @ (U / A[:, None])
    M = jnp.eye(Phi.shape[1], dtype=Phi.dtype) + P
    Lm = jnp.linalg.cholesky(M)
    return A, S, U, Lm


def _B_solve(z, A, U, Lm):
    """B⁻¹ z for B = diag(A) + UUᵀ via Woodbury."""
    zA = z / A
    return zA - (U / A[:, None]) @ jsl.cho_solve((Lm, True), U.T @ zA)


def _K_mv(v, Phi, D):
    """(ΦΦᵀ + diag(D)) v without forming the N×N matrix."""
    return Phi @ (Phi.T @ v) + D * v


def fitc_laplace_mode(Phi, D, y, n_iter=30, mask=None):
    """Newton iterations to the latent mode under the FITC prior.

    Same recurrence as :func:`gumbi_tpu.ops.laplace.laplace_mode` (GPML
    Alg 3.1) with every K product/solve replaced by its low-rank+diag
    form. Masked rows carry zero likelihood → W=0 → unit rows of A and
    zero rows of U, so the evidence reduces exactly to the unpadded one.
    """
    n = y.shape[0]
    m = jnp.ones_like(y) if mask is None else mask

    def body(_, f):
        π = jax.nn.sigmoid(f)
        W = m * π * (1.0 - π)
        A, S, U, Lm = _woodbury_pieces(Phi, D, W)
        b = W * f + m * (y - π)
        Kb = _K_mv(b, Phi, D)
        a = b - S * _B_solve(S * Kb, A, U, Lm)
        return _K_mv(a, Phi, D)

    f = jax.lax.fori_loop(0, n_iter, body, jnp.zeros(n, dtype=Phi.dtype))
    # Final factor set at the converged mode (for Z and prediction)
    π = jax.nn.sigmoid(f)
    W = m * π * (1.0 - π)
    A, S, U, Lm = _woodbury_pieces(Phi, D, W)
    b = W * f + m * (y - π)
    Kb = _K_mv(b, Phi, D)
    a = b - S * _B_solve(S * Kb, A, U, Lm)
    return f, a, (A, S, U, Lm)


def fitc_laplace_mll(spec, params, xc, xk, xu_c, xu_k, y, jitter=DEFAULT_JITTER,
                     n_iter=30, mask=None):
    """Laplace-approximate log marginal likelihood under the FITC prior.

    log Z = −½ aᵀf̂ + log p(y|f̂) − ½ log|B|, with
    log|B| = Σ log A + log|I_m + Uᵀ A⁻¹ U| (determinant lemma).
    """
    m = jnp.ones_like(y) if mask is None else jnp.asarray(mask, dtype=y.dtype)
    Phi, D, _ = _whitened_features(spec, params, xc, xk, xu_c, xu_k, jitter)
    f, a, (A, S, U, Lm) = fitc_laplace_mode(Phi, D, y, n_iter, mask=m)
    log_lik = jnp.sum(m * (y * f - jnp.logaddexp(0.0, f)))
    logdet_B = jnp.sum(jnp.log(A)) + 2.0 * jnp.sum(jnp.log(jnp.diag(Lm)))
    return -0.5 * jnp.dot(a, f) + log_lik - 0.5 * logdet_B


def fitc_laplace_neg_logp(
    spec: GPSpec, uparams, xc, xk, xu_c, xu_k, y, ls_alpha, ls_beta,
    jitter=DEFAULT_JITTER, n_iter=30, mask=None,
):
    """Negative (FITC-Laplace evidence + hyperprior) in unconstrained space."""
    params = constrain(uparams)
    total = fitc_laplace_mll(
        spec, params, xc, xk, xu_c, xu_k, y, jitter, n_iter, mask=mask
    ) + log_prior(spec, uparams, ls_alpha, ls_beta)
    return jnp.where(jnp.isfinite(total), -total, jnp.inf)


@partial(jax.jit, static_argnums=0, static_argnames=("n_iter",))
def fitc_laplace_predict(
    spec: GPSpec, params, xc, xk, xu_c, xu_k, y, xc_new, xk_new,
    jitter=DEFAULT_JITTER, n_iter=30, mask=None,
):
    """Latent posterior (mean, var) and class probability at new points.

    Under FITC's conditional-independence assumption the test/train cross
    covariance is Q* = K_su K_uu⁻¹ K_uf = Φ* Φᵀ, so
    mean* = Φ* Φᵀ (y − π̂) and
    var*  = k** − diag(Φ* G Φ*ᵀ), G = Uᵀ B⁻¹ U = P − P M⁻¹ P
    (P = Uᵀ A⁻¹ U) — the (K + W⁻¹)⁻¹ quadratic form in whitened coords.
    """
    m = jnp.ones_like(y) if mask is None else jnp.asarray(mask, dtype=y.dtype)
    Phi, D, Luu = _whitened_features(spec, params, xc, xk, xu_c, xu_k, jitter)
    f, a, (A, S, U, Lm) = fitc_laplace_mode(Phi, D, y, n_iter, mask=m)

    Ksu = gram(spec, params, xc_new, xk_new, xu_c, xu_k)  # (M, m)
    Phi_s = jsl.solve_triangular(Luu, Ksu.T, lower=True).T  # (M, m)

    π = jax.nn.sigmoid(f)
    mean = Phi_s @ (Phi.T @ (m * (y - π)))

    P = U.T @ (U / A[:, None])
    G = P - P @ jsl.cho_solve((Lm, True), P)
    var = gram_diag(spec, params, xc_new, xk_new) - jnp.sum((Phi_s @ G) * Phi_s, axis=1)
    var = jnp.maximum(var, 1e-12)

    prob = jax.nn.sigmoid(mean / jnp.sqrt(1.0 + jnp.pi * var / 8.0))
    return mean, var, prob


@partial(jax.jit, static_argnums=0, static_argnames=("n_iter", "n_samples"))
def fitc_laplace_draw_latent(
    spec: GPSpec, params, xc, xk, xu_c, xu_k, y, xc_new, xk_new, key,
    n_samples=1, jitter=DEFAULT_JITTER, n_iter=30, mask=None,
):
    """Joint draws of the latent field from the FITC-Laplace posterior.

    Same factorizations as :func:`fitc_laplace_predict`, with the full
    test-block covariance  cov = K** − Φ* G Φ*ᵀ  in place of its diagonal
    (G as there). Draws pushed through the link give sparse-classifier
    probability samples — a path the reference lacks entirely (its
    sparse+latent combination raises NotImplementedError, reference
    gumbi/regression/pymc/GP.py:587).
    """
    m = jnp.ones_like(y) if mask is None else jnp.asarray(mask, dtype=y.dtype)
    Phi, D, Luu = _whitened_features(spec, params, xc, xk, xu_c, xu_k, jitter)
    f, a, (A, S, U, Lm) = fitc_laplace_mode(Phi, D, y, n_iter, mask=m)

    Ksu = gram(spec, params, xc_new, xk_new, xu_c, xu_k)
    Phi_s = jsl.solve_triangular(Luu, Ksu.T, lower=True).T

    π = jax.nn.sigmoid(f)
    mean = Phi_s @ (Phi.T @ (m * (y - π)))

    P = U.T @ (U / A[:, None])
    G = P - P @ jsl.cho_solve((Lm, True), P)
    Kss = gram(spec, params, xc_new, xk_new, xc_new, xk_new)
    cov = Kss - (Phi_s @ G) @ Phi_s.T
    cov = cov + jnp.maximum(jitter, 1e-6) * jnp.eye(cov.shape[0], dtype=cov.dtype)
    Lss = jnp.linalg.cholesky(cov)
    eps = jax.random.normal(key, (n_samples, mean.shape[0]), dtype=mean.dtype)
    return mean[None, :] + eps @ Lss.T
