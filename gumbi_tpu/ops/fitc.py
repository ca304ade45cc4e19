"""FITC sparse GP approximation with k-means inducing points.

TPU-native counterpart of the reference's MarginalSparse path (reference
gumbi/regression/pymc/GP.py:571-578, approx='FITC' with
pm.gp.util.kmeans_inducing_points). All device math is expressed with the
inducing-point Woodbury identity, so cost is O(N·M²) instead of O(N³); the
N×M cross-Gram matmuls ride the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np

from .kernels import GPSpec, gram, gram_diag, noise_diag
from .linalg import quad_and_logdet, spd_solve
from .mll import DEFAULT_JITTER
from .priors import constrain, log_prior

__all__ = [
    "kmeans_inducing",
    "select_inducing",
    "fitc_mll",
    "fitc_neg_logp",
    "fitc_predict",
    "fitc_predict_cov",
    "fitc_draw_samples",
]


def kmeans_inducing(X: np.ndarray, n_u: int, seed: int = 0, n_iter: int = 25) -> np.ndarray:
    """Lloyd's k-means centers over the (host) input matrix.

    Runs once on the host at build time; cost is negligible next to the fit.
    """
    X = np.asarray(X, dtype=float)
    n = X.shape[0]
    rng = np.random.default_rng(seed)
    if n_u >= n:
        return X.copy()
    centers = X[rng.choice(n, n_u, replace=False)]
    for _ in range(n_iter):
        d2 = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)
        for j in range(n_u):
            pts = X[assign == j]
            if len(pts):
                centers[j] = pts.mean(0)
    return centers


def select_inducing(xc, xk, n_u, d_cont, seed, dtype, mask=None):
    """k-means inducing inputs over the REAL rows of a (possibly padded) design.

    Shared by the sparse regressor and classifier (reference recipe:
    pm.gp.util.kmeans_inducing_points, ref pymc/GP.py:571-578). Bucket-padded
    rows are all-zero placeholders at the tail of the design matrix; ``mask``
    slices them off before clustering so they cannot pull centers toward the
    origin (and so the ``n_u >= n`` early-exit sees the true row count).
    Categorical columns are clustered as floats, then snapped back to valid
    level indices. Returns (xu_c, xu_k) device arrays.
    """
    xc = np.asarray(xc, dtype=float)
    xk = np.asarray(xk)
    if mask is not None:
        n_real = int(np.asarray(mask).sum())
        xc, xk = xc[:n_real], xk[:n_real]
    full = np.column_stack([xc, xk.astype(float)])
    centers = kmeans_inducing(full, n_u, seed=seed)
    xu_c = jnp.asarray(centers[:, :d_cont], dtype=dtype)
    if xk.shape[1]:
        k_cols = np.clip(np.round(centers[:, d_cont:]), 0, None).astype(np.int32)
        maxes = xk.max(axis=0)
        xu_k = jnp.asarray(np.minimum(k_cols, maxes), dtype=jnp.int32)
    else:
        xu_k = jnp.zeros((centers.shape[0], 0), dtype=jnp.int32)
    return xu_c, xu_k


def _stabilized_kuu(spec: GPSpec, params, xu_c, xu_k, dtype, jitter):
    """Kuu with a dtype-aware relative jitter.

    Kuu of M smooth-kernel inducing points is near-singular; the fixed
    jitter must clear the factorization's rounding floor (~M·eps relative
    to the diagonal scale), which at f32 and M≈512 is ~1e-4 — far above
    the f64-calibrated 1e-6 default.
    """
    m = xu_c.shape[0]
    Kuu = gram(spec, params, xu_c, xu_k, xu_c, xu_k)
    eps = float(jnp.finfo(dtype).eps)
    rel = jnp.maximum(jnp.asarray(jitter, dtype), m * eps)
    return Kuu + rel * jnp.mean(jnp.diag(Kuu)) * jnp.eye(m, dtype=dtype)


def _fitc_common(spec: GPSpec, params, xc, xk, xu_c, xu_k, y, jitter, mask=None):
    """Shared FITC factorizations: Luu, A, Λ, LB, c (forward-only paths).

    ``mask`` (1=real row, 0=bucket padding) zeroes a padded row's weight
    1/λᵢ everywhere it enters, which is EXACTLY equivalent to deleting the
    row (its λ→∞ limit) while keeping shapes static.
    """
    m = xu_c.shape[0]
    Kuu = _stabilized_kuu(spec, params, xu_c, xu_k, xc.dtype, jitter)
    Kux = gram(spec, params, xu_c, xu_k, xc, xk)  # (M, N)
    Luu = jnp.linalg.cholesky(Kuu)
    A = jsl.solve_triangular(Luu, Kux, lower=True)  # (M, N)

    kxx_diag = gram_diag(spec, params, xc, xk)
    q_diag = jnp.sum(A * A, axis=0)
    lam = jnp.maximum(kxx_diag - q_diag, 0.0) + noise_diag(spec, params, xk, dtype=xc.dtype)

    w = 1.0 / lam if mask is None else mask / lam
    A_l = A * w[None, :]
    B = jnp.eye(m, dtype=xc.dtype) + A_l @ A.T
    LB = jnp.linalg.cholesky(B)
    c = jsl.solve_triangular(LB, A_l @ y, lower=True)  # (M,)
    return Luu, A, lam, LB, c


def fitc_mll(spec: GPSpec, params, xc, xk, xu_c, xu_k, y, jitter=DEFAULT_JITTER, mask=None):
    """FITC approximate marginal log-likelihood (Snelson & Ghahramani).

    Expressed through the Woodbury identity on ``Kuu + KuxΛ⁻¹Kxu`` so every
    factorization sits behind the custom-VJP primitives (ops/linalg.py):

        quad   = yᵀΛ⁻¹y − (KuxΛ⁻¹y)ᵀ (Kuu+G)⁻¹ (KuxΛ⁻¹y),  G = KuxΛ⁻¹Kxu
        logdet = log|Kuu+G| − log|Kuu| + Σ log λ

    This keeps the sparse objective vmap-safe on TPU (no batched Cholesky /
    triangular-solve VJPs under multi-restart optimization).

    ``mask`` (1=real, 0=bucket padding) makes the evidence EXACT for padded
    designs: a padded row's weight 1/λᵢ is zeroed wherever it enters (the
    λᵢ→∞ limit, i.e. row deletion), its Σlog λ term is dropped, and n counts
    real rows only — all with static shapes, so lab loops never recompile.
    """
    Kuu = _stabilized_kuu(spec, params, xu_c, xu_k, xc.dtype, jitter)
    Kux = gram(spec, params, xu_c, xu_k, xc, xk)  # (M, N)
    V = spd_solve(Kuu, Kux)  # (M, N) = Kuu⁻¹ Kux
    q_diag = jnp.sum(Kux * V, axis=0)
    kxx_diag = gram_diag(spec, params, xc, xk)
    lam = jnp.maximum(kxx_diag - q_diag, 0.0) + noise_diag(spec, params, xk, dtype=xc.dtype)

    if mask is None:
        n = y.shape[0]
        w = 1.0 / lam
        logdet_lam = jnp.sum(jnp.log(lam))
    else:
        n = jnp.sum(mask)
        w = mask / lam
        logdet_lam = jnp.sum(mask * jnp.log(lam))
    y_l = y * w
    Ky = Kux @ y_l  # (M,)
    G = (Kux * w[None, :]) @ Kux.T  # (M, M)
    quad_w, logdet_kg = quad_and_logdet(Kuu + G, Ky)
    _, logdet_kuu = quad_and_logdet(Kuu, jnp.zeros_like(Ky))
    quad = jnp.sum(y * y_l) - quad_w
    logdet = logdet_kg - logdet_kuu + logdet_lam
    return -0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi))


def fitc_neg_logp(
    spec: GPSpec, uparams, xc, xk, xu_c, xu_k, y, ls_alpha, ls_beta,
    jitter=DEFAULT_JITTER, mask=None,
):
    """Negative (FITC MLL + hyperprior) in unconstrained space."""
    params = constrain(uparams)
    total = fitc_mll(spec, params, xc, xk, xu_c, xu_k, y, jitter, mask=mask) + log_prior(
        spec, uparams, ls_alpha, ls_beta
    )
    return jnp.where(jnp.isfinite(total), -total, jnp.inf)


@partial(jax.jit, static_argnums=0, static_argnames=("with_noise",))
def fitc_predict(
    spec: GPSpec,
    params,
    xc,
    xk,
    xu_c,
    xu_k,
    y,
    xc_new,
    xk_new,
    with_noise=True,
    jitter=DEFAULT_JITTER,
    mask=None,
):
    """FITC posterior mean/variance at new points (mask: see _fitc_common)."""
    Luu, A, lam, LB, c = _fitc_common(
        spec, params, xc, xk, xu_c, xu_k, y, jitter, mask=mask
    )
    Kus = gram(spec, params, xu_c, xu_k, xc_new, xk_new)  # (M, M*)
    w = jsl.solve_triangular(Luu, Kus, lower=True)  # (M, M*)
    wb = jsl.solve_triangular(LB, w, lower=True)  # (M, M*)
    mean = wb.T @ c
    var = (
        gram_diag(spec, params, xc_new, xk_new)
        - jnp.sum(w * w, axis=0)
        + jnp.sum(wb * wb, axis=0)
    )
    var = jnp.maximum(var, 0.0)
    if with_noise:
        var = var + noise_diag(spec, params, xk_new, dtype=var.dtype)
    return mean, var


def fitc_predict_cov(
    spec: GPSpec,
    params,
    xc,
    xk,
    xu_c,
    xu_k,
    y,
    xc_new,
    xk_new,
    with_noise=False,
    jitter=DEFAULT_JITTER,
    mask=None,
):
    """FITC posterior mean and FULL covariance at new points.

    Same factorizations as :func:`fitc_predict`, with the full test-block
    prior covariance in place of its diagonal:

        cov = K(X*,X*) − wᵀw + wbᵀwb

    (the Nyström correction −Q** plus the information gained through the
    inducing set). Enables joint function draws from sparse fits — the
    reference has no sparse sampling path at all (its sparse+latent
    combination raises NotImplementedError, ref GP.py:587).
    """
    Luu, A, lam, LB, c = _fitc_common(
        spec, params, xc, xk, xu_c, xu_k, y, jitter, mask=mask
    )
    Kus = gram(spec, params, xu_c, xu_k, xc_new, xk_new)  # (M, M*)
    w = jsl.solve_triangular(Luu, Kus, lower=True)
    wb = jsl.solve_triangular(LB, w, lower=True)
    mean = wb.T @ c
    Kss = gram(spec, params, xc_new, xk_new, xc_new, xk_new)
    cov = Kss - w.T @ w + wb.T @ wb
    if with_noise:
        cov = cov + jnp.diag(noise_diag(spec, params, xk_new, dtype=cov.dtype))
    return mean, cov


@partial(jax.jit, static_argnums=(0,), static_argnames=("n_samples", "with_noise"))
def fitc_draw_samples(
    spec: GPSpec,
    params,
    xc,
    xk,
    xu_c,
    xu_k,
    y,
    xc_new,
    xk_new,
    key,
    n_samples=1,
    with_noise=False,
    jitter=DEFAULT_JITTER,
    mask=None,
):
    """Joint FITC posterior draws at new points (sparse analogue of
    ops.posterior.draw_samples)."""
    mean, cov = fitc_predict_cov(
        spec, params, xc, xk, xu_c, xu_k, y, xc_new, xk_new,
        with_noise=with_noise, jitter=jitter, mask=mask,
    )
    cov = cov + jitter * jnp.eye(cov.shape[0], dtype=cov.dtype)
    Lss = jnp.linalg.cholesky(cov)
    eps = jax.random.normal(key, (n_samples, mean.shape[0]), dtype=mean.dtype)
    return mean[None, :] + eps @ Lss.T
