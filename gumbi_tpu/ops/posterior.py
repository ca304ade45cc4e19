"""GP posterior prediction: batched mean/variance solves over point sets.

Replaces the reference's ``gp.predict(Xnew, point=MAP, diag=True)`` path
(reference gumbi/regression/pymc/GP.py:837-849). The training-set Cholesky is
computed once and cached on device; prediction is then one (M, N) cross-Gram
matmul + triangular solve per chunk, which XLA tiles onto the MXU.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .kernels import GPSpec, gram, gram_diag, noise_diag
from .mll import DEFAULT_JITTER, cholesky_factor

__all__ = [
    "PosteriorCache",
    "posterior_cache",
    "predict_diag",
    "predict_diag_chunked",
    "predict_diag_level",
    "predict_cov",
    "predict_cov_level",
    "draw_samples",
]


class PosteriorCache(NamedTuple):
    """Training-set factorization reused across predictions."""

    L: jnp.ndarray  # chol(Kxx + noise)
    alpha: jnp.ndarray  # (Kxx + noise)⁻¹ y
    xc: jnp.ndarray
    xk: jnp.ndarray
    mask: jnp.ndarray = None  # 0/1 row validity for bucket-padded data


@partial(jax.jit, static_argnums=0)
def posterior_cache(
    spec: GPSpec, params, xc, xk, y, jitter=DEFAULT_JITTER, mask=None, noise_mult=None
) -> PosteriorCache:
    L = cholesky_factor(spec, params, xc, xk, y.dtype, jitter, mask, noise_mult)
    y_eff = y if mask is None else y * mask
    alpha = jsl.cho_solve((L, True), y_eff)
    return PosteriorCache(L=L, alpha=alpha, xc=xc, xk=xk, mask=mask)


@partial(jax.jit, static_argnums=(0,), static_argnames=("with_noise",))
def predict_diag(spec: GPSpec, params, cache: PosteriorCache, xc_new, xk_new, with_noise=True):
    """Posterior mean and per-point variance at new points."""
    Ks = gram(spec, params, xc_new, xk_new, cache.xc, cache.xk)  # (M, N)
    if cache.mask is not None:
        Ks = Ks * cache.mask[None, :]
    mean = Ks @ cache.alpha
    V = jsl.solve_triangular(cache.L, Ks.T, lower=True)  # (N, M)
    var = gram_diag(spec, params, xc_new, xk_new) - jnp.sum(V * V, axis=0)
    var = jnp.maximum(var, 0.0)
    if with_noise:
        var = var + noise_diag(spec, params, xk_new, dtype=var.dtype)
    return mean, var


@partial(jax.jit, static_argnums=(0,), static_argnames=("level",))
def predict_diag_level(spec: GPSpec, params, cache: PosteriorCache, xc_new, xk_new, level):
    """Posterior mean/variance of ONE additive component at new points.

    For an additive model K = Σ_t K_t, the component-t posterior given the
    total-kernel factorization is

        mean_t = K_t(X*, X) α,      α = (K + noise)⁻¹ y
        var_t  = diag K_t(X*, X*) − diag(K_t(X*, X) (K + noise)⁻¹ K_t(X, X*))

    — standard additive-GP decomposition (solves stay against the TOTAL
    cache; only the cross/prior covariances restrict to the term). ``level``
    is the term suffix ('total' = the global continuous term in an additive
    model; a categorical dim name = that dim's component). Observation noise
    never applies to a component. The reference declares this path
    NotImplemented (reference gumbi/regression/pymc/GP.py:841).
    """
    from .kernels import _term_diag, _term_gram

    term = {t.suffix: t for t in spec.terms}[level]
    Ks = _term_gram(spec, term, params, xc_new, xk_new, cache.xc, cache.xk)
    if cache.mask is not None:
        Ks = Ks * cache.mask[None, :]
    mean = Ks @ cache.alpha
    V = jsl.solve_triangular(cache.L, Ks.T, lower=True)
    var = _term_diag(spec, term, params, xc_new, xk_new) - jnp.sum(V * V, axis=0)
    return mean, jnp.maximum(var, 0.0)


def predict_diag_chunked(
    spec: GPSpec, params, cache: PosteriorCache, xc_new, xk_new, with_noise=True, chunk=4096
):
    """Chunked grid prediction: bounds peak memory to chunk×N cross-Grams.

    Host loop over equal-shape chunks (one compile) plus one remainder chunk;
    used automatically for very large prediction grids.
    """
    m = xc_new.shape[0]
    if m <= chunk:
        return predict_diag(spec, params, cache, xc_new, xk_new, with_noise=with_noise)
    means, vars_ = [], []
    full = (m // chunk) * chunk
    for start in range(0, full, chunk):
        mu, v = predict_diag(
            spec, params, cache,
            xc_new[start : start + chunk], xk_new[start : start + chunk],
            with_noise=with_noise,
        )
        means.append(mu)
        vars_.append(v)
    if full < m:
        mu, v = predict_diag(
            spec, params, cache, xc_new[full:], xk_new[full:], with_noise=with_noise
        )
        means.append(mu)
        vars_.append(v)
    return jnp.concatenate(means), jnp.concatenate(vars_)


@partial(jax.jit, static_argnums=(0,), static_argnames=("level",))
def predict_cov_level(spec: GPSpec, params, cache: PosteriorCache, xc_new, xk_new, level):
    """Posterior mean and FULL covariance of one additive component.

    Same decomposition as :func:`predict_diag_level` (solves against the
    total-kernel cache, covariances restricted to the term), but returning
    the joint covariance so sublevel function draws are exact — the engine
    behind ``draw_point_samples(additive_level=...)`` (reference semantics:
    ``gp_dict[additive_level].conditional``, reference
    gumbi/regression/pymc/GP.py:915-916).
    """
    from .kernels import _term_gram

    term = {t.suffix: t for t in spec.terms}[level]
    Ks = _term_gram(spec, term, params, xc_new, xk_new, cache.xc, cache.xk)
    if cache.mask is not None:
        Ks = Ks * cache.mask[None, :]
    mean = Ks @ cache.alpha
    V = jsl.solve_triangular(cache.L, Ks.T, lower=True)
    Kss = _term_gram(spec, term, params, xc_new, xk_new, xc_new, xk_new)
    return mean, Kss - V.T @ V


@partial(jax.jit, static_argnums=(0,), static_argnames=("with_noise",))
def predict_cov(spec: GPSpec, params, cache: PosteriorCache, xc_new, xk_new, with_noise=False):
    """Posterior mean and full covariance at new points (for joint sampling)."""
    Ks = gram(spec, params, xc_new, xk_new, cache.xc, cache.xk)
    if cache.mask is not None:
        Ks = Ks * cache.mask[None, :]
    mean = Ks @ cache.alpha
    V = jsl.solve_triangular(cache.L, Ks.T, lower=True)
    Kss = gram(spec, params, xc_new, xk_new, xc_new, xk_new)
    cov = Kss - V.T @ V
    if with_noise:
        cov = cov + jnp.diag(noise_diag(spec, params, xk_new, dtype=cov.dtype))
    return mean, cov


@partial(jax.jit, static_argnums=(0,), static_argnames=("n_samples", "with_noise", "level"))
def draw_samples(
    spec: GPSpec,
    params,
    cache: PosteriorCache,
    xc_new,
    xk_new,
    key,
    n_samples=1,
    with_noise=False,
    jitter=DEFAULT_JITTER,
    level=None,
):
    """Joint posterior draws at new points (replaces gp.conditional +
    pm.sample_posterior_predictive, reference GP.py:861-979). ``level``
    draws from one additive component's conditional (reference
    ``additive_level``); components carry no observation noise."""
    if level is not None:
        mean, cov = predict_cov_level(spec, params, cache, xc_new, xk_new, level=level)
    else:
        mean, cov = predict_cov(spec, params, cache, xc_new, xk_new, with_noise=with_noise)
    cov = cov + jitter * jnp.eye(cov.shape[0], dtype=cov.dtype)
    Lss = jnp.linalg.cholesky(cov)
    eps = jax.random.normal(key, (n_samples, mean.shape[0]), dtype=mean.dtype)
    return mean[None, :] + eps @ Lss.T
