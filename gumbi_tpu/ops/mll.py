"""Marginal log-likelihood and MAP objective for the JAX GP engine.

The hot path is the N×N Gram assembly + Cholesky factorization; both run as
single fused XLA computations (MXU matmuls for the distance matrices, XLA's
blocked TPU Cholesky), with a Pallas fast path for large N supplied by
``gumbi_tpu.ops.pallas_kernels``. Gradients of the MLL flow through the
hand-derived custom-VJP primitives in ``ops/linalg.py`` (∂logp/∂K =
½(ααᵀ − K⁻¹)) — the Cholesky itself is never differentiated, which keeps
vmapped multi-restart compilation tractable on TPU.

Replaces the reference's PyTensor-compiled ``gp.marginal_likelihood`` +
``pm.find_MAP`` machinery (reference gumbi/regression/pymc/GP.py:554-583,
:799-813).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .kernels import GPSpec, gram, noise_diag
from .linalg import quad_and_logdet
from .priors import constrain, log_prior

__all__ = ["mll", "map_neg_logp", "cholesky_factor", "DEFAULT_JITTER"]

# PyMC stabilizes marginal covariances with an implicit 1e-6 jitter
# (pm.gp.util.stabilize); we match it.
DEFAULT_JITTER = 1e-6


def _noisy_gram(
    spec: GPSpec, params, xc, xk, jitter=DEFAULT_JITTER, mask=None, noise_mult=None
):
    """K(X, X) + noise·I (+ jitter), with masked rows as identity rows.

    ``mask`` (0/1 per row, optional) supports bucket-padded data: masked-out
    rows become unit-diagonal identity rows, contributing exactly zero to the
    quadratic form and log-determinant, so a padded problem's MLL equals the
    unpadded one. Bucketing keeps array shapes static as datasets grow
    (lab-loop refits reuse the compiled program instead of recompiling).

    ``noise_mult`` (positive per-row factor, optional) scales the observation
    noise variance per point — the mechanism behind heteroskedastic inputs
    (input-dependent noise; the reference declares this NotImplemented,
    ref gumbi/regression/pymc/GP.py:518-519). The learnable σ² remains the
    global scale; ``noise_mult`` carries the location-dependent shape.
    """
    K = gram(spec, params, xc, xk, xc, xk)
    d = noise_diag(spec, params, xk, dtype=K.dtype)
    if noise_mult is not None:
        d = d * noise_mult
    d = d + jitter
    if mask is not None:
        K = K * (mask[:, None] * mask[None, :])
        d = mask * d + (1.0 - mask)
    return K + jnp.diag(d)


def cholesky_factor(
    spec: GPSpec, params, xc, xk, y_dtype, jitter=DEFAULT_JITTER, mask=None, noise_mult=None
):
    """Cholesky of K(X, X) + noise·I (+ jitter); see :func:`_noisy_gram`."""
    return jnp.linalg.cholesky(_noisy_gram(spec, params, xc, xk, jitter, mask, noise_mult))


def _gaussian_logp_from_K(Kn, y, mask=None):
    """log N(y | 0, Kn) through the custom-VJP quad/logdet primitive.

    Gradients w.r.t. Kn (and hence the hyperparameters) use the analytic
    identity ∂logp/∂K = ½(ααᵀ − K⁻¹) — the Cholesky itself is never
    differentiated, which keeps vmapped (multi-restart) compilation sane on
    TPU (see ops/linalg.py).
    """
    if mask is not None:
        y = y * mask
        n = jnp.sum(mask)
    else:
        n = y.shape[0]
    quad, logdet = quad_and_logdet(Kn, y)
    return -0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi))


@partial(jax.jit, static_argnums=0)
def mll(spec: GPSpec, params, xc, xk, y, jitter=DEFAULT_JITTER, mask=None, noise_mult=None):
    """Gaussian marginal log-likelihood log p(y | X, θ)."""
    Kn = _noisy_gram(spec, params, xc, xk, jitter, mask, noise_mult)
    return _gaussian_logp_from_K(Kn, y, mask)


def map_neg_logp(
    spec: GPSpec, uparams, xc, xk, y, ls_alpha, ls_beta, jitter=DEFAULT_JITTER, mask=None,
    noise_mult=None,
):
    """Negative joint log-density −[log p(y|θ) + log p(θ)] in unconstrained space.

    NaN/Inf Cholesky failures surface as +inf so line searches back off
    rather than stepping into invalid regions.
    """
    params = constrain(uparams)
    Kn = _noisy_gram(spec, params, xc, xk, jitter, mask, noise_mult)
    data_logp = _gaussian_logp_from_K(Kn, y, mask)
    total = data_logp + log_prior(spec, uparams, ls_alpha, ls_beta)
    return jnp.where(jnp.isfinite(total), -total, jnp.inf)
