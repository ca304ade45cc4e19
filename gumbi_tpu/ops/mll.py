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

__all__ = [
    "mll",
    "map_neg_logp",
    "map_neg_logp_blocked",
    "blocked_gaussian_logp",
    "cholesky_factor",
    "DEFAULT_JITTER",
]

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


# ------------------------------------------------------------------
# Blocked backward for f64 at scale.
#
# The standard VJP (ops/linalg.py) materializes A⁻¹, ααᵀ, and the full K̄
# before feeding the Gram's backward — ~5 live N² buffers. Under emulated
# f64 on TPU that OOMs at N=8,192 (20.5 GB measured, r3). This variant
# rebuilds K̄ one column panel at a time (the same panel trick as the
# distributed backward, parallel/blocked.py) and pushes each panel through
# the Gram's VJP immediately, so the backward holds only L, α, and O(N·b)
# panel temps: f64 value+grad fits where only the value did before.
# ------------------------------------------------------------------


def _pick_panel(n: int) -> int:
    for b in (2048, 1024, 512, 256, 128):
        if n % b == 0:
            return b
    return 0  # no clean divisor: caller falls back to the dense backward


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def blocked_gaussian_logp(spec: GPSpec, panel: int, params, xc, xk, y, jitter):
    """log N(y | 0, K + σ²I + jitter·I) with a panel-wise backward.

    Same value as :func:`mll` (mask-free, homoskedastic case); the backward
    never materializes an (N, N) cotangent. ``panel`` must divide N.
    """
    Kn = gram(spec, params, xc, xk, xc, xk)
    d = noise_diag(spec, params, xk, dtype=Kn.dtype) + jitter
    L = jnp.linalg.cholesky(Kn + jnp.diag(d))
    w = jax.scipy.linalg.solve_triangular(L, y[:, None], lower=True)[:, 0]
    n = y.shape[0]
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    return -0.5 * (jnp.sum(w * w) + logdet + n * jnp.log(2.0 * jnp.pi))


def _blocked_logp_fwd(spec, panel, params, xc, xk, y, jitter):
    Kn = gram(spec, params, xc, xk, xc, xk)
    d = noise_diag(spec, params, xk, dtype=Kn.dtype) + jitter
    L = jnp.linalg.cholesky(Kn + jnp.diag(d))
    alpha = jax.scipy.linalg.cho_solve((L, True), y[:, None])[:, 0]
    n = y.shape[0]
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    logp = -0.5 * (jnp.sum(y * alpha) + logdet + n * jnp.log(2.0 * jnp.pi))
    return logp, (params, xc, xk, y, L, alpha)


def _blocked_logp_bwd(spec, panel, res, g):
    import numpy as np

    params, xc, xk, y, L, alpha = res
    n = xc.shape[0]
    b = panel
    n_panels = n // b
    dt = L.dtype

    def gram_panel(p, xfull, j):
        """K(X, X_J) for column block J — vjp gives θ̄ and both x̄ pieces."""
        xJ = jax.lax.dynamic_slice_in_dim(xfull, j * b, b)
        kJ = jax.lax.dynamic_slice_in_dim(xk, j * b, b)
        return gram(spec, p, xfull, xk, xJ, kJ)

    row_i = jax.lax.broadcasted_iota(jnp.int32, (n, b), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (n, b), 1)

    def one_panel(carry, j):
        params_bar, xc_bar, diag_bar = carry
        # E_J = I[:, Jb:(J+1)b] without materializing an (N, N) identity
        E = (row_i == j * b + col_i).astype(dt)
        X = jax.scipy.linalg.solve_triangular(L, E, lower=True)
        AinvJ = jax.scipy.linalg.solve_triangular(L.T, X, lower=False)
        aJ = jax.lax.dynamic_slice_in_dim(alpha, j * b, b)
        Kbar_J = (0.5 * g) * (alpha[:, None] * aJ[None, :] - AinvJ)
        _, vjp = jax.vjp(lambda p, x: gram_panel(p, x, j), params, xc)
        pb, xb = vjp(Kbar_J)
        params_bar = jax.tree_util.tree_map(jnp.add, params_bar, pb)
        xc_bar = xc_bar + xb
        # diagonal of K̄ restricted to this panel → noise cotangent rows
        dJ = jnp.sum(Kbar_J * E, axis=0)
        diag_bar = jax.lax.dynamic_update_slice_in_dim(diag_bar, dJ, j * b, axis=0)
        return (params_bar, xc_bar, diag_bar), None

    params_bar0 = jax.tree_util.tree_map(jnp.zeros_like, params)
    carry0 = (params_bar0, jnp.zeros_like(xc), jnp.zeros(n, dt))
    (params_bar, xc_bar, diag_bar), _ = jax.lax.scan(
        jax.checkpoint(one_panel), carry0, jnp.arange(n_panels)
    )

    # noise diag: d = σ² (+ coreg factors) — push diag cotangent through it
    _, nvjp = jax.vjp(lambda p: noise_diag(spec, p, xk, dtype=dt), params)
    (npb,) = nvjp(diag_bar)
    params_bar = jax.tree_util.tree_map(jnp.add, params_bar, npb)

    y_bar = -g * alpha
    xk_bar = np.zeros(xk.shape, dtype=jax.dtypes.float0)
    jitter_bar = jnp.zeros((), dt)
    return params_bar, xc_bar, xk_bar, y_bar, jitter_bar


blocked_gaussian_logp.defvjp(_blocked_logp_fwd, _blocked_logp_bwd)


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


def map_neg_logp_blocked(
    spec: GPSpec, uparams, xc, xk, y, ls_alpha, ls_beta,
    jitter=DEFAULT_JITTER, panel=None,
):
    """:func:`map_neg_logp` with the panel-wise backward — f64 at scale.

    Same value as the dense objective (mask-free homoskedastic case); the
    gradient flows through :func:`blocked_gaussian_logp`, which never holds
    an (N, N) cotangent, so f64 value+grad fits on one chip at N ≥ 8,192
    where the dense VJP OOMs (20.5 GB measured at 8,192, round 3). ``panel``
    must divide N; by default the largest clean divisor ≤ 2048 is picked,
    falling back to the dense backward when none exists.
    """
    if panel is None:
        panel = _pick_panel(int(y.shape[0]))
    if panel <= 0:
        return map_neg_logp(spec, uparams, xc, xk, y, ls_alpha, ls_beta, jitter)
    params = constrain(uparams)
    data_logp = blocked_gaussian_logp(spec, int(panel), params, xc, xk, y, jitter)
    total = data_logp + log_prior(spec, uparams, ls_alpha, ls_beta)
    return jnp.where(jnp.isfinite(total), -total, jnp.inf)
