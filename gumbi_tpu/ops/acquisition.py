"""Bayesian-optimization acquisitions, optimized on-device.

JAX replacement for the reference's BoTorch acquisition stack (reference
gumbi/regression/botorch/GP.py:652-780): Sobol QMC base samples, closed-form
EI/UCB, smoothed qLogNEI (joint MC over candidates + baseline), an exact-2D
qNEHVI-style hypervolume improvement, and acquisition maximization by the same
vmapped multi-restart L-BFGS used for fitting — with box constraints enforced
by a sigmoid reparameterization so the optimizer stays unconstrained and
jit-compiled end to end.
"""

from __future__ import annotations

from functools import partial

import numpy as np
from scipy.stats import norm as _scipy_norm
from scipy.stats import qmc as _scipy_qmc

import jax
import jax.numpy as jnp

from .kernels import GPSpec
from .mll import DEFAULT_JITTER
from .optimize import multi_restart_minimize
from .posterior import PosteriorCache, predict_cov

__all__ = [
    "sobol_normal",
    "sobol_uniform",
    "expected_improvement",
    "upper_confidence_bound",
    "qlog_nei",
    "qlog_nehvi_2d",
    "qlog_nehvi_mc",
    "hv_dominated_mc",
    "optimize_acqf",
    "optimize_qlog_nei",
]


def sobol_uniform(n: int, d: int, seed: int = 0) -> np.ndarray:
    """Scrambled Sobol points in [0, 1)^d (host-side QMC generation)."""
    eng = _scipy_qmc.Sobol(d=d, scramble=True, seed=seed)
    return eng.random(n)


def sobol_normal(n: int, d: int, seed: int = 0) -> np.ndarray:
    """Quasi-random standard-normal base samples via inverse-CDF of Sobol."""
    u = sobol_uniform(n, d, seed)
    return _scipy_norm.ppf(np.clip(u, 1e-12, 1 - 1e-12))


# ------------------------------------------------------------------
# Closed-form single-point acquisitions
# ------------------------------------------------------------------


def expected_improvement(mean, var, best, maximize=True, xi=0.0):
    """Analytic EI of a Gaussian posterior over the incumbent ``best``."""
    sd = jnp.sqrt(jnp.maximum(var, 1e-18))
    improve = (mean - best - xi) if maximize else (best - mean - xi)
    z = improve / sd
    pdf = jnp.exp(-0.5 * z**2) / jnp.sqrt(2 * jnp.pi)
    cdf = 0.5 * (1 + jax.scipy.special.erf(z / jnp.sqrt(2.0)))
    return improve * cdf + sd * pdf


def upper_confidence_bound(mean, var, beta=2.0, maximize=True):
    """UCB (or LCB when minimizing)."""
    sd = jnp.sqrt(jnp.maximum(var, 1e-18))
    return mean + beta * sd if maximize else -(mean - beta * sd)


# ------------------------------------------------------------------
# Monte-Carlo batch acquisitions over the joint posterior
# ------------------------------------------------------------------


def _joint_samples(spec, params, cache, xc_joint, xk_joint, base_samples, jitter=DEFAULT_JITTER):
    """Posterior draws at the stacked candidate+baseline points.

    base_samples: (S, P) standard normals (Sobol), P = number of joint points.
    """
    mean, cov = predict_cov(spec, params, cache, xc_joint, xk_joint, with_noise=False)
    cov = cov + jitter * jnp.eye(cov.shape[0], dtype=cov.dtype)
    L = jnp.linalg.cholesky(cov)
    return mean[None, :] + base_samples @ L.T  # (S, P)


def make_indep_sample_fn(spec, params_list, cache_list, out_col_idx, jitter=DEFAULT_JITTER):
    """Joint-posterior sampler for a model list (Independent structure).

    The joint covariance across outputs is block-diagonal — each output's
    rows are sampled from its own sub-model posterior (reference ModelListGP
    semantics, gumbi/regression/botorch/GP.py:253-267) with the cross-output
    blocks exactly zero. Row layout follows the qNEHVI convention:
    candidates output-major (d_out × q rows) then baseline output-major
    (d_out × nb rows); the output column is dropped from Xk before hitting
    the sub-model (whose coregs index the reduced Xk).
    """

    def sample_fn(xc_joint, xk_joint, base_samples, d_out, q, nb):
        n_cat = xk_joint.shape[1]
        keep_cols = [c for c in range(n_cat) if c != out_col_idx]
        ys = jnp.zeros(
            (base_samples.shape[0], xc_joint.shape[0]), dtype=xc_joint.dtype
        )
        for j in range(d_out):
            idx = jnp.concatenate(
                [
                    jnp.arange(j * q, (j + 1) * q),
                    jnp.arange(d_out * q + j * nb, d_out * q + (j + 1) * nb),
                ]
            )
            xc_j = xc_joint[idx]
            xk_j = (
                xk_joint[idx][:, jnp.asarray(keep_cols, dtype=jnp.int32)]
                if keep_cols
                else jnp.zeros((q + nb, 0), dtype=jnp.int32)
            )
            mean, cov = predict_cov(
                spec, params_list[j], cache_list[j], xc_j, xk_j, with_noise=False
            )
            L = jnp.linalg.cholesky(
                cov + jitter * jnp.eye(q + nb, dtype=cov.dtype)
            )
            ys = ys.at[:, idx].set(mean[None, :] + base_samples[:, idx] @ L.T)
        return ys

    return sample_fn


def _smooth_max(v, tau=1e-2, axis=-1):
    return tau * jax.scipy.special.logsumexp(v / tau, axis=axis)


def _softplus(x, beta=100.0):
    return jax.nn.softplus(beta * x) / beta


def qlog_nei(
    spec: GPSpec,
    params,
    cache: PosteriorCache,
    xc_cand,
    xk_cand,
    xc_base,
    xk_base,
    base_samples,
    maximize=True,
):
    """Smoothed log of q-Noisy Expected Improvement.

    Jointly samples candidates and baseline (so baseline noise is integrated
    out, as in qLogNEI), smooths the max/ReLU for gradient flow, and returns
    log E_s[improvement].
    """
    q = xc_cand.shape[0]
    xc_joint = jnp.concatenate([xc_cand, xc_base], axis=0)
    xk_joint = jnp.concatenate([xk_cand, xk_base], axis=0)
    ys = _joint_samples(spec, params, cache, xc_joint, xk_joint, base_samples)
    if not maximize:
        ys = -ys
    cand = ys[:, :q]
    base = ys[:, q:]
    improvement = _softplus(_smooth_max(cand) - _smooth_max(base))  # (S,)
    return jnp.log(jnp.mean(improvement) + 1e-25)


def _hv2d(points, ref):
    """Hypervolume (maximization) dominated by a 2-D point set over ``ref``.

    Sort by first objective descending; accumulate rectangles of the running
    maximum of the second objective. Dominated and below-reference points
    contribute zero automatically. Jit-friendly: fixed shapes, no Python
    control flow on values.
    """
    x = jnp.maximum(points[:, 0], ref[0])
    y = jnp.maximum(points[:, 1], ref[1])
    order = jnp.argsort(-x)
    xs = x[order]
    ys = y[order]
    # Running max of y over prefixes strictly before i → the "covered" height
    prev_cover = jnp.concatenate([jnp.array([ref[1]], dtype=ys.dtype), jax.lax.cummax(ys)[:-1]])
    heights = jnp.maximum(ys - prev_cover, 0.0)
    # Strip for point i extends from xs[i] down to ref, minus what later
    # (larger-x) points already covered: handled by pairing each point's
    # height increment with its own width from ref.
    widths = xs - ref[0]
    return jnp.sum(widths * heights)


def qlog_nehvi_2d(
    spec: GPSpec,
    params,
    cache: PosteriorCache,
    xc_cand,
    xk_cand_outputs,
    xc_base,
    xk_base_outputs,
    base_samples,
    ref_point,
    maximize=True,
    sample_fn=None,
):
    """Smoothed log of q-Noisy Expected Hypervolume Improvement (2 outputs).

    Candidate/baseline points are evaluated jointly for both outputs (the
    ``xk_*_outputs`` arrays carry the output-coregion index per row). Each MC
    sample computes HV(base ∪ cand) − HV(base) exactly in 2-D.
    ``sample_fn`` (from :func:`make_indep_sample_fn`) overrides the joint
    posterior sampler for model-list (Independent) structures.
    """
    q = xc_cand.shape[0] // 2
    nb = xc_base.shape[0] // 2
    xc_joint = jnp.concatenate([xc_cand, xc_base], axis=0)
    xk_joint = jnp.concatenate([xk_cand_outputs, xk_base_outputs], axis=0)
    if sample_fn is None:
        ys = _joint_samples(spec, params, cache, xc_joint, xk_joint, base_samples)
    else:
        ys = sample_fn(xc_joint, xk_joint, base_samples, 2, q, nb)
    if not maximize:
        ys = -ys

    ref = jnp.asarray(ref_point)

    def one_sample(row):
        cand = jnp.stack([row[:q], row[q : 2 * q]], axis=1)  # (q, 2)
        base = jnp.stack([row[2 * q : 2 * q + nb], row[2 * q + nb :]], axis=1)  # (nb, 2)
        hv_base = _hv2d(base, ref)
        hv_joint = _hv2d(jnp.concatenate([base, cand], axis=0), ref)
        return jnp.maximum(hv_joint - hv_base, 0.0)

    hvi = jax.vmap(one_sample)(ys)
    return jnp.log(jnp.mean(hvi) + 1e-25)


def hv_dominated_mc(points, ref, u_box):
    """QMC estimate of the hypervolume dominated by ``points`` above ``ref``.

    ``u_box``: (Q, D) fixed quasi-uniform points in [0, 1)^D, scaled into the
    [ref, max(points)] box; the estimate is vol(box) × fraction of box points
    dominated. Exact as Q → ∞ for any D, with O(P·Q·D) vectorized dominance
    tests instead of a combinatorial box decomposition — the TPU-native trade
    (VPU throughput for decomposition logic). Hard indicator: use for values
    and tests; the differentiable acquisition is :func:`qlog_nehvi_mc`.
    """
    ref = jnp.asarray(ref, dtype=points.dtype)
    upper = jnp.maximum(jnp.max(points, axis=0), ref)
    width = upper - ref
    U = ref[None, :] + u_box.astype(points.dtype) * width[None, :]  # (Q, D)
    dominated = jnp.any(jnp.all(points[:, None, :] >= U[None, :, :], axis=-1), axis=0)
    return jnp.prod(width) * jnp.mean(dominated)


def qlog_nehvi_mc(
    spec: GPSpec,
    params,
    cache: PosteriorCache,
    xc_cand,
    xk_cand_outputs,
    xc_base,
    xk_base_outputs,
    base_samples,
    ref_point,
    u_box,
    d_out,
    maximize=True,
    tau=0.02,
    sample_fn=None,
):
    """Smoothed log qNEHVI for ANY number of outputs via QMC box integration.

    Replaces the reference's qLogNoisyExpectedHypervolumeImprovement
    (reference gumbi/regression/botorch/GP.py:745-753, box-decomposition
    based) with a decomposition-free estimator. Per posterior sample:

        HVI = vol(box) · E_u[ 1{u not dominated by baseline} · s(u) ]

    where u ranges over fixed QMC points in the [ref, max] box, the baseline
    indicator is HARD (exact — it carries no candidate gradient anyway), and
    s(u) is a smoothed candidate-dominance (product-sigmoid per dim,
    probabilistic-OR over the q batch) so the acquisition is differentiable
    for L-BFGS. Common box points across HV(base∪cand) − HV(base) make the
    difference estimator low-variance; the whole thing is static-shape
    elementwise work that vectorizes over (samples × box points × points).

    Row layout matches :func:`qlog_nehvi_2d`: candidates output-major
    (D_out × q rows) then baseline output-major (D_out × nb rows).
    """
    q = xc_cand.shape[0] // d_out
    nb = xc_base.shape[0] // d_out
    xc_joint = jnp.concatenate([xc_cand, xc_base], axis=0)
    xk_joint = jnp.concatenate([xk_cand_outputs, xk_base_outputs], axis=0)
    if sample_fn is None:
        ys = _joint_samples(spec, params, cache, xc_joint, xk_joint, base_samples)
    else:
        ys = sample_fn(xc_joint, xk_joint, base_samples, d_out, q, nb)
    if not maximize:
        ys = -ys

    ref = jnp.asarray(ref_point, dtype=ys.dtype)
    u_box = jnp.asarray(u_box, dtype=ys.dtype)

    def one_sample(row):
        cand = row[: d_out * q].reshape(d_out, q).T  # (q, D)
        base = row[d_out * q :].reshape(d_out, nb).T  # (nb, D)
        upper = jnp.maximum(
            jnp.max(jnp.concatenate([cand, base], axis=0), axis=0), ref + 1e-9
        )
        width = upper - ref
        U = ref[None, :] + u_box * width[None, :]  # (Q, D)
        dom_base = jnp.any(
            jnp.all(base[:, None, :] >= U[None, :, :], axis=-1), axis=0
        )  # (Q,)
        t = tau * width + 1e-12
        s = jax.nn.sigmoid((cand[:, None, :] - U[None, :, :]) / t[None, None, :])
        p_dom = jnp.prod(s, axis=-1)  # (q, Q)
        soft_or = 1.0 - jnp.prod(1.0 - p_dom, axis=0)  # (Q,)
        frac = jnp.mean(jnp.where(dom_base, 0.0, soft_or))
        return jnp.prod(width) * frac

    hvi = jax.vmap(one_sample)(ys)
    return jnp.log(jnp.mean(hvi) + 1e-25)


# ------------------------------------------------------------------
# Acquisition maximization: Sobol seeding → top-k → sigmoid-reparameterized
# multi-restart L-BFGS, fully on device.
# ------------------------------------------------------------------


def _to_box(u, lo, hi):
    return lo + (hi - lo) * jax.nn.sigmoid(u)


def _from_box(x, lo, hi):
    p = jnp.clip((x - lo) / (hi - lo), 1e-6, 1 - 1e-6)
    return jnp.log(p) - jnp.log1p(-p)


def optimize_acqf(
    acq_fn,
    bounds,
    q=1,
    num_restarts=10,
    raw_samples=512,
    seed=0,
    maxiter=100,
    dtype=jnp.float64,
):
    """Maximize ``acq_fn(X)`` (X: (q, d) in natural box coords) over the box.

    Seeds with scrambled-Sobol raw samples, takes the best ``num_restarts``
    q-batches, then runs vmapped L-BFGS in sigmoid-space. Returns
    (candidates (q, d), acq_value).
    """
    lo = jnp.asarray(bounds[0], dtype=dtype)
    hi = jnp.asarray(bounds[1], dtype=dtype)
    d = lo.shape[0]

    raw = sobol_uniform(raw_samples * q, d, seed=seed).reshape(raw_samples, q, d)
    X_raw = jnp.asarray(raw, dtype=dtype) * (hi - lo) + lo

    raw_vals = jax.lax.map(acq_fn, X_raw)
    top = jnp.argsort(-raw_vals)[:num_restarts]
    X0 = X_raw[top]  # (R, q, d)

    def neg_acq_u(u):
        return -acq_fn(_to_box(u, lo, hi))

    u0s = _from_box(X0, lo, hi)
    u_best, f_best, _ = multi_restart_minimize(neg_acq_u, u0s, maxiter=maxiter)
    return _to_box(u_best, lo, hi), -f_best


@partial(
    jax.jit,
    static_argnums=(0,),
    static_argnames=("num_restarts", "maxiter", "maximize"),
)
def optimize_qlog_nei(
    spec,
    params,
    cache,
    xk_cand,
    xc_base,
    xk_base,
    base_samples,
    X_raw,
    lo,
    hi,
    num_restarts=10,
    maxiter=100,
    maximize=True,
):
    """Jitted qLogNEI maximization — the lab-loop fast path.

    Unlike :func:`optimize_acqf` (which closes over a per-call ``acq_fn`` and
    therefore retraces and recompiles at EVERY ``propose``), this module-level
    jit takes model state (params, posterior cache) and the Sobol raw starts
    as ARGUMENTS: a fit→propose→refit campaign with stable shapes (bucketed
    fit + padded baseline) compiles the acquisition program exactly once.
    Measured on the 20-round BO bench: 1006 s → the per-round cost drops to
    dispatch + runtime after round 1.
    """
    def acq(Xc):
        return qlog_nei(
            spec, params, cache, Xc, xk_cand, xc_base, xk_base, base_samples,
            maximize=maximize,
        )

    raw_vals = jax.lax.map(acq, X_raw)
    top = jnp.argsort(-raw_vals)[:num_restarts]
    X0 = X_raw[top]  # (R, q, d)

    def neg_acq_u(u):
        return -acq(_to_box(u, lo, hi))

    u0s = _from_box(X0, lo, hi)
    u_best, f_best, _ = multi_restart_minimize(neg_acq_u, u0s, maxiter=maxiter)
    return _to_box(u_best, lo, hi), -f_best
