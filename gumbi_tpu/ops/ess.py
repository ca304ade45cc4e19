"""Full-Bayes latent GP classification: elliptical slice sampling + MH hypers.

The reference's classifier sampled the *joint* posterior over the latent
field and the hyperparameters with NUTS (reference
gumbi/regression/pymc/extras.py:36-43); the round-2 rebuild marginalized the
latents through the Laplace approximation. This module closes that gap with
the TPU-native composition:

* **Latents | hypers** — elliptical slice sampling (Murray, Adams &
  MacKay 2010) on the whitened field ν (f = L ν, L = chol(K(θ))): an exact,
  tuning-free conditional sampler whose inner bracket-shrink loop is a plain
  ``lax.while_loop`` over one (N,) GEMV per trial. No gradients, so the
  Cholesky is never differentiated.
* **Hypers | latents** — random-walk Metropolis in unconstrained space on
  the whitened target  log p(u) + log lik(L(u) ν)  (Murray & Adams 2010's
  whitened parameterization: reparameterizing by ν decouples θ from the
  Gaussian prior term, so only a forward Cholesky per proposal is needed).
  Step size adapts during tuning by Robbins-Monro toward the target
  acceptance rate.

Everything compiles to one XLA program per (spec, shapes): the whole
(tune + draws) chain is a single ``lax.scan``, chains are vmapped.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .kernels import GPSpec, gram, gram_diag
from .mll import DEFAULT_JITTER
from .priors import constrain, log_prior

__all__ = ["ess_gpc_sample", "bernoulli_loglik", "latent_conditional_proba"]


def bernoulli_loglik(f, y, mask=None):
    """Σ log Bernoulli(y | sigmoid(f)) = Σ [y·f − softplus(f)].

    ``mask`` (0/1 per row) excludes bucket-padded rows: a masked row
    contributes zero likelihood, so its latent is sampled from the prior
    conditional — exactly the marginal the unpadded model would give.
    """
    ll = y * f - jax.nn.softplus(f)
    if mask is not None:
        ll = mask * ll
    return jnp.sum(ll)


def _chol_K(spec: GPSpec, uparams, xc, xk, jitter):
    params = constrain(uparams)
    K = gram(spec, params, xc, xk, xc, xk)
    return jnp.linalg.cholesky(K + jitter * jnp.eye(K.shape[0], dtype=K.dtype))


def _ess_step(key, nu, L, y, loglik):
    """One elliptical-slice update of the whitened latents ν given L.

    Operates on ν directly: f = L ν is N(0, K) for ν ~ N(0, I), and the
    ellipse ν' = ν cos ε + z sin ε preserves the prior exactly, so the
    slice condition only involves the likelihood.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    z = jax.random.normal(k1, nu.shape, dtype=nu.dtype)

    def safe_loglik(f):
        # NaN from a non-finite L (non-PD gram at this state) must read as
        # -inf: NaN comparisons are all-False, which would otherwise make
        # the shrink loop spin forever on device.
        v = loglik(f, y)
        return jnp.where(jnp.isfinite(v), v, -jnp.inf)

    log_y = safe_loglik(L @ nu) + jnp.log(jax.random.uniform(k2, dtype=nu.dtype))
    theta = jax.random.uniform(k3, dtype=nu.dtype) * (2.0 * jnp.pi)
    lo, hi = theta - 2.0 * jnp.pi, theta

    def proposal(t):
        return nu * jnp.cos(t) + z * jnp.sin(t)

    def trial(state):
        t, lo, hi, key, _, i = state
        ok = safe_loglik(L @ proposal(t)) > log_y
        # On rejection, shrink the bracket toward 0 and redraw the angle.
        lo = jnp.where(ok | (t >= 0), lo, t)
        hi = jnp.where(ok | (t < 0), hi, t)
        key, sub = jax.random.split(key)
        t_new = jax.random.uniform(sub, dtype=nu.dtype) * (hi - lo) + lo
        return (jnp.where(ok, t, t_new), lo, hi, key, ok, i + 1)

    # First trial at the initial angle, then shrink until accepted. ESS
    # accepts in finitely many steps (the bracket always contains t=0,
    # where the proposal equals the current state and passes the slice) —
    # EXCEPT when the likelihood is -inf everywhere (non-finite L): then no
    # angle can pass, so a trial bound backstops the loop and the step
    # degrades to a no-op (t=0 keeps the current state).
    state = trial((theta, lo, hi, k4, False, jnp.int32(0)))
    t, _, _, _, accepted, _ = jax.lax.while_loop(
        lambda s: (~s[4]) & (s[5] < 200), trial, state
    )
    t = jnp.where(accepted, t, jnp.zeros_like(t))
    return proposal(t)


@partial(
    jax.jit,
    static_argnums=0,
    static_argnames=("draws", "tune", "chains", "ess_sweeps", "target_accept"),
)
def ess_gpc_sample(
    spec: GPSpec,
    u0,
    xc,
    xk,
    y,
    ls_alpha,
    ls_beta,
    key,
    draws=500,
    tune=500,
    chains=2,
    ess_sweeps=4,
    target_accept=0.3,
    jitter=DEFAULT_JITTER,
    mask=None,
):
    """Sample the joint (latents, hyperparameters) posterior of the GPC.

    ``u0``: dict of unconstrained starting hyperparameters. Returns
    ``(usamples, f_samples, stats)``: unconstrained hyperparameter draws with
    leading (chains, draws) axes, latent function values at the training
    points f = L ν with shape (chains, draws, N), and acceptance / step-size
    diagnostics for the MH hyper kernel.
    """
    if not isinstance(u0, dict):
        raise TypeError("u0 must be a dict of arrays")
    n = y.shape[0]
    dtype = xc.dtype
    y = y.astype(dtype)
    if mask is not None:
        mask = jnp.asarray(mask, dtype=dtype)

    def loglik(f, y):
        return bernoulli_loglik(f, y, mask)

    # Flat <-> dict packing (dict key order; all indices static)
    names = sorted(u0.keys())
    shapes = {k: u0[k].shape for k in names}
    sizes = {k: int(np.prod(shapes[k], dtype=int)) for k in names}
    offsets = dict(zip(names, np.cumsum([0] + [sizes[k] for k in names])[:-1]))
    d_hyp = int(sum(sizes.values()))

    def flat_to_tree(v):
        return {
            k: v[offsets[k] : offsets[k] + sizes[k]].reshape(shapes[k]) for k in names
        }

    u0_flat = jnp.concatenate([jnp.ravel(u0[k]) for k in names]).astype(dtype)

    def chol_flat(uflat):
        return _chol_K(spec, flat_to_tree(uflat), xc, xk, jitter)

    def target_with_L(uflat, nu, L):
        """Whitened conditional target at an already-factorized state
        (NaN → -inf so non-PD proposals are always rejected)."""
        val = log_prior(spec, flat_to_tree(uflat), ls_alpha, ls_beta) + loglik(
            L @ nu, y
        )
        return jnp.where(jnp.isfinite(val), val, -jnp.inf)

    def target_given_nu(uflat, nu):
        L = chol_flat(uflat)
        return target_with_L(uflat, nu, L), L

    def one_chain(key, u_init):
        key, k_nu = jax.random.split(key)
        nu_init = jax.random.normal(k_nu, (n,), dtype=dtype)
        L_init = chol_flat(u_init)

        def step(carry, it):
            u, nu, L, log_step, key = carry
            # --- latent sweeps (ESS, exact conditional, unrolled) ---
            key, *ks = jax.random.split(key, ess_sweeps + 1)
            for k in ks:
                nu = _ess_step(k, nu, L, y, loglik)

            # --- hyper move (random-walk MH on the whitened target) ---
            # The current state's factor L is already in the carry — only the
            # PROPOSAL pays an O(N³) factorization per step.
            t_cur = target_with_L(u, nu, L)
            key, k_prop, k_acc = jax.random.split(key, 3)
            u_prop = u + jnp.exp(log_step) * jax.random.normal(
                k_prop, (d_hyp,), dtype=dtype
            )
            t_prop, L_prop = target_given_nu(u_prop, nu)
            # -inf − -inf = NaN would poison the Robbins-Monro step size and
            # every subsequent proposal; treat it as a rejection.
            log_alpha = t_prop - t_cur
            log_alpha = jnp.where(jnp.isnan(log_alpha), -jnp.inf, log_alpha)
            accept_prob = jnp.exp(jnp.minimum(log_alpha, 0.0))
            ok = jnp.log(jax.random.uniform(k_acc, dtype=dtype)) < log_alpha
            u = jnp.where(ok, u_prop, u)
            L = jnp.where(ok, L_prop, L)

            # Robbins-Monro step-size adaptation during tuning only
            in_tune = it < tune
            lr = 1.0 / jnp.sqrt(1.0 + it.astype(dtype))
            log_step = log_step + jnp.where(
                in_tune, lr * (accept_prob - target_accept), 0.0
            )

            return (u, nu, L, log_step, key), (u, L @ nu, accept_prob)

        carry0 = (u_init, nu_init, L_init, jnp.asarray(-1.0, dtype), key)
        carry, (us, fs, accepts) = jax.lax.scan(step, carry0, jnp.arange(tune + draws))
        return (
            us[tune:],
            fs[tune:],
            {"accept_rate": jnp.mean(accepts[tune:]), "step_size": jnp.exp(carry[3])},
        )

    keys = jax.random.split(key, chains)
    u_inits = jnp.broadcast_to(u0_flat, (chains, d_hyp)) + 0.05 * jax.random.normal(
        jax.random.fold_in(key, 7), (chains, d_hyp), dtype=dtype
    )
    us, fs, stats = jax.vmap(one_chain)(keys, u_inits)

    usamples = {
        k: us[..., offsets[k] : offsets[k] + sizes[k]].reshape(us.shape[:2] + shapes[k])
        for k in names
    }
    return usamples, fs, stats


@partial(jax.jit, static_argnums=0)
def latent_conditional_proba(
    spec: GPSpec, params_stack, f_stack, xc, xk, xc_new, xk_new, jitter=DEFAULT_JITTER
):
    """P(y=1 | x*) integrated over joint (θ, f) posterior draws.

    For each draw i: condition the GP at θᵢ on the sampled latent values fᵢ
    (exact Gaussian conditional — the f* marginals are all the Bernoulli
    expectation needs) and push the marginal (μ*, σ*²) through the probit
    approximation to the logistic-Gaussian integral. The average over draws
    is the full-Bayes class probability (reference semantics:
    gp.conditional + sample_posterior_predictive, ref GP.py:924-979).

    ``params_stack``: dict of *natural-space* parameter arrays with a
    leading draw axis; ``f_stack``: (S, N) latent draws. Returns (M,)
    averaged probabilities. Each draw pays one N×N Cholesky — subsample the
    trace before calling.
    """
    import jax.scipy.linalg as jsl

    eye = jnp.eye(xc.shape[0], dtype=xc.dtype)

    def one(carry, pf):
        params, f = pf
        K = gram(spec, params, xc, xk, xc, xk) + jitter * eye
        L = jnp.linalg.cholesky(K)
        alpha = jsl.cho_solve((L, True), f)
        Ks = gram(spec, params, xc_new, xk_new, xc, xk)  # (M, N)
        mean = Ks @ alpha
        V = jsl.solve_triangular(L, Ks.T, lower=True)
        var = jnp.maximum(
            gram_diag(spec, params, xc_new, xk_new) - jnp.sum(V * V, axis=0), 0.0
        )
        # Probit approximation: E[sigmoid(f*)] ≈ sigmoid(μ/√(1 + πσ²/8))
        p = jax.nn.sigmoid(mean / jnp.sqrt(1.0 + jnp.pi * var / 8.0))
        return carry, p

    _, probs = jax.lax.scan(one, 0, (params_stack, f_stack))
    return jnp.mean(probs, axis=0)
