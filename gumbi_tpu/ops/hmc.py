"""Full-Bayes hyperparameter sampling: adaptive HMC, vmapped over chains.

Replaces the reference's ``pm.sample`` (NUTS) path (reference
gumbi/regression/pymc/GP.py:815-835) for the hyperparameter posterior. The
sampler is Hamiltonian Monte Carlo with:

* dual-averaging step-size adaptation to a target acceptance rate,
* diagonal mass-matrix (Welford) adaptation during warmup,
* jittered step size per iteration (decorrelates trajectory lengths),
* chains vmapped on device — every chain runs in the same XLA program.

The whole warmup+sampling loop is one ``lax.scan`` — no Python per-iteration
overhead, which matters when every leapfrog step contains an N×N Cholesky.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

__all__ = ["hmc_sample"]


class _DAState(NamedTuple):
    log_eps: jnp.ndarray
    log_eps_bar: jnp.ndarray
    h_bar: jnp.ndarray
    mu: jnp.ndarray


def _leapfrog(grad_fn, q, p, eps, inv_mass, n_steps):
    def body(_, state):
        q, p = state
        p = p + 0.5 * eps * grad_fn(q)
        q = q + eps * inv_mass * p
        p = p + 0.5 * eps * grad_fn(q)
        return q, p

    return jax.lax.fori_loop(0, n_steps, body, (q, p))


def hmc_sample(
    logp_fn,
    q0,
    key,
    draws=500,
    tune=500,
    n_leapfrog=32,
    target_accept=0.8,
    chains=2,
    jitter=0.2,
):
    """Sample from exp(logp_fn) starting at pytree ``q0``.

    Returns (samples_pytree with leading (chains, draws) axes, stats dict).
    """
    q0_flat, unravel = ravel_pytree(q0)
    dim = q0_flat.shape[0]

    def logp_flat(q):
        return logp_fn(unravel(q))

    grad_fn = jax.grad(logp_flat)

    def one_chain(key, q_init):
        def da_init(eps0):
            return _DAState(
                log_eps=jnp.log(eps0),
                log_eps_bar=jnp.asarray(0.0, dtype=q_init.dtype),
                h_bar=jnp.asarray(0.0, dtype=q_init.dtype),
                mu=jnp.log(10.0 * eps0),
            )

        def da_update(state, accept_prob, t):
            # Nesterov dual averaging (Hoffman & Gelman 2014, eq. 6)
            t = t + 1.0
            kappa, gamma, t0 = 0.75, 0.05, 10.0
            h_bar = (1.0 - 1.0 / (t + t0)) * state.h_bar + (
                target_accept - accept_prob
            ) / (t + t0)
            log_eps = state.mu - jnp.sqrt(t) / gamma * h_bar
            w = t ** (-kappa)
            log_eps_bar = w * log_eps + (1.0 - w) * state.log_eps_bar
            return _DAState(log_eps, log_eps_bar, h_bar, state.mu)

        def step(carry, inp):
            q, da, welford, t, key, tuning = carry
            key, k1, k2, k3 = jax.random.split(key, 4)

            mean, m2, count = welford
            var_est = jnp.where(count > 2, m2 / jnp.maximum(count - 1, 1), jnp.ones(dim, q.dtype))
            inv_mass = var_est
            mass_sqrt = 1.0 / jnp.sqrt(inv_mass)

            eps = jnp.exp(jnp.where(tuning, da.log_eps, da.log_eps_bar))
            # Downward-only jitter: decorrelates trajectory lengths without
            # the acceptance collapse a symmetric jitter causes (acceptance
            # falls off sharply for eps above the adapted value).
            eps = eps * (1.0 - jitter * jax.random.uniform(k3, dtype=q.dtype))

            p = jax.random.normal(k1, (dim,), dtype=q.dtype) * mass_sqrt
            current_logp = logp_flat(q)
            current_h = current_logp - 0.5 * jnp.sum(p * p * inv_mass)

            q_new, p_new = _leapfrog(grad_fn, q, p, eps, inv_mass, n_leapfrog)
            new_logp = logp_flat(q_new)
            new_h = new_logp - 0.5 * jnp.sum(p_new * p_new * inv_mass)

            log_accept = jnp.minimum(new_h - current_h, 0.0)
            log_accept = jnp.where(jnp.isfinite(log_accept), log_accept, -jnp.inf)
            accept = jnp.log(jax.random.uniform(k2, dtype=q.dtype)) < log_accept
            q = jnp.where(accept, q_new, q)
            accept_prob = jnp.exp(log_accept)

            da = jax.tree_util.tree_map(
                lambda new, old: jnp.where(tuning, new, old), da_update(da, accept_prob, t), da
            )
            # Welford mass update during tuning only
            count_new = count + 1.0
            delta = q - mean
            mean_new = mean + delta / count_new
            m2_new = m2 + delta * (q - mean_new)
            welford = jax.tree_util.tree_map(
                lambda new, old: jnp.where(tuning, new, old),
                (mean_new, m2_new, count_new),
                welford,
            )
            return (q, da, welford, t + 1.0, key, tuning), (q, accept_prob)

        # Crude initial step size from dimension
        eps0 = jnp.asarray(0.1, dtype=q_init.dtype) / dim**0.25
        da = da_init(eps0)
        welford = (jnp.zeros(dim, q_init.dtype), jnp.zeros(dim, q_init.dtype), jnp.asarray(0.0, q_init.dtype))

        carry = (q_init, da, welford, jnp.asarray(0.0, q_init.dtype), key, jnp.asarray(True))
        carry, _ = jax.lax.scan(step, carry, None, length=tune)
        q, da, welford, t, key, _ = carry
        carry = (q, da, welford, jnp.asarray(0.0, q_init.dtype), key, jnp.asarray(False))
        carry, (qs, accept_probs) = jax.lax.scan(step, carry, None, length=draws)
        return qs, accept_probs

    keys = jax.random.split(key, chains)
    q_inits = jnp.broadcast_to(q0_flat, (chains, dim)) + 0.01 * jax.random.normal(
        jax.random.fold_in(key, 1), (chains, dim), dtype=q0_flat.dtype
    )
    qs, accept_probs = jax.vmap(one_chain)(keys, q_inits)  # (chains, draws, dim)

    samples = jax.vmap(jax.vmap(unravel))(qs)
    stats = {"accept_prob": accept_probs, "mean_accept": jnp.mean(accept_probs)}
    return samples, stats
