"""Full-Bayes hyperparameter sampling: adaptive HMC and ChEES-HMC on device.

Replaces the reference's ``pm.sample`` (NUTS) path (reference
gumbi/regression/pymc/GP.py:815-835) for the hyperparameter posterior. Two
samplers, one contract:

:func:`hmc_sample` — Hamiltonian Monte Carlo with

* dual-averaging step-size adaptation to a target acceptance rate,
* diagonal mass-matrix (Welford) adaptation during warmup,
* jittered step size per iteration (decorrelates trajectory lengths),
* chains vmapped on device — every chain runs in the same XLA program,
* a fixed ``n_leapfrog`` trajectory length (the one tuning knob ChEES
  removes).

:func:`chees_sample` — ChEES-HMC (Hoffman, Radul & Sountsov, AISTATS 2021):
the trajectory length is LEARNED during warmup by stochastic gradient ascent
on the Change-in-the-Estimator-of-the-Expected-Square criterion, estimated
across chains. This is the deliberate TPU-native alternative to NUTS (the
reference's sampler): NUTS's recursive tree doubling is data-dependent
control flow that XLA cannot batch — vmapped chains would all wait on the
deepest tree every iteration — whereas ChEES runs EVERY chain through the
same halton-jittered trajectory in one fused program, so chains are nearly
free on the MXU and the per-iteration leapfrog count is a scalar. Same
no-knob property as NUTS (step size, mass matrix, and trajectory length all
adapt), better accelerator utilization.

The whole warmup+sampling loop is one ``lax.scan`` — no Python per-iteration
overhead, which matters when every leapfrog step contains an N×N Cholesky.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

__all__ = ["hmc_sample", "chees_sample"]


class _DAState(NamedTuple):
    log_eps: jnp.ndarray
    log_eps_bar: jnp.ndarray
    h_bar: jnp.ndarray
    mu: jnp.ndarray


def _da_update(state, accept_prob, t, target_accept):
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
                lambda new, old: jnp.where(tuning, new, old),
                _da_update(da, accept_prob, t, target_accept),
                da,
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


def _halton2(n: int) -> np.ndarray:
    """Van der Corput base-2 sequence, entries in (0, 1).

    Low-discrepancy trajectory jitter: consecutive iterations alternate
    short/long trajectories instead of clumping the way uniform jitter does
    (ChEES paper §4). Host-side numpy — it feeds the scan as constants.
    """
    out = np.empty(n)
    for i in range(n):
        x, f, k = 0.0, 0.5, i + 1
        while k:
            x += f * (k & 1)
            k >>= 1
            f *= 0.5
        out[i] = x
    return out


def chees_sample(
    logp_fn,
    q0,
    key,
    draws=500,
    tune=500,
    chains=16,
    target_accept=0.75,
    max_leapfrog=256,
    adam_lr=0.025,
):
    """ChEES-HMC: HMC whose trajectory length adapts itself during warmup.

    Same contract as :func:`hmc_sample` (returns a samples pytree with
    leading ``(chains, draws)`` axes and a stats dict) but with no
    ``n_leapfrog`` knob: the total integration time T maximizes the ChEES
    criterion — the variance of the change in squared distance from the
    (cross-chain) posterior mean, a proxy for fastest mixing of second
    moments. Per iteration, every chain integrates for ``h_t·T`` where
    ``h_t`` is a halton point, and the criterion's gradient

        dChEES/dT ∝ E[ α · (‖q̃'−μ̃'‖² − ‖q̃−μ̃‖²) · (q̃'−μ̃')·ṽ' ]

    (whitened by the adapted diagonal mass, α the MH acceptance, ṽ' the
    final whitened velocity) is averaged over chains and fed to Adam on
    log T. Step size adapts by dual averaging on the cross-chain mean
    acceptance; the diagonal mass by batched Welford. All chains share
    ε, T, and the per-iteration leapfrog count, so the entire sampler is
    one ``lax.scan`` of fused (chains, dim) batched work — the reason this
    scheme (and not NUTS's per-chain recursion) is the TPU-native choice.

    ``chains`` defaults higher than :func:`hmc_sample`'s because the
    criterion is estimated ACROSS chains; on device the extra chains ride
    the batch dimension almost for free. ``max_leapfrog`` bounds the cost
    of any single iteration (the adapted optimum on GP hyperparameter
    posteriors sits far below it).
    """
    q0_flat, unravel = ravel_pytree(q0)
    dim = q0_flat.shape[0]
    dtype = q0_flat.dtype

    def logp_flat(q):
        return logp_fn(unravel(q))

    vg_batch = jax.vmap(jax.value_and_grad(logp_flat))

    hs = jnp.asarray(_halton2(tune + draws), dtype=dtype)
    eps0 = 0.1 / dim**0.25

    def step(carry, inp):
        qs, da, adam, welford, t, key, tuning = carry
        h_t = inp
        key, k_mom, k_acc = jax.random.split(key, 3)

        mean, m2, count = welford
        var_est = jnp.where(count > 2.0, m2 / jnp.maximum(count - 1.0, 1.0), jnp.ones(dim, dtype))
        inv_mass = var_est  # kinetic = ½ pᵀ M⁻¹ p with M⁻¹ = diag(var)
        mass_sqrt = 1.0 / jnp.sqrt(inv_mass)
        white = jnp.sqrt(inv_mass)  # q̃ = q·s whitens by the posterior scale

        eps = jnp.exp(jnp.where(tuning, da.log_eps, da.log_eps_bar))
        log_T, m_adam, v_adam, t_adam, log_T_bar = adam
        tau = h_t * jnp.exp(log_T)
        n_leap = jnp.clip(jnp.ceil(tau / eps), 1, max_leapfrog).astype(jnp.int32)

        p = jax.random.normal(k_mom, (chains, dim), dtype=dtype) * mass_sqrt
        logp_cur, _ = vg_batch(qs)
        h_cur = logp_cur - 0.5 * jnp.sum(p * p * inv_mass, axis=1)

        def leap(_, state):
            q, p = state
            _, g = vg_batch(q)
            p = p + 0.5 * eps * g
            q = q + eps * inv_mass * p
            _, g = vg_batch(q)
            p = p + 0.5 * eps * g
            return q, p

        q_new, p_new = jax.lax.fori_loop(0, n_leap, leap, (qs, p))
        logp_new, _ = vg_batch(q_new)
        h_new = logp_new - 0.5 * jnp.sum(p_new * p_new * inv_mass, axis=1)

        log_accept = jnp.minimum(h_new - h_cur, 0.0)
        log_accept = jnp.where(jnp.isfinite(log_accept), log_accept, -jnp.inf)
        accept = jnp.log(jax.random.uniform(k_acc, (chains,), dtype=dtype)) < log_accept
        accept_prob = jnp.exp(log_accept)
        qs_out = jnp.where(accept[:, None], q_new, qs)

        # --- ChEES gradient in the whitened space, acceptance-weighted
        qw, qw_new = qs * white, q_new * white
        mu, mu_new = jnp.mean(qw, axis=0), jnp.mean(qw_new, axis=0)
        d_new, d_old = qw_new - mu_new, qw - mu
        delta_sq = jnp.sum(d_new * d_new, axis=1) - jnp.sum(d_old * d_old, axis=1)
        v_white = (inv_mass * p_new) / white  # dq̃/dt = M⁻¹p · s
        proj = jnp.sum(d_new * v_white, axis=1)
        w_sum = jnp.maximum(jnp.sum(accept_prob), 1e-12)
        g_chees = h_t * jnp.sum(accept_prob * delta_sq * proj) / w_sum

        # Adam ascent on log T (warmup only), plus an iterate average that
        # smooths the last noisy steps into the frozen sampling value.
        t_adam_new = t_adam + 1.0
        m_new = 0.9 * m_adam + 0.1 * g_chees
        v_new = 0.95 * v_adam + 0.05 * g_chees**2
        m_hat = m_new / (1.0 - 0.9**t_adam_new)
        v_hat = v_new / (1.0 - 0.95**t_adam_new)
        log_T_new = log_T + adam_lr * m_hat / (jnp.sqrt(v_hat) + 1e-8)
        # keep T integrable: at least one step, at most the leapfrog cap
        log_T_new = jnp.clip(
            log_T_new, jnp.log(eps) , jnp.log(eps * max_leapfrog)
        )
        w_avg = t_adam_new ** (-0.75)
        log_T_bar_new = w_avg * log_T_new + (1.0 - w_avg) * log_T_bar
        adam_new = (log_T_new, m_new, v_new, t_adam_new, log_T_bar_new)
        adam = jax.tree_util.tree_map(
            lambda new, old: jnp.where(tuning, new, old), adam_new, adam
        )

        da = jax.tree_util.tree_map(
            lambda new, old: jnp.where(tuning, new, old),
            _da_update(da, jnp.mean(accept_prob), t, target_accept),
            da,
        )

        # Batched Welford across the chain batch (warmup only)
        b_mean = jnp.mean(qs_out, axis=0)
        b_m2 = jnp.sum((qs_out - b_mean) ** 2, axis=0)
        dlt = b_mean - mean
        tot = count + chains
        welford_new = (
            mean + dlt * chains / tot,
            m2 + b_m2 + dlt**2 * count * chains / tot,
            tot,
        )
        welford = jax.tree_util.tree_map(
            lambda new, old: jnp.where(tuning, new, old), welford_new, welford
        )

        return (qs_out, da, adam, welford, t + 1.0, key, tuning), (
            qs_out,
            accept_prob,
            n_leap,
        )

    da = _DAState(
        log_eps=jnp.asarray(np.log(eps0), dtype),
        log_eps_bar=jnp.asarray(0.0, dtype),
        h_bar=jnp.asarray(0.0, dtype),
        mu=jnp.asarray(np.log(10.0 * eps0), dtype),
    )
    adam = (
        jnp.asarray(0.0, dtype),  # log T (T₀ = 1 in whitened time)
        jnp.asarray(0.0, dtype),
        jnp.asarray(0.0, dtype),
        jnp.asarray(0.0, dtype),
        jnp.asarray(0.0, dtype),
    )
    welford = (jnp.zeros(dim, dtype), jnp.zeros(dim, dtype), jnp.asarray(0.0, dtype))
    q_inits = jnp.broadcast_to(q0_flat, (chains, dim)) + 0.01 * jax.random.normal(
        jax.random.fold_in(key, 1), (chains, dim), dtype=dtype
    )

    carry = (q_inits, da, adam, welford, jnp.asarray(0.0, dtype), key, jnp.asarray(True))
    carry, _ = jax.lax.scan(step, carry, hs[:tune])
    qs, da, adam, welford, _, key, _ = carry
    # freeze: averaged step size, averaged log T, final mass
    adam = (adam[4], adam[1], adam[2], adam[3], adam[4])
    carry = (qs, da, adam, welford, jnp.asarray(0.0, dtype), key, jnp.asarray(False))
    carry, (qs_draws, accept_probs, n_leaps) = jax.lax.scan(step, carry, hs[tune:])

    qs_draws = jnp.swapaxes(qs_draws, 0, 1)  # (chains, draws, dim)
    samples = jax.vmap(jax.vmap(unravel))(qs_draws)
    stats = {
        "accept_prob": jnp.broadcast_to(accept_probs.T, (chains, draws)),
        "mean_accept": jnp.mean(accept_probs),
        "trajectory_length": jnp.exp(adam[0]),
        "step_size": jnp.exp(da.log_eps_bar),
        "mean_leapfrog": jnp.mean(n_leaps.astype(dtype)),
    }
    return samples, stats
