"""Reparameterization helpers for sampler-friendly model specification.

JAX-native counterpart of the reference's PyMC RV helpers (reference
gumbi/utils/pymc_utils.py:6-56): non-centered and scaled parameterizations
expressed as pure transform pairs, usable inside any jitted log-density (the
HMC sampler benefits from the same geometry fixes that motivated the PyMC
versions).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["nc_normal", "nc_normal_logp", "sc_exponential", "sc_exponential_logp"]


def nc_normal(z, mu, sigma):
    """Non-centered Normal: z ~ N(0, 1) → x = μ + σ·z."""
    return mu + sigma * z


def nc_normal_logp(z):
    """Log-density of the underlying standard-normal variable."""
    return jnp.sum(-0.5 * jnp.log(2.0 * jnp.pi) - 0.5 * z**2)


def sc_exponential(e, mu):
    """Scaled Exponential: e ~ Exponential(1) → x = μ·e."""
    return mu * e


def sc_exponential_logp(e):
    """Log-density of the underlying unit-rate exponential variable."""
    return jnp.sum(-e)
