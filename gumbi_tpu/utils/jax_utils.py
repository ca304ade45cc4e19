"""Reparameterization helpers for sampler-friendly model specification.

JAX-native counterpart of the reference's PyMC RV helpers (reference
gumbi/utils/pymc_utils.py:6-56): non-centered and scaled parameterizations
expressed as pure transform pairs, usable inside any jitted log-density (the
HMC sampler benefits from the same geometry fixes that motivated the PyMC
versions).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = [
    "default_model_dtype",
    "nc_normal",
    "nc_normal_logp",
    "sc_exponential",
    "sc_exponential_logp",
]


def default_model_dtype():
    """Hardware-aware default dtype for model arrays.

    float64 is software-emulated on TPU — roughly 30× slower than native f32
    on the MXU and fragile in some XLA passes — while the engine's f32
    numerics are pinned against f64 oracles (tests/test_parity.py). Models
    therefore default to f32 on a TPU backend and to f64 elsewhere whenever
    x64 is enabled. ``GUMBI_TPU_X64=1`` (set explicitly) forces f64
    everywhere; models also accept ``dtype=...`` directly.
    """
    if not jax.config.jax_enable_x64:
        return jnp.float32
    if os.environ.get("GUMBI_TPU_X64") == "1":
        return jnp.float64
    try:
        backend = jax.default_backend()
    except Exception:  # backend init failure: keep the host default
        backend = "cpu"
    return jnp.float32 if backend == "tpu" else jnp.float64


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
