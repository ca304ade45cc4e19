"""Kronecker fast path must agree exactly with the dense tall formulation."""

import numpy as np
import pytest

import jax.numpy as jnp

from gumbi_tpu.ops import CoregTerm, GPSpec, GPTerm, mll, posterior_cache, predict_diag
from gumbi_tpu.ops.kronecker import kron_cache, kron_mll, kron_predict_diag


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(3)
    n, d_out = 24, 3
    Xb = rng.uniform(-2, 2, size=(n, 2))
    Y = np.stack(
        [np.sin(Xb[:, 0]) + 0.1 * rng.normal(size=n) * (1 + j) for j in range(d_out)], axis=1
    )

    out_cg = CoregTerm(name="Parameter", col=0, d_out=d_out)
    spec = GPSpec(
        terms=(GPTerm(suffix="total", kernel="ExpQuad", coregs=(out_cg,)),),
        d_cont=2,
        ard=True,
        noise_coreg=CoregTerm(name="Output_noise", col=0, d_out=d_out),
    )
    params = {
        "ls_total": jnp.asarray([0.7, 1.1]),
        "η_total": jnp.asarray(1.3),
        "σ": jnp.asarray(0.25),
        "W_Parameter": jnp.asarray(rng.normal(size=(d_out, 2)) * 0.7),
        "κ_Parameter": jnp.asarray([0.4, 0.6, 0.5]),
        "W_Output_noise": jnp.asarray(rng.normal(size=(d_out, 2)) * 0.3),
        "κ_Output_noise": jnp.asarray([0.8, 1.0, 1.2]),
    }

    # Tall layout: output-major stacking
    xc_tall = jnp.asarray(np.vstack([Xb] * d_out))
    xk_tall = jnp.asarray(np.repeat(np.arange(d_out), n)[:, None].astype(np.int32))
    y_tall = jnp.asarray(Y.T.reshape(-1))
    return spec, params, jnp.asarray(Xb), jnp.asarray(Y), xc_tall, xk_tall, y_tall


def test_kron_mll_matches_dense(problem):
    spec, params, Xb, Y, xc_tall, xk_tall, y_tall = problem
    dense = float(mll(spec, params, xc_tall, xk_tall, y_tall))
    kron = float(kron_mll(spec, params, Xb, Y))
    assert np.isclose(dense, kron, rtol=1e-9)


def test_kron_predict_matches_dense(problem):
    spec, params, Xb, Y, xc_tall, xk_tall, y_tall = problem
    n, d_out = Y.shape

    rng = np.random.default_rng(9)
    Xnew = jnp.asarray(rng.uniform(-2.5, 2.5, size=(7, 2)))

    kc = kron_cache(spec, params, Xb, Y)
    km, kv = kron_predict_diag(spec, params, kc, Xnew, with_noise=True)

    cache = posterior_cache(spec, params, xc_tall, xk_tall, y_tall)
    xc_new_tall = jnp.asarray(np.vstack([np.asarray(Xnew)] * d_out))
    xk_new_tall = jnp.asarray(np.repeat(np.arange(d_out), 7)[:, None].astype(np.int32))
    dm, dv = predict_diag(spec, params, cache, xc_new_tall, xk_new_tall, with_noise=True)

    assert np.allclose(np.asarray(km).reshape(-1), np.asarray(dm), rtol=1e-7, atol=1e-9)
    assert np.allclose(np.asarray(kv).reshape(-1), np.asarray(dv), rtol=1e-6, atol=1e-9)


def test_kron_no_noise_coreg(problem):
    spec, params, Xb, Y, xc_tall, xk_tall, y_tall = problem
    spec2 = GPSpec(terms=spec.terms, d_cont=2, ard=True, noise_coreg=None)
    dense = float(mll(spec2, params, xc_tall, xk_tall, y_tall))
    kron = float(kron_mll(spec2, params, Xb, Y))
    assert np.isclose(dense, kron, rtol=1e-9)
