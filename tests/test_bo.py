"""Bayesian optimization: acquisition functions and GP.propose."""

import numpy as np
import pytest

import jax.numpy as jnp

import gumbi_tpu as gmb
from gumbi_tpu.ops.acquisition import (
    _hv2d,
    expected_improvement,
    optimize_acqf,
    sobol_normal,
    sobol_uniform,
    upper_confidence_bound,
)


def test_sobol_shapes_and_range():
    u = sobol_uniform(64, 3, seed=1)
    assert u.shape == (64, 3)
    assert (u >= 0).all() and (u < 1).all()
    z = sobol_normal(64, 3, seed=1)
    assert abs(z.mean()) < 0.2


def test_ei_matches_naive_mc():
    mean, var, best = 1.2, 0.49, 1.0
    rng = np.random.default_rng(0)
    samples = rng.normal(mean, np.sqrt(var), 200_000)
    mc = np.maximum(samples - best, 0).mean()
    analytic = float(expected_improvement(jnp.asarray(mean), jnp.asarray(var), best))
    assert np.isclose(analytic, mc, rtol=0.02)


def test_ucb():
    v = float(upper_confidence_bound(jnp.asarray(1.0), jnp.asarray(4.0), beta=2.0))
    assert np.isclose(v, 1.0 + 2 * 2.0)


def test_hv2d_known_values():
    ref = jnp.asarray([0.0, 0.0])
    # Single point (2,3) → rectangle 6
    assert np.isclose(float(_hv2d(jnp.asarray([[2.0, 3.0]]), ref)), 6.0)
    # Two non-dominated points (1,3), (3,1): HV = 3 + 3 - 1 = 5
    assert np.isclose(float(_hv2d(jnp.asarray([[1.0, 3.0], [3.0, 1.0]]), ref)), 5.0)
    # Dominated point adds nothing
    pts = jnp.asarray([[1.0, 3.0], [3.0, 1.0], [0.5, 0.5]])
    assert np.isclose(float(_hv2d(pts, ref)), 5.0)
    # Point below reference adds nothing
    pts = jnp.asarray([[2.0, 3.0], [-1.0, -4.0]])
    assert np.isclose(float(_hv2d(pts, ref)), 6.0)


def test_optimize_acqf_finds_peak():
    # Maximize a concave bump at x*=0.3 over [0,1]²
    target = jnp.asarray([0.3, 0.7])

    def acq(X):  # (q, d)
        return -jnp.sum((X - target) ** 2)

    cand, val = optimize_acqf(acq, (jnp.zeros(2), jnp.ones(2)), q=1, num_restarts=4, raw_samples=64)
    assert np.allclose(np.asarray(cand)[0], np.asarray(target), atol=1e-3)


@pytest.fixture(scope="module")
def fitted_gp():
    df = gmb.data.cars(n=60, seed=3)
    ds = gmb.DataSet(
        df, outputs=["mpg", "acceleration"], log_vars=["mpg", "acceleration", "horsepower"]
    )
    gp = gmb.GP(ds)
    gp.fit(
        outputs=["mpg"],
        continuous_dims=["horsepower"],
        MAP_kwargs=dict(n_restarts=2, maxiter=100),
    )
    return gp


def test_propose_qnei_single_output(fitted_gp):
    cands, val = fitted_gp.propose(q=2, raw_samples=64, num_restarts=4, mc_samples=64)
    assert cands.shape == (2,)
    assert cands.names == ["horsepower"]
    # Candidates must lie within the data's z-range box → natural-space range
    hp = cands.values()
    assert np.all(hp > 0)
    assert np.isfinite(val)


def test_propose_grid_parity(fitted_gp):
    gp = fitted_gp
    gp.prepare_grid(resolution=30)
    gp.predict_grid()
    proposal = gp.propose(30.0, acquisition="EI")
    assert proposal is not None
    assert "horsepower" in proposal.names


@pytest.mark.slow
def test_propose_qnehvi_two_outputs():
    df = gmb.data.cars(n=40, seed=4)
    ds = gmb.DataSet(
        df, outputs=["mpg", "acceleration"], log_vars=["mpg", "acceleration", "horsepower"]
    )
    gp = gmb.GP(ds)
    gp.fit(
        outputs=["mpg", "acceleration"],
        continuous_dims=["horsepower"],
        MAP_kwargs=dict(n_restarts=2, maxiter=100),
    )
    cands, val = gp.propose(q=2, raw_samples=32, num_restarts=2, mc_samples=32, max_baseline=16)
    assert cands.shape == (2,)
    assert np.isfinite(val)
