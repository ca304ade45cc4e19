"""Multi-chip sharding on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gumbi_tpu.ops import GPSpec, GPTerm, initial_params, mll, posterior_cache, predict_diag
from gumbi_tpu.parallel import (
    make_mesh,
    sharded_fit_gp_map,
    sharded_gram_mll,
    sharded_predict_diag,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def problem():
    spec = GPSpec(terms=(GPTerm(suffix="total", kernel="ExpQuad"),), d_cont=1)
    rng = np.random.default_rng(1)
    n = 48
    X = np.linspace(-2, 2, n)[:, None]
    y = np.sin(2 * X[:, 0]) + rng.normal(0, 0.1, n)
    params = {
        "ls_total": jnp.asarray([0.6]),
        "η_total": jnp.asarray(1.1),
        "σ": jnp.asarray(0.2),
    }
    return spec, params, jnp.asarray(X), jnp.zeros((n, 0), dtype=jnp.int32), jnp.asarray(y)


def test_sharded_gram_mll_matches_single_device(problem):
    spec, params, xc, xk, y = problem
    mesh = make_mesh(8, restart_axis=2)
    sharded = float(sharded_gram_mll(mesh, spec, params, xc, xk, y))
    single = float(mll(spec, params, xc, xk, y))
    assert np.isclose(sharded, single, rtol=1e-10)


def test_sharded_predict_matches_single_device(problem):
    spec, params, xc, xk, y = problem
    mesh = make_mesh(8, restart_axis=1)
    cache = posterior_cache(spec, params, xc, xk, y)
    g = np.linspace(-2.5, 2.5, 37)[:, None]  # deliberately not divisible by 8
    xc_new = jnp.asarray(g)
    xk_new = jnp.zeros((37, 0), dtype=jnp.int32)

    m1, v1 = predict_diag(spec, params, cache, xc_new, xk_new, with_noise=True)
    m8, v8 = sharded_predict_diag(mesh, spec, params, cache, xc_new, xk_new, with_noise=True)
    assert np.allclose(np.asarray(m1), np.asarray(m8), atol=1e-10)
    assert np.allclose(np.asarray(v1), np.asarray(v8), atol=1e-10)


def test_sharded_fit_runs_and_improves(problem):
    spec, _, xc, xk, y = problem
    mesh = make_mesh(8, restart_axis=2)
    ls_alpha = jnp.asarray([2.0])
    ls_beta = jnp.asarray([1.0])
    u0s = initial_params(spec, ls_alpha, ls_beta, n_restarts=8, seed=0)
    params, f_best, aux = sharded_fit_gp_map(
        mesh, spec, xc, xk, y, ls_alpha, ls_beta, u0s, maxiter=60
    )
    assert np.isfinite(float(f_best))
    assert float(params["σ"]) > 0
    # Best value must beat every starting value
    assert float(f_best) <= np.nanmin(np.asarray(aux["all_values"])) + 1e-6


def test_model_level_mesh_fit_and_predict():
    """GP.find_MAP(mesh=...) and predict_points(mesh=...) match single-device."""
    import gumbi_tpu as gmb

    df = gmb.data.cars(n=40, seed=21)
    ds = gmb.DataSet(
        df, outputs=["mpg", "acceleration"], log_vars=["mpg", "acceleration", "horsepower"]
    )

    gp1 = gmb.GP(ds)
    gp1.specify_model(outputs=["mpg"], continuous_dims=["horsepower"])
    gp1.build_model()
    gp1.find_MAP(n_restarts=4, maxiter=80)

    mesh = make_mesh(8, restart_axis=4)
    gp2 = gmb.GP(ds)
    gp2.specify_model(outputs=["mpg"], continuous_dims=["horsepower"])
    gp2.build_model()
    gp2.find_MAP(n_restarts=4, maxiter=80, mesh=mesh)

    assert np.allclose(gp1.MAP["ls_total"], gp2.MAP["ls_total"], rtol=1e-5)

    X, _ = gp1.get_structured_data()
    p1 = gp1.predict_points(X[:9])
    p2 = gp2.predict_points(X[:9], mesh=mesh)
    assert np.allclose(p1.μ, p2.μ, rtol=1e-6)
    assert np.allclose(p1.σ2, p2.σ2, rtol=1e-5)
