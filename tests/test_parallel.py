"""Multi-chip sharding on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gumbi_tpu.ops import GPSpec, GPTerm, initial_params, mll, posterior_cache, predict_diag
from gumbi_tpu.parallel import (
    blocked_cholesky,
    data_sharded_fit_gp_map,
    dist_quad_and_logdet,
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


def test_blocked_cholesky_matches_dense():
    """The distributed right-looking factorization equals jnp Cholesky."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(8, restart_axis=2)  # 'data' extent 4
    rng = np.random.default_rng(0)
    n = 256
    M = rng.normal(size=(n, n))
    K = M @ M.T + n * np.eye(n)
    Kj = jax.device_put(jnp.asarray(K), NamedSharding(mesh, P("data", None)))
    L = np.asarray(blocked_cholesky(mesh, Kj))
    L_ref = np.linalg.cholesky(K)
    assert np.allclose(L, L_ref, atol=1e-10)


def test_dist_quad_logdet_values_and_grads():
    """Distributed quad/logdet (+ its analytic VJP) ≡ the single-device op."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gumbi_tpu.ops.linalg import quad_and_logdet

    mesh = make_mesh(8, restart_axis=1)  # 'data' extent 8
    rng = np.random.default_rng(1)
    n = 192
    M = rng.normal(size=(n, n))
    K = M @ M.T + n * np.eye(n)
    y = rng.normal(size=n)
    Kj = jax.device_put(jnp.asarray(K), NamedSharding(mesh, P("data", None)))
    yj = jax.device_put(jnp.asarray(y), NamedSharding(mesh, P("data")))

    q, ld = jax.jit(lambda K, y: dist_quad_and_logdet(mesh, K, y))(Kj, yj)
    q_ref, ld_ref = quad_and_logdet(jnp.asarray(K), jnp.asarray(y))
    assert np.isclose(float(q), float(q_ref), rtol=1e-11)
    assert np.isclose(float(ld), float(ld_ref), rtol=1e-11)

    def combo(f):
        return lambda K, y: 0.7 * f(K, y)[0] - 1.3 * f(K, y)[1]

    gK, gy = jax.jit(jax.grad(combo(lambda K, y: dist_quad_and_logdet(mesh, K, y)), argnums=(0, 1)))(Kj, yj)
    gK_ref, gy_ref = jax.grad(combo(quad_and_logdet), argnums=(0, 1))(jnp.asarray(K), jnp.asarray(y))
    assert np.allclose(np.asarray(gK), np.asarray(gK_ref), atol=1e-12)
    assert np.allclose(np.asarray(gy), np.asarray(gy_ref), atol=1e-12)


def test_sharded_gram_mll_padding_and_grads(problem):
    """Non-divisible N pads with identity rows; hyperparameter grads match."""
    spec, params, xc, xk, y = problem
    mesh = make_mesh(8, restart_axis=2)  # 'data' extent 4
    # 45 points: not divisible by 4 → exercises the padding path
    xc45, xk45, y45 = xc[:45], xk[:45], y[:45]
    sharded = float(sharded_gram_mll(mesh, spec, params, xc45, xk45, y45))
    single = float(mll(spec, params, xc45, xk45, y45))
    assert np.isclose(sharded, single, rtol=1e-10)

    g_sh = jax.grad(lambda p: sharded_gram_mll(mesh, spec, p, xc45, xk45, y45))(params)
    g_si = jax.grad(lambda p: mll(spec, p, xc45, xk45, y45))(params)
    for k in params:
        assert np.allclose(np.asarray(g_sh[k]), np.asarray(g_si[k]), rtol=1e-8), k


def test_data_sharded_fit_matches_single_device(problem):
    """The large-N fit path (distributed Gram + Cholesky + VJP) reaches the
    same optimum as the single-device optimizer from the same starts."""
    from gumbi_tpu.ops.optimize import fit_gp_map

    spec, _, xc, xk, y = problem
    mesh = make_mesh(8, restart_axis=2)
    ls_alpha = jnp.asarray([2.0])
    ls_beta = jnp.asarray([1.0])
    u0s = initial_params(spec, ls_alpha, ls_beta, n_restarts=2, seed=0)

    p_d, f_d, _ = data_sharded_fit_gp_map(
        mesh, spec, xc, xk, y, ls_alpha, ls_beta, u0s, maxiter=60
    )
    p_s, f_s, _ = fit_gp_map(spec, xc, xk, y, ls_alpha, ls_beta, u0s, maxiter=60)
    assert np.isclose(float(f_d), float(f_s), rtol=1e-6)
    assert np.allclose(np.asarray(p_d["ls_total"]), np.asarray(p_s["ls_total"]), rtol=1e-3)


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


def test_model_level_mesh_kronecker_fit():
    """GP.find_MAP(mesh=...) on the flagship 2-output Kronecker structure
    (restart-sharded kron_neg_logp) matches the single-device Kronecker fit."""
    import gumbi_tpu as gmb

    df = gmb.data.cars(n=36, seed=7)
    ds = gmb.DataSet(
        df, outputs=["mpg", "acceleration"], log_vars=["mpg", "acceleration", "horsepower"]
    )

    def build(gp):
        gp.specify_model(
            outputs=["mpg", "acceleration"], continuous_dims=["horsepower", "weight"]
        )
        gp.build_model()
        assert gp._structure == "Kronecker"
        return gp

    gp1 = build(gmb.GP(ds))
    gp1.find_MAP(n_restarts=4, maxiter=80)

    mesh = make_mesh(8, restart_axis=4)
    gp2 = build(gmb.GP(ds))
    gp2.find_MAP(n_restarts=4, maxiter=80, mesh=mesh)

    assert np.isclose(gp1._neg_logp, gp2._neg_logp, rtol=1e-5)
    assert np.allclose(gp1.MAP["ls_total"], gp2.MAP["ls_total"], rtol=1e-3)

    X, _ = gp1.get_structured_data()
    p1 = gp1.predict_points(X[:8])
    p2 = gp2.predict_points(X[:8])
    assert np.allclose(p1.get("mpg").μ, p2.get("mpg").μ, rtol=1e-4)


def test_model_level_shard_data_fit():
    """GP.find_MAP(mesh=..., shard_data=True) — the exact-dense large-N path
    reached through the user API — matches the single-device fit."""
    import gumbi_tpu as gmb

    df = gmb.data.cars(n=44, seed=3)
    ds = gmb.DataSet(df, outputs=["mpg"], log_vars=["mpg", "horsepower"])

    gp1 = gmb.GP(ds)
    gp1.specify_model(outputs=["mpg"], continuous_dims=["horsepower"])
    gp1.build_model()
    gp1.find_MAP(n_restarts=2, maxiter=60)

    mesh = make_mesh(8, restart_axis=2)
    gp2 = gmb.GP(ds)
    gp2.specify_model(outputs=["mpg"], continuous_dims=["horsepower"])
    gp2.build_model()
    gp2.find_MAP(n_restarts=2, maxiter=60, mesh=mesh, shard_data=True)

    assert np.isclose(gp1._neg_logp, gp2._neg_logp, rtol=1e-5)
    assert np.allclose(gp1.MAP["ls_total"], gp2.MAP["ls_total"], rtol=1e-3)

    # Prediction after a data-sharded fit builds the dense cache lazily
    X, _ = gp1.get_structured_data()
    p1 = gp1.predict_points(X[:9])
    p2 = gp2.predict_points(X[:9])
    assert np.allclose(p1.μ, p2.μ, rtol=1e-4)
    assert np.allclose(p1.σ2, p2.σ2, rtol=1e-3)


def test_model_level_mesh_fit_respects_bucket_mask():
    """A bucket-padded fit through find_MAP(mesh=...) must match the
    single-device bucketed fit: the padded phantom rows are masked out of
    the MLL, not fit as real y=0 observations."""
    import gumbi_tpu as gmb

    df = gmb.data.cars(n=20, seed=11)
    ds = gmb.DataSet(df, outputs=["mpg"], log_vars=["mpg", "horsepower"])

    def build(gp):
        gp.specify_model(outputs=["mpg"], continuous_dims=["horsepower"])
        gp.build_model(bucket=32)
        assert gp._mask is not None  # 20 → 32 rows padded
        return gp

    gp1 = build(gmb.GP(ds))
    gp1.find_MAP(n_restarts=4, maxiter=80)

    mesh = make_mesh(8, restart_axis=4)
    gp2 = build(gmb.GP(ds))
    gp2.find_MAP(n_restarts=4, maxiter=80, mesh=mesh)

    assert np.isclose(gp1._neg_logp, gp2._neg_logp, rtol=1e-5)
    assert np.allclose(gp1.MAP["ls_total"], gp2.MAP["ls_total"], rtol=1e-4)


def test_rebuild_clears_stale_bucket_mask():
    """Rebuilding a model without bucketing on the same GP instance must not
    carry the previous build's padding mask into predict/save/propose."""
    import gumbi_tpu as gmb

    df = gmb.data.cars(n=20, seed=5)
    ds = gmb.DataSet(
        df, outputs=["mpg", "acceleration"], log_vars=["mpg", "acceleration", "horsepower"]
    )

    gp = gmb.GP(ds)
    gp.specify_model(outputs=["mpg"], continuous_dims=["horsepower"])
    gp.build_model(bucket=32)
    assert gp._mask is not None

    # Rebuild through the early-returning Independent branch
    gp.specify_model(
        outputs=["mpg", "acceleration"], continuous_dims=["horsepower"]
    )
    gp.build_model(multitask_kernel="Independent")
    assert gp._mask is None


def test_sharded_predict_diag_respects_bucket_mask(problem):
    """A bucket-padded PosteriorCache must give the same predictions sharded
    as on one device: phantom-row cross-Gram columns are masked out."""
    spec, params, xc, xk, y = problem
    n = xc.shape[0]
    pad = 16
    mask = jnp.concatenate([jnp.ones(n), jnp.zeros(pad)])
    xc_p = jnp.concatenate([xc, jnp.zeros((pad, xc.shape[1]))])
    xk_p = jnp.concatenate([xk, jnp.zeros((pad, xk.shape[1]), dtype=xk.dtype)])
    y_p = jnp.concatenate([y, jnp.zeros(pad)])
    cache = posterior_cache(spec, params, xc_p, xk_p, y_p, mask=mask)

    xs = jnp.linspace(-2.2, 2.2, 24)[:, None]
    ks = jnp.zeros((24, xk.shape[1]), dtype=xk.dtype)
    m1, v1 = predict_diag(spec, params, cache, xs, ks)

    mesh = make_mesh(8, restart_axis=2)
    m2, v2 = sharded_predict_diag(mesh, spec, params, cache, xs, ks)
    assert np.allclose(np.asarray(m1), np.asarray(m2), atol=1e-10)
    assert np.allclose(np.asarray(v1), np.asarray(v2), atol=1e-10)


def test_model_level_mesh_gpc_fit():
    """GPC.find_MAP(mesh=...) — restart-sharded Laplace evidence — matches
    the single-device classifier fit and predicts identically."""
    import pandas as pd

    import gumbi_tpu as gmb

    rng = np.random.default_rng(3)
    x = rng.uniform(-2, 2, 64)
    labels = (x + 0.25 * rng.normal(size=64) > 0).astype(float)
    ds = gmb.DataSet(pd.DataFrame({"x": x, "label": labels}), outputs=["label"])

    def build():
        gpc = gmb.GPC(ds)
        gpc.specify_model(outputs=["label"], continuous_dims=["x"])
        gpc.build_model()
        return gpc

    gpc1 = build()
    gpc1.find_MAP(n_restarts=4, maxiter=60)

    mesh = make_mesh(8, restart_axis=4)
    gpc2 = build()
    gpc2.find_MAP(n_restarts=4, maxiter=60, mesh=mesh)

    assert np.allclose(gpc1.MAP["ls_total"], gpc2.MAP["ls_total"], rtol=1e-5)
    assert np.isclose(gpc1._neg_logp, gpc2._neg_logp, rtol=1e-6)

    pts = gpc1.parray(x=np.array([-1.5, 0.0, 1.5]))
    assert np.allclose(
        gpc1.predict_proba(pts), gpc2.predict_proba(pts), rtol=1e-5, atol=1e-6
    )


def test_model_level_mesh_sparse_gpc_fit():
    """GPC.find_MAP(mesh=...) on a sparse (FITC-Laplace) build matches the
    single-device sparse classifier fit."""
    import pandas as pd

    import gumbi_tpu as gmb

    rng = np.random.default_rng(4)
    x = rng.uniform(-2, 2, 96)
    labels = (np.sin(1.5 * x) + 0.3 * rng.normal(size=96) > 0).astype(float)
    ds = gmb.DataSet(pd.DataFrame({"x": x, "label": labels}), outputs=["label"])

    def build():
        gpc = gmb.GPC(ds)
        gpc.specify_model(outputs=["label"], continuous_dims=["x"])
        gpc.build_model(sparse=True, n_u=24)
        return gpc

    gpc1 = build()
    gpc1.find_MAP(n_restarts=4, maxiter=60)

    mesh = make_mesh(8, restart_axis=4)
    gpc2 = build()
    gpc2.find_MAP(n_restarts=4, maxiter=60, mesh=mesh)

    assert np.allclose(gpc1.MAP["ls_total"], gpc2.MAP["ls_total"], rtol=1e-5)
    assert np.isclose(gpc1._neg_logp, gpc2._neg_logp, rtol=1e-6)


def test_model_level_mesh_sparse_gp_fit():
    """GP.find_MAP(mesh=...) on a sparse (FITC) regressor build —
    restart-sharded fitc_neg_logp — matches the single-device sparse fit."""
    import gumbi_tpu as gmb

    df = gmb.data.cars(n=60, seed=13)
    ds = gmb.DataSet(
        df, outputs=["mpg", "acceleration"], log_vars=["mpg", "acceleration", "horsepower"]
    )

    def build():
        gp = gmb.GP(ds)
        gp.specify_model(outputs=["mpg"], continuous_dims=["horsepower"])
        gp.build_model(sparse=True, n_u=16)
        return gp

    gp1 = build()
    gp1.find_MAP(n_restarts=4, maxiter=80)

    mesh = make_mesh(8, restart_axis=4)
    gp2 = build()
    gp2.find_MAP(n_restarts=4, maxiter=80, mesh=mesh)

    assert np.allclose(gp1.MAP["ls_total"], gp2.MAP["ls_total"], rtol=1e-5)
    assert np.isclose(gp1._neg_logp, gp2._neg_logp, rtol=1e-6)

    X, _ = gp1.get_structured_data()
    p1 = gp1.predict_points(X[:7])
    p2 = gp2.predict_points(X[:7])
    assert np.allclose(p1.μ, p2.μ, rtol=1e-5)
    assert np.allclose(p1.σ2, p2.σ2, rtol=1e-4)
