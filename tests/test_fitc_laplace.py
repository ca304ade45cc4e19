"""Sparse (FITC) Laplace classifier — beyond the reference (sparse + latent
is NotImplemented there, ref gumbi/regression/pymc/GP.py:587).

Oracles: (1) with inducing points = training points the FITC prior is the
exact prior, so evidence and predictions must match the dense Laplace path;
(2) autodiff through the Woodbury Newton loop must match finite differences;
(3) at the model level a sparse fit must reproduce the dense classifier's
probability surface on separable data and survive save/load.
"""

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from gumbi_tpu import GPC, DataSet, parray
from gumbi_tpu.ops import GPSpec, GPTerm
from gumbi_tpu.ops.fitc_laplace import (
    fitc_laplace_mll,
    fitc_laplace_neg_logp,
    fitc_laplace_predict,
)
from gumbi_tpu.ops.laplace import laplace_mll, laplace_predict


def _spec(d=1):
    return GPSpec(
        terms=(GPTerm(suffix="total", kernel="ExpQuad"),),
        d_cont=d,
        ard=True,
        likelihood="bernoulli",
    )


def _params(d=1, ls=0.6, eta=1.2):
    return {"ls_total": jnp.full((d,), ls), "η_total": jnp.asarray(eta)}


def _data(n=50, seed=0):
    rng = np.random.default_rng(seed)
    xc = jnp.asarray(np.sort(rng.uniform(-2, 2, size=(n, 1)), axis=0))
    f = 2.0 * np.sin(1.4 * np.asarray(xc[:, 0]))
    y = jnp.asarray((rng.uniform(size=n) < 1 / (1 + np.exp(-f))).astype(float))
    xk = jnp.zeros((n, 0), dtype=jnp.int32)
    return xc, xk, y


def test_fitc_laplace_exact_at_full_inducing():
    """Inducing = training points → Q = K exactly → dense-Laplace equality."""
    spec, params = _spec(), _params()
    xc, xk, y = _data()

    from gumbi_tpu.ops.kernels import gram

    K = gram(spec, params, xc, xk, xc, xk) + 1e-6 * jnp.eye(len(y))
    z_dense = float(laplace_mll(K, y, n_iter=40))
    z_fitc = float(fitc_laplace_mll(spec, params, xc, xk, xc, xk, y, n_iter=40))
    assert z_fitc == pytest.approx(z_dense, rel=1e-3, abs=1e-2)

    xs = jnp.asarray(np.linspace(-1.8, 1.8, 9)[:, None])
    xks = jnp.zeros((9, 0), dtype=jnp.int32)
    m_d, v_d, p_d = laplace_predict(spec, params, xc, xk, y, xs, xks)
    m_f, v_f, p_f = fitc_laplace_predict(spec, params, xc, xk, xc, xk, y, xs, xks)
    np.testing.assert_allclose(np.asarray(m_f), np.asarray(m_d), rtol=1e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_d), atol=2e-2)


def test_fitc_laplace_gradient_matches_finite_differences():
    spec = _spec()
    xc, xk, y = _data(n=30, seed=1)
    xu_c, xu_k = xc[::3], xk[::3]
    la = jnp.asarray([3.0])
    lb = jnp.asarray([1.0])

    u0 = {"ls_total": jnp.asarray([-0.4]), "η_total": jnp.asarray(0.2)}

    def obj(u):
        return fitc_laplace_neg_logp(spec, u, xc, xk, xu_c, xu_k, y, la, lb, n_iter=50)

    g = jax.grad(obj)(u0)
    h = 1e-5
    for k in u0:
        for i in range(np.asarray(u0[k]).size):
            e = np.zeros(np.asarray(u0[k]).shape)
            e.flat[i] = h
            up = {**u0, k: u0[k] + jnp.asarray(e)}
            um = {**u0, k: u0[k] - jnp.asarray(e)}
            fd = (float(obj(up)) - float(obj(um))) / (2 * h)
            got = float(np.asarray(g[k]).flat[i])
            assert got == pytest.approx(fd, rel=1e-4, abs=1e-6), (k, i)


def _binary_df(n=220, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-2, 2, n)
    p = 1 / (1 + np.exp(-3 * x))
    return pd.DataFrame({"x": x, "hit": (rng.uniform(size=n) < p).astype(float)})


def test_sparse_gpc_matches_dense_probability():
    df = _binary_df()
    ds = DataSet(df, outputs=["hit"])
    common = dict(
        outputs=["hit"], continuous_dims=["x"], heteroskedastic_outputs=False,
        MAP_kwargs=dict(n_restarts=2, maxiter=100),
    )
    dense = GPC(ds).fit(**common)
    sparse = GPC(ds).fit(sparse=True, n_u=30, **common)
    assert sparse.sparse and sparse._xu_c.shape[0] == 30

    pts = parray(x=np.linspace(-1.8, 1.8, 13), stdzr=ds.stdzr)
    p_dense = dense.predict_proba(pts)
    p_sparse = sparse.predict_proba(pts)
    np.testing.assert_allclose(p_sparse, p_dense, atol=0.08)
    # The surface is decisively separable
    assert p_sparse[0] < 0.2 and p_sparse[-1] > 0.8


def test_sparse_gpc_save_load_roundtrip(tmp_path):
    df = _binary_df(n=120, seed=4)
    ds = DataSet(df, outputs=["hit"])
    gpc = GPC(ds).fit(
        outputs=["hit"], continuous_dims=["x"], heteroskedastic_outputs=False,
        sparse=True, n_u=24, MAP_kwargs=dict(n_restarts=2, maxiter=80),
    )
    path = tmp_path / "sparse_gpc.npz"
    gpc.save(path)
    gpc2 = GPC.load(path, ds)
    pts = parray(x=np.linspace(-1.5, 1.5, 7), stdzr=ds.stdzr)
    np.testing.assert_allclose(
        gpc2.predict_proba(pts), gpc.predict_proba(pts), rtol=1e-6
    )


def test_sparse_gpc_unsupported_paths_raise():
    df = _binary_df(n=80, seed=5)
    ds = DataSet(df, outputs=["hit"])
    gpc = GPC(ds).fit(
        outputs=["hit"], continuous_dims=["x"], heteroskedastic_outputs=False,
        sparse=True, n_u=16, MAP_kwargs=dict(n_restarts=1, maxiter=40),
    )
    with pytest.raises(NotImplementedError):
        gpc.sample(latent=True, draws=2, tune=2, chains=1)
    # draw_point_samples IS supported for sparse fits (FITC-Laplace joint
    # draws) — only sublevel draws of the latent field are not.
    pts = parray(x=np.array([0.0, 0.5]), stdzr=ds.stdzr)
    with pytest.raises(NotImplementedError):
        gpc.draw_point_samples(pts, n_samples=2, additive_level="global")
    d = gpc.draw_point_samples(pts, n_samples=3)
    assert d.values().shape == (3, 2)


def test_fitc_laplace_joint_draws():
    """Joint latent draws from the sparse Laplace posterior: empirical draw
    moments converge to fitc_laplace_predict's mean/var, and with inducing =
    training points the draw law matches the dense Laplace draw law."""
    from gumbi_tpu.ops.fitc_laplace import fitc_laplace_draw_latent
    from gumbi_tpu.ops.laplace import laplace_draw_latent

    spec, params = _spec(), _params()
    xc, xk, y = _data()
    xs = jnp.linspace(-2, 2, 9).reshape(-1, 1)
    xks = jnp.zeros((9, 0), dtype=jnp.int32)

    key = jax.random.PRNGKey(0)
    draws = fitc_laplace_draw_latent(
        spec, params, xc, xk, xc[::2], xk[::2], y, xs, xks, key, n_samples=6000
    )
    mu, var, _ = fitc_laplace_predict(spec, params, xc, xk, xc[::2], xk[::2], y, xs, xks)
    emp_mu = np.asarray(draws).mean(axis=0)
    emp_sd = np.asarray(draws).std(axis=0)
    np.testing.assert_allclose(emp_mu, np.asarray(mu), atol=4.5 * float(jnp.sqrt(var.max() / 6000)) + 5e-3)
    np.testing.assert_allclose(emp_sd, np.asarray(jnp.sqrt(var)), rtol=0.1, atol=5e-3)

    # Inducing = training: FITC draws must share the dense-Laplace law; the
    # same key gives (approximately) the same draws since mean/cov agree.
    d_fitc = fitc_laplace_draw_latent(
        spec, params, xc, xk, xc, xk, y, xs, xks, key, n_samples=4
    )
    from gumbi_tpu.ops.kernels import gram  # dense comparison path

    d_dense = laplace_draw_latent(spec, params, xc, xk, y, xs, xks, key, n_samples=4)
    np.testing.assert_allclose(np.asarray(d_fitc), np.asarray(d_dense), rtol=0.05, atol=0.08)


def test_gpc_sparse_draw_point_samples():
    """Model-level sparse classifier draws: probabilities in (0,1), averaging
    to predict_proba's surface within MC error."""
    rng = np.random.default_rng(4)
    n = 90
    x = np.sort(rng.uniform(-3, 3, n))
    p = 1 / (1 + np.exp(-2.2 * x))
    yb = (rng.uniform(size=n) < p).astype(float)
    df = pd.DataFrame({"x": x, "hit": yb})
    ds = DataSet(df, outputs=["hit"])
    gpc = GPC(ds)
    gpc.fit(outputs=["hit"], continuous_dims=["x"], sparse=True, n_u=15,
            heteroskedastic_outputs=False,
            MAP_kwargs=dict(n_restarts=2, maxiter=80))
    gpc.prepare_grid(resolution=11)
    draws = gpc.draw_grid_samples(n_samples=600, seed=0)
    vals = draws.values()
    assert vals.shape == (600, 11)
    assert np.all(vals > 0) and np.all(vals < 1)
    proba = gpc.predict_grid_proba()
    # MC average of expit(f-draws) vs probit-approx integral: loose agreement
    np.testing.assert_allclose(vals.mean(axis=0), np.asarray(proba, dtype=float), atol=0.06)
    assert "posterior_samples" in gpc.sample_vars
