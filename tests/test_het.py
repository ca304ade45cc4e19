"""Heteroskedastic-input GP (most-likely heteroskedastic GP, Kersting 2007).

Input-dependent noise is NotImplemented in BOTH reference backends
(ref gumbi/regression/pymc/GP.py:518-519, botorch/GP.py:142-143); this is a
beyond-reference capability. The oracle is the generating process itself:
a step noise profile (quiet left half, loud right half) that the noise GP
must recover, and held-out NLPD that must beat the homoskedastic fit.
"""

import numpy as np
import pandas as pd
import pytest

from gumbi_tpu import GP, DataSet, parray


def _het_df(n=240, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(-2, 2, n))
    f = np.sin(1.2 * x)
    sd = np.where(x > 0, 0.5, 0.05)  # 10× noise-std step at x=0
    y = f + rng.normal(0, sd)
    return pd.DataFrame({"x": x, "y": y}), f, sd


@pytest.fixture(scope="module")
def het_fit():
    df, _, _ = _het_df()
    ds = DataSet(df, outputs=["y"])
    gp = GP(ds).fit(
        outputs=["y"],
        continuous_dims=["x"],
        heteroskedastic_inputs=True,
        MAP_kwargs=dict(n_restarts=3, maxiter=150, het_iters=1),
    )
    return ds, gp


def _noise_var(gp, ds, xs):
    pts = parray(x=np.asarray(xs, dtype=float), stdzr=ds.stdzr)
    noisy = gp.predict_points(pts, with_noise=True)
    latent = gp.predict_points(pts, with_noise=False)
    return np.asarray(noisy.σ2) - np.asarray(latent.σ2)


def test_het_recovers_noise_shape(het_fit):
    ds, gp = het_fit
    assert gp._noise_params is not None and gp._noise_mult is not None
    nv = _noise_var(gp, ds, [-1.5, 1.5])
    # True variance ratio is 100×; demand at least a decisive 5×.
    assert nv[1] / nv[0] > 5.0, nv

    # Homoskedastic fit on the same data is flat by construction.
    gp0 = GP(ds).fit(
        outputs=["y"], continuous_dims=["x"],
        MAP_kwargs=dict(n_restarts=3, maxiter=150),
    )
    nv0 = _noise_var(gp0, ds, [-1.5, 1.5])
    assert abs(nv0[1] / nv0[0] - 1.0) < 1e-3


def test_het_beats_homoskedastic_nlpd(het_fit):
    ds, gp = het_fit
    gp0 = GP(ds).fit(
        outputs=["y"], continuous_dims=["x"],
        MAP_kwargs=dict(n_restarts=3, maxiter=150),
    )
    df_test, _, _ = _het_df(n=200, seed=1)
    pts = parray(x=df_test["x"].to_numpy(), stdzr=ds.stdzr)

    def nlpd(model):
        up = model.predict_points(pts, with_noise=True)
        mu, var = np.asarray(up.μ), np.asarray(up.σ2)
        r = df_test["y"].to_numpy() - mu
        return float(np.mean(0.5 * (r**2 / var + np.log(2 * np.pi * var))))

    assert nlpd(gp) < nlpd(gp0) - 0.1, (nlpd(gp), nlpd(gp0))


def test_het_latent_mean_still_tracks_truth(het_fit):
    ds, gp = het_fit
    df, f, _ = _het_df()
    pts = parray(x=df["x"].to_numpy(), stdzr=ds.stdzr)
    up = gp.predict_points(pts, with_noise=False)
    rmse = float(np.sqrt(np.mean((np.asarray(up.μ) - f) ** 2)))
    assert rmse < 0.2, rmse


def test_het_save_load_roundtrip(het_fit, tmp_path):
    ds, gp = het_fit
    path = tmp_path / "het_gp.npz"
    gp.save(path)
    gp2 = GP.load(path, ds)
    assert gp2.heteroskedastic_inputs
    xs = np.linspace(-1.8, 1.8, 7)
    pts = parray(x=xs, stdzr=ds.stdzr)
    for with_noise in (True, False):
        a = gp.predict_points(pts, with_noise=with_noise)
        b = gp2.predict_points(pts, with_noise=with_noise)
        np.testing.assert_allclose(np.asarray(a.μ), np.asarray(b.μ), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(a.σ2), np.asarray(b.σ2), rtol=1e-6)


def test_het_structure_restrictions():
    df, _, _ = _het_df(n=60)
    ds = DataSet(df, outputs=["y"])
    for kwargs in (
        dict(sparse=True),
        dict(bucket=64),
        dict(multitask_kernel="Kronecker"),
    ):
        with pytest.raises((NotImplementedError, ValueError)):
            GP(ds).fit(
                outputs=["y"], continuous_dims=["x"],
                heteroskedastic_inputs=True, **kwargs,
            )
