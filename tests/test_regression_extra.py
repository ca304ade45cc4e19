"""Additional regression coverage: categorical dims, grids, additive fits."""

import numpy as np
import pytest

import gumbi_tpu as gmb
from gumbi_tpu import GP, DataSet


@pytest.fixture(scope="module")
def cars_ds():
    df = gmb.data.cars(n=120, seed=5)
    return DataSet(
        df, outputs=["mpg", "acceleration"], log_vars=["mpg", "acceleration", "horsepower"]
    )


def test_categorical_continuous_fit_predict(cars_ds):
    """Coregion over a string categorical dim, per-level grid predictions
    (reference tests/test_botorch.py:170-186)."""
    gp = GP(cars_ds)
    gp.fit(
        outputs=["mpg"],
        categorical_dims=["origin"],
        continuous_dims=["horsepower"],
        MAP_kwargs=dict(n_restarts=2, maxiter=100),
    )
    assert "W_origin" in gp.MAP
    assert gp.MAP["W_origin"].shape[0] == 3

    gp.prepare_grid(resolution=20)
    preds = {}
    for origin in ["usa", "japan", "europe"]:
        y = gp.predict_grid(categorical_levels={"origin": origin}, with_noise=False)
        assert y.shape == (20,)
        preds[origin] = np.array(y.μ)
    # Different levels give different surfaces
    assert not np.allclose(preds["usa"], preds["japan"])


def test_categorical_missing_level_raises(cars_ds):
    gp = GP(cars_ds)
    gp.fit(
        outputs=["mpg"],
        categorical_dims=["origin"],
        continuous_dims=["horsepower"],
        MAP_kwargs=dict(n_restarts=2, maxiter=60),
    )
    gp.prepare_grid(resolution=5)
    with pytest.raises((AttributeError, AssertionError)):
        gp.predict_grid()  # categorical level not specified


def test_additive_fit(cars_ds):
    gp = GP(cars_ds)
    gp.fit(
        outputs=["mpg"],
        categorical_dims=["origin"],
        continuous_dims=["horsepower"],
        additive=True,
        MAP_kwargs=dict(n_restarts=2, maxiter=80),
    )
    suffixes = [t.suffix for t in gp.model.terms]
    assert suffixes == ["total", "origin"]
    assert "ls_origin" in gp.MAP
    gp.prepare_grid(resolution=10)
    y = gp.predict_grid(categorical_levels={"origin": "usa"})
    assert np.all(np.isfinite(y.μ))


def test_additive_sublevel_prediction(cars_ds):
    """Sublevel posteriors of an additive model (beyond the reference, which
    raises NotImplementedError, ref GP.py:841). Exact oracles: component
    means sum to the total mean (the posterior mean is linear in the
    cross-covariance), and the global component is invariant to the
    categorical coordinate (its kernel carries no coregion factor)."""
    gp = GP(cars_ds)
    gp.fit(
        outputs=["mpg"],
        categorical_dims=["origin"],
        continuous_dims=["horsepower"],
        additive=True,
        MAP_kwargs=dict(n_restarts=2, maxiter=80),
    )
    gp.prepare_grid(resolution=11)
    pts = gp.append_categorical_points(
        gp.grid_points, categorical_levels={"origin": "usa"}
    )
    points_array, _, _ = gp._prepare_points_for_prediction(pts, output=["mpg"])

    mu_tot, var_tot = gp.predict(points_array, with_noise=False)
    mu_glob, var_glob = gp.predict(points_array, additive_level="global")
    mu_org, var_org = gp.predict(points_array, additive_level="origin")
    np.testing.assert_allclose(mu_glob + mu_org, mu_tot, rtol=1e-5, atol=1e-6)
    assert np.all(var_glob >= 0) and np.all(var_org >= 0)

    # Global component does not depend on the categorical coordinate
    pts_jp = gp.append_categorical_points(
        gp.grid_points, categorical_levels={"origin": "japan"}
    )
    pa_jp, _, _ = gp._prepare_points_for_prediction(pts_jp, output=["mpg"])
    mu_glob_jp, var_glob_jp = gp.predict(pa_jp, additive_level="global")
    np.testing.assert_allclose(mu_glob_jp, mu_glob, rtol=1e-6)
    np.testing.assert_allclose(var_glob_jp, var_glob, rtol=1e-6)
    # ...but the per-dim component does
    mu_org_jp, _ = gp.predict(pa_jp, additive_level="origin")
    assert not np.allclose(mu_org_jp, mu_org)

    # Guard rails
    with pytest.raises(ValueError, match="not among this model's components"):
        gp.predict(points_array, additive_level="weight")
    gp2 = GP(cars_ds)
    gp2.fit(
        outputs=["mpg"], continuous_dims=["horsepower"],
        MAP_kwargs=dict(n_restarts=2, maxiter=60),
    )
    with pytest.raises(ValueError, match="additive"):
        gp2.predict(points_array[:, :1], additive_level="global")


def test_botorch_surface_helpers(cars_ds):
    """BotorchGP public-surface parity: D_tasks/task_idxs (ref botorch/GP.py:
    47-55), get_separated_data (:283-294), fit_model alias (:387-392)."""
    gp = GP(cars_ds)
    gp.specify_model(outputs=["mpg", "acceleration"], continuous_dims=["horsepower"])
    gp.build_model()
    assert gp.D_tasks == 2
    assert set(gp.task_idxs) == {"mpg", "acceleration"}

    X, y = gp.get_shaped_data()
    Xs, ys = gp.get_separated_data()
    assert len(Xs) == len(ys) == 2
    assert sum(len(b) for b in ys) == len(y)
    # Each split block drops the output-coordinate column
    assert all(b.shape[1] == X.shape[1] - 1 for b in Xs)

    gp.fit_model(n_restarts=2, maxiter=60)
    assert gp.MAP is not None

    # Single-output: trivial split and task map
    gp1 = GP(cars_ds)
    gp1.specify_model(outputs=["mpg"], continuous_dims=["horsepower"])
    assert gp1.D_tasks == 1 and gp1.task_idxs == {"mpg": 0}
    Xs1, ys1 = gp1.get_separated_data()
    assert len(Xs1) == 1 and Xs1[0].shape[0] == ys1[0].shape[0]


def test_additive_sublevel_draws(cars_ds):
    """draw_point_samples(additive_level=...) — reference semantics (draws
    through gp_dict[additive_level].conditional, ref GP.py:915-916).
    Exact oracle: the sublevel joint covariance's mean/diagonal equal the
    sublevel predict path; empirical draw moments converge to them."""
    gp = GP(cars_ds)
    gp.fit(
        outputs=["mpg"],
        categorical_dims=["origin"],
        continuous_dims=["horsepower"],
        additive=True,
        MAP_kwargs=dict(n_restarts=2, maxiter=80),
    )
    gp.prepare_grid(resolution=7)
    pts = gp.append_categorical_points(
        gp.grid_points, categorical_levels={"origin": "usa"}
    )
    points_array, _, _ = gp._prepare_points_for_prediction(pts, output=["mpg"])

    from gumbi_tpu.ops.posterior import predict_cov_level

    xc, xk = gp._split_X(np.asarray(points_array))
    mu_cov, cov = predict_cov_level(
        gp._spec, gp._params, gp._ensure_dense_cache(), xc, xk, level="total"
    )
    mu_diag, var_diag = gp.predict(points_array, additive_level="global")
    np.testing.assert_allclose(np.asarray(mu_cov), mu_diag, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.maximum(np.diag(np.asarray(cov)), 0.0), var_diag, rtol=1e-4, atol=1e-5
    )

    draws = gp.draw_point_samples(
        pts, n_samples=4000, additive_level="global", seed=0
    )
    emp_mu = draws.values().mean(axis=0)
    emp_sd = draws.values().std(axis=0)
    # z-space comparisons (draws are in natural space; use the z view)
    emp_mu_z = draws.z.values().mean(axis=0)
    emp_sd_z = draws.z.values().std(axis=0)
    np.testing.assert_allclose(emp_mu_z, mu_diag, atol=4.5 * np.sqrt(var_diag.max() / 4000) + 1e-3)
    np.testing.assert_allclose(emp_sd_z, np.sqrt(var_diag), rtol=0.12, atol=1e-3)
    assert np.all(np.isfinite(emp_mu)) and np.all(np.isfinite(emp_sd))

    # var_name bookkeeping (reference GP.py:846-858)
    assert "posterior_samples" in gp.sample_vars
    gp.draw_point_samples(pts, n_samples=2, additive_level="origin")
    assert "posterior_samples_" in gp.sample_vars
    with pytest.raises(ValueError, match="already exists"):
        gp.draw_point_samples(pts, n_samples=2, increment_var=False)
    gp.draw_point_samples(pts, n_samples=2, var_name="my_draws")
    assert "my_draws" in gp.sample_vars


def test_2d_grid_and_conditional(cars_ds):
    gp = GP(cars_ds)
    gp.fit(
        outputs=["mpg"],
        continuous_dims=["horsepower", "weight"],
        MAP_kwargs=dict(n_restarts=2, maxiter=100),
    )
    gp.prepare_grid(resolution={"horsepower": 12, "weight": 9})
    y = gp.predict_grid()
    assert y.shape == (12, 9)

    hp_grid, wt_grid = gp.marginal_grids("horsepower", "weight")
    assert hp_grid.shape == (12, 9)

    wt_med = float(gp.data.wide["weight"].median())
    grid, cond = gp.get_conditional_prediction(weight=wt_med)
    assert cond.shape == (12,)
    assert np.all(np.isfinite(cond.μ))


def test_grid_at_fixed_dim(cars_ds):
    gp = GP(cars_ds)
    gp.fit(
        outputs=["mpg"],
        continuous_dims=["horsepower", "weight"],
        MAP_kwargs=dict(n_restarts=2, maxiter=80),
    )
    at = gp.parray(weight=float(gp.data.wide["weight"].median()))
    gp.prepare_grid(at=at, resolution=10)
    y = gp.predict_grid()
    assert y.shape == (10,)


def test_matern_and_linear_dims(cars_ds):
    gp = GP(cars_ds)
    gp.fit(
        outputs=["mpg"],
        continuous_dims=["horsepower"],
        linear_dims=["horsepower"],
        continuous_kernel="Matern52",
        MAP_kwargs=dict(n_restarts=2, maxiter=80),
    )
    assert "c_total" in gp.MAP and "τ_total" in gp.MAP
    gp.prepare_grid(resolution=10)
    y = gp.predict_grid()
    assert np.all(np.isfinite(y.μ))


def test_periodic_kernel_fit():
    rng = np.random.default_rng(0)
    import pandas as pd

    x = np.linspace(0, 4, 60)
    y = np.sin(2 * np.pi * x) + rng.normal(0, 0.1, 60) + 3.0
    df = pd.DataFrame({"x": x, "y": y})
    ds = DataSet(df, outputs=["y"])
    gp = GP(ds)
    period = gp.parray(x=1.0)
    gp.fit(
        outputs=["y"],
        continuous_dims=["x"],
        continuous_kernel="Periodic",
        period=period,
        MAP_kwargs=dict(n_restarts=2, maxiter=100),
    )
    gp.prepare_grid(resolution=30)
    pred = gp.predict_grid(with_noise=False)
    assert np.all(np.isfinite(pred.μ))


def test_jax_utils_roundtrip():
    import jax.numpy as jnp

    from gumbi_tpu.utils.jax_utils import (
        nc_normal,
        nc_normal_logp,
        sc_exponential,
        sc_exponential_logp,
    )

    z = jnp.asarray([0.0, 1.0])
    assert np.allclose(np.asarray(nc_normal(z, 2.0, 3.0)), [2.0, 5.0])
    assert np.isfinite(float(nc_normal_logp(z)))
    assert np.isclose(float(sc_exponential(jnp.asarray(1.0), 4.0)), 4.0)
    assert np.isclose(float(sc_exponential_logp(jnp.asarray(2.0))), -2.0)


def test_model_dtype_defaults(monkeypatch, cars_ds):
    """Hardware-aware engine dtype: f64 on CPU under x64, f32 on a TPU
    backend (f64 is emulated there, ~30x slower), dtype=/GUMBI_TPU_X64
    overrides. A TPU user must get native-f32 fits by default."""
    import jax.numpy as jnp

    from gumbi_tpu.utils import jax_utils

    monkeypatch.delenv("GUMBI_TPU_X64", raising=False)
    assert GP(cars_ds)._dtype == jnp.float64  # CPU test env
    assert GP(cars_ds, dtype=np.float32)._dtype == jnp.float32
    monkeypatch.setattr(jax_utils.jax, "default_backend", lambda: "tpu")
    assert jax_utils.default_model_dtype() == jnp.float32
    assert GP(cars_ds)._dtype == jnp.float32
    assert GP(cars_ds, dtype=np.float64)._dtype == jnp.float64
    monkeypatch.setenv("GUMBI_TPU_X64", "1")  # explicit force wins
    assert jax_utils.default_model_dtype() == jnp.float64


def test_bucket_padding_exact(cars_ds):
    """Bucket-padded fits must reproduce the unpadded MLL and predictions
    exactly (masked identity rows contribute zero)."""
    gp1 = GP(cars_ds)
    gp1.fit(outputs=["mpg"], continuous_dims=["horsepower"],
            MAP_kwargs=dict(n_restarts=2, maxiter=100))
    gp2 = GP(cars_ds)
    gp2.fit(outputs=["mpg"], continuous_dims=["horsepower"], bucket=128,
            MAP_kwargs=dict(n_restarts=2, maxiter=100))
    assert gp2._xc.shape[0] % 128 == 0
    assert np.isclose(gp1._neg_logp, gp2._neg_logp, rtol=1e-10)
    gp1.prepare_grid(resolution=9)
    gp2.prepare_grid(resolution=9)
    y1 = gp1.predict_grid()
    y2 = gp2.predict_grid()
    assert np.allclose(y1.μ, y2.μ, rtol=1e-8)
    assert np.allclose(y1.σ2, y2.σ2, rtol=1e-8)


def test_multioutput_gradients(cars_ds):
    """Gradient oracle for two outputs on linear surfaces
    (reference tests/test_botorch.py:276-340 analog)."""
    import pandas as pd

    res = 5
    g1, g2 = np.meshgrid(np.linspace(0, 1, res), np.linspace(0, 1, res))
    out = g1 + g2
    df = pd.DataFrame(
        {
            "input_0": g1.ravel(),
            "input_1": g2.ravel(),
            "output_0": out.ravel(),
            "output_1": out.ravel() + 0.5,
        }
    )
    ds = DataSet(df, outputs=["output_0", "output_1"])
    gp = GP(ds)
    gp.fit(
        outputs=["output_0", "output_1"],
        continuous_dims=["input_0", "input_1"],
        MAP_kwargs=dict(n_restarts=2, maxiter=200),
    )

    gp.prepare_grid(
        resolution=res * 2,
        limits=gp.parray(input_0=(0.25, 0.75), input_1=(0.25, 0.75), stdzd=False),
    )
    dydX = gp.predict_grid_grad(norm=False)
    assert len(dydX.names) == 4  # 2 outputs × 2 inputs
    vals = np.concatenate([dydX[n].values().ravel() for n in dydX.names])
    assert np.allclose(vals, 1.0, atol=0.1), (vals.min(), vals.max())

    norms = gp.predict_grid_grad(norm=True)
    assert len(norms.names) == 2
    nv = np.concatenate([norms[n].values().ravel() for n in norms.names])
    assert np.allclose(nv, np.sqrt(2), atol=0.1)

    # Tall-array entry point (reference botorch/GP.py:535-577): raw z-space
    # gradients at the prepared tall points, consistent with the high-level path.
    points_array, _, _ = gp._prepare_points_for_prediction(gp.grid_points, output=gp.outputs)
    raw = gp.predict_grad(np.asarray(points_array))
    assert raw.shape == (points_array.shape[0], 2)
    assert np.all(np.isfinite(raw))
    # On the linear surface every z-space partial is σx/σy-scaled constant > 0
    assert np.all(raw > 0)


# ------------------------------------------------------------------
# Independent (ModelListGP) structure: widened composition
# (reference gumbi/regression/botorch/GP.py:253-267)
# ------------------------------------------------------------------


def test_independent_matches_per_output_fits(cars_ds):
    """Exact oracle: the Independent fit IS a list of single-output fits —
    output j's sub-model must equal a standalone single-output GP fit with
    the matching restart seed."""
    gp = GP(cars_ds)
    gp.fit(
        outputs=["mpg", "acceleration"],
        continuous_dims=["horsepower"],
        multitask_kernel="Independent",
        MAP_kwargs=dict(n_restarts=2, maxiter=100),
    )
    assert gp._structure == "Independent"
    for name in ["mpg", "acceleration"]:
        j = gp._ind_output_index(name)
        solo = GP(cars_ds)
        solo.fit(
            outputs=[name],
            continuous_dims=["horsepower"],
            seed=gp.seed + j,
            MAP_kwargs=dict(n_restarts=2, maxiter=100),
        )
        for k, v in solo.MAP.items():
            np.testing.assert_allclose(
                np.asarray(gp.MAP[name][k]), np.asarray(v), rtol=1e-6,
                err_msg=f"{name}:{k}",
            )


def test_independent_with_extra_categorical(cars_ds):
    """Independent composes with extra categorical dims: the sub-models keep
    the non-output coregion factors (reference ModelListGP wraps mixed
    single-task models, ref botorch/GP.py:205-216, :253-267)."""
    gp = GP(cars_ds)
    gp.fit(
        outputs=["mpg", "acceleration"],
        continuous_dims=["horsepower"],
        categorical_dims=["origin"],
        multitask_kernel="Independent",
        MAP_kwargs=dict(n_restarts=2, maxiter=80),
    )
    assert gp._structure == "Independent"
    # cross_validate refits via build_model(**model_specs): the structure
    # choice must survive the round-trip
    assert gp.model_specs["multitask_kernel"] == "Independent"
    coreg_names = [cg.name for t in gp._spec.terms for cg in t.coregs]
    assert coreg_names == ["origin"], coreg_names  # out column dropped
    assert "W_origin" in gp.MAP["mpg"]
    gp.prepare_grid(resolution=6)
    y = gp.predict_grid(categorical_levels={"origin": "usa"})
    assert y.shape == (6,)
    assert np.allclose(y.cor, np.eye(2))
    # Different categorical levels give different surfaces
    y2 = gp.predict_grid(categorical_levels={"origin": "japan"})
    assert not np.allclose(
        y.get("mpg").μ.ravel(), y2.get("mpg").μ.ravel()
    )


def test_independent_additive(cars_ds):
    """Independent composes with additive structure: each sub-model keeps
    the global + per-category additive terms."""
    gp = GP(cars_ds)
    gp.fit(
        outputs=["mpg", "acceleration"],
        continuous_dims=["horsepower"],
        categorical_dims=["origin"],
        additive=True,
        multitask_kernel="Independent",
        MAP_kwargs=dict(n_restarts=2, maxiter=60),
    )
    assert gp._structure == "Independent"
    assert len(gp._spec.terms) == 2  # global + origin
    gp.prepare_grid(resolution=5)
    y = gp.predict_grid(categorical_levels={"origin": "usa"})
    assert y.shape == (5,)
    assert np.allclose(y.cor, np.eye(2))


def test_independent_gradients(cars_ds):
    """Gradient oracle on linear surfaces under the Independent structure
    (per-output sub-model gradients, ref tests/test_botorch.py:276-340)."""
    import pandas as pd

    res = 5
    g1, g2 = np.meshgrid(np.linspace(0, 1, res), np.linspace(0, 1, res))
    out = g1 + g2
    df = pd.DataFrame(
        {
            "input_0": g1.ravel(),
            "input_1": g2.ravel(),
            "output_0": out.ravel(),
            "output_1": out.ravel() + 0.5,
        }
    )
    ds = DataSet(df, outputs=["output_0", "output_1"])
    gp = GP(ds)
    gp.fit(
        outputs=["output_0", "output_1"],
        continuous_dims=["input_0", "input_1"],
        multitask_kernel="Independent",
        MAP_kwargs=dict(n_restarts=2, maxiter=200),
    )
    assert gp._structure == "Independent"
    gp.prepare_grid(
        resolution=res * 2,
        limits=gp.parray(input_0=(0.25, 0.75), input_1=(0.25, 0.75), stdzd=False),
    )
    dydX = gp.predict_grid_grad(norm=False)
    vals = np.concatenate([dydX[n].values().ravel() for n in dydX.names])
    assert np.allclose(vals, 1.0, atol=0.1), (vals.min(), vals.max())
    norms = gp.predict_grid_grad(norm=True)
    nv = np.concatenate([norms[n].values().ravel() for n in norms.names])
    assert np.allclose(nv, np.sqrt(2), atol=0.1)


def test_independent_save_load_roundtrip(cars_ds, tmp_path):
    """Per-output sub-model parameters survive a save/load roundtrip."""
    gp = GP(cars_ds)
    gp.fit(
        outputs=["mpg", "acceleration"],
        continuous_dims=["horsepower"],
        categorical_dims=["origin"],
        multitask_kernel="Independent",
        MAP_kwargs=dict(n_restarts=2, maxiter=60),
    )
    gp.prepare_grid(resolution=5)
    y1 = gp.predict_grid(categorical_levels={"origin": "usa"})
    path = tmp_path / "ind.npz"
    gp.save(path)
    gp2 = GP.load(path, cars_ds)
    assert gp2._structure == "Independent"
    gp2.prepare_grid(resolution=5)
    y2 = gp2.predict_grid(categorical_levels={"origin": "usa"})
    np.testing.assert_allclose(
        np.asarray(y1.get("mpg").μ, dtype=float),
        np.asarray(y2.get("mpg").μ, dtype=float),
        rtol=1e-10,
    )


def test_ard_off_shares_one_lengthscale(cars_ds):
    """ARD=False fits a single shared lengthscale across continuous dims
    (reference tests/test_botorch.py parametrizes ARD on/off)."""
    gp = GP(cars_ds)
    gp.fit(
        outputs=["mpg"],
        continuous_dims=["horsepower", "weight"],
        ARD=False,
        MAP_kwargs=dict(n_restarts=2, maxiter=80),
    )
    ls = np.asarray(gp.MAP["ls_total"])
    assert ls.size == 1, ls.shape
    gp2 = GP(cars_ds)
    gp2.fit(
        outputs=["mpg"],
        continuous_dims=["horsepower", "weight"],
        ARD=True,
        MAP_kwargs=dict(n_restarts=2, maxiter=80),
    )
    assert np.asarray(gp2.MAP["ls_total"]).size == 2
    gp.prepare_grid(resolution=5)
    y = gp.predict_grid()
    assert np.all(np.isfinite(np.asarray(y.μ, dtype=float)))


def test_conditional_prediction_interpolation_oracle(cars_ds):
    """2-D conditional slice ≈ direct prediction along the slice
    (reference base.py:1111-1178: scipy interpn over μ and σ2)."""
    gp = GP(cars_ds)
    gp.fit(
        outputs=["mpg"],
        continuous_dims=["horsepower", "weight"],
        MAP_kwargs=dict(n_restarts=2, maxiter=100),
    )
    gp.prepare_grid(resolution=21)
    gp.predict_grid()

    # Condition on the exact middle grid value of weight: the interpolated
    # slice must match the corresponding row of the full grid prediction.
    w_mid_z = float(np.asarray(gp.grid_vectors["weight"].z.values()).squeeze()[10])
    w_mid = float(np.asarray(gp.grid_vectors["weight"].values()).squeeze()[10])
    grid_mu = np.asarray(gp.predictions.μ, dtype=float)  # (21, 21) ij-indexed
    cond_x, cond = gp.get_conditional_prediction(weight=w_mid)
    assert cond.shape == (21,)
    np.testing.assert_allclose(
        np.asarray(cond.μ, dtype=float), grid_mu[:, 10], rtol=1e-6,
        err_msg=f"conditioned at weight={w_mid} (z={w_mid_z})",
    )
    np.testing.assert_allclose(
        np.asarray(cond.σ2, dtype=float),
        np.asarray(gp.predictions.σ2, dtype=float)[:, 10],
        rtol=1e-6,
    )


def test_periodic_save_load_preserves_model_specs(tmp_path):
    """save()/load() must round-trip parray-valued model_specs (period,
    ls_bounds) as parrays, not JSON-stringified reprs: the loaded model's
    cross_validate replays build_model(**model_specs)."""
    rng = np.random.default_rng(0)
    import pandas as pd

    x = np.linspace(0, 4, 60)
    y = np.sin(2 * np.pi * x) + rng.normal(0, 0.1, 60) + 3.0
    df = pd.DataFrame({"x": x, "y": y})
    ds = DataSet(df, outputs=["y"])
    gp = GP(ds)
    period = gp.parray(x=1.0)
    gp.fit(
        outputs=["y"],
        continuous_dims=["x"],
        continuous_kernel="Periodic",
        period=period,
        MAP_kwargs=dict(n_restarts=2, maxiter=60),
    )
    path = tmp_path / "periodic.npz"
    gp.save(path)
    gp2 = GP.load(path, ds)

    restored = gp2.model_specs["period"]
    assert hasattr(restored, "z"), f"period came back as {type(restored)}"
    assert np.allclose(
        np.asarray(restored["x"].z.values(), dtype=float),
        np.asarray(period["x"].z.values(), dtype=float),
    )
    # The restored specs must be replayable (this is what cross_validate does)
    gp2.build_model(**gp2.model_specs)
    gp2.prepare_grid(resolution=10)


def test_sparse_joint_draws(cars_ds):
    """draw_point_samples on a sparse fit samples the FITC posterior (the
    reference has no sparse sampling path — sparse+latent raises, ref
    GP.py:587). Oracle: empirical draw moments converge to fitc_predict's
    mean/variance, and bucket padding must not change the draw law."""
    gp = GP(cars_ds)
    gp.fit(outputs=["mpg"], continuous_dims=["horsepower"],
           sparse=True, n_u=20, MAP_kwargs=dict(n_restarts=2, maxiter=100))
    gp.prepare_grid(resolution=9)
    draws = gp.draw_grid_samples(n_samples=4000, seed=0)
    emp_mu = draws.z.values().mean(axis=0)
    emp_sd = draws.z.values().std(axis=0)

    pts = gp.grid_points
    points_array, _, _ = gp._prepare_points_for_prediction(pts, output=["mpg"])
    mu, var = gp.predict(points_array, with_noise=False)
    np.testing.assert_allclose(emp_mu, mu, atol=4.5 * np.sqrt(var.max() / 4000) + 1e-3)
    np.testing.assert_allclose(emp_sd, np.sqrt(var), rtol=0.12, atol=1e-3)
    assert "posterior_samples" in gp.sample_vars

    # Padded sparse fit: same inducing set and hyperparameters → same draws
    gp_b = GP(cars_ds)
    gp_b.fit(outputs=["mpg"], continuous_dims=["horsepower"],
             sparse=True, n_u=20, bucket=128,
             MAP_kwargs=dict(n_restarts=2, maxiter=100))
    gp_b.prepare_grid(resolution=9)
    draws_b = gp_b.draw_grid_samples(n_samples=50, seed=3)
    d0 = gp.draw_grid_samples(n_samples=50, seed=3)
    np.testing.assert_allclose(
        draws_b.z.values(), d0.z.values(), rtol=1e-4, atol=1e-5
    )


def test_sparse_bucket_padding_exact(cars_ds):
    """Sparse FITC fits with bucket padding must reproduce the unpadded
    sparse fit exactly: select_inducing clusters only the real rows and the
    masked FITC evidence/predictions zero the padded rows' 1/λ weights
    (the λ→∞ row-deletion limit with static shapes)."""
    common = dict(outputs=["mpg"], continuous_dims=["horsepower"],
                  sparse=True, n_u=20, MAP_kwargs=dict(n_restarts=2, maxiter=100))
    gp1 = GP(cars_ds)
    gp1.fit(**common)
    gp2 = GP(cars_ds)
    gp2.fit(bucket=128, **common)
    assert gp2._xc.shape[0] % 128 == 0
    assert gp2._xc.shape[0] > gp1._xc.shape[0]  # padding actually happened
    # Identical inducing points (k-means must not see padded zeros)
    assert np.allclose(np.asarray(gp1._xu_c), np.asarray(gp2._xu_c))
    # rtol 1e-6: masked reductions reorder float sums (a padding LEAK would
    # shift the objective at the 1e-2 scale, ~6 orders above this)
    assert np.isclose(gp1._neg_logp, gp2._neg_logp, rtol=1e-6)
    gp1.prepare_grid(resolution=9)
    gp2.prepare_grid(resolution=9)
    y1 = gp1.predict_grid()
    y2 = gp2.predict_grid()
    assert np.allclose(y1.μ, y2.μ, rtol=1e-6)
    assert np.allclose(y1.σ2, y2.σ2, rtol=1e-6)


def test_coercion_coords_drop_identity_maps():
    """Continuous dims carry value→itself coordinate maps (one entry per
    unique observation); _coercion_coords must drop them — feeding them to
    DataFrame.replace is a no-op pandas executes one masked scan per entry
    (measured 23 s at N=50k: it was the entire cost of prepare_grid at
    scale). Categorical level→code maps must survive."""
    import numpy as np
    import pandas as pd

    import gumbi_tpu as gmb

    rng = np.random.default_rng(0)
    n = 500
    df = pd.DataFrame({
        "x1": rng.uniform(-2, 2, n),
        "cat": rng.choice(["a", "b", "c"], n),
        "y": rng.normal(size=n),
    })
    ds = gmb.DataSet(df, outputs=["y"])
    gp = gmb.GP(ds)
    gp.specify_model(outputs=["y"], continuous_dims=["x1"],
                     categorical_dims=["cat"])
    cc = gp._coercion_coords()
    assert "x1" not in cc, "identity map for a continuous dim must be dropped"
    assert set(cc.get("cat", {}).keys()) == {"a", "b", "c"}
    X, y = gp.get_structured_data()
    codes = set(np.asarray(X["cat"].values()).ravel().tolist())
    assert codes <= {0.0, 1.0, 2.0}
