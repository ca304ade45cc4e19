"""HMC sampling, GPC, FITC, checkpointing, cross-validation, profiling."""

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

import gumbi_tpu as gmb
from gumbi_tpu.utils.profiling import Timings, phase


@pytest.fixture(scope="module")
def small_ds():
    df = gmb.data.cars(n=40, seed=11)
    return gmb.DataSet(
        df, outputs=["mpg", "acceleration"], log_vars=["mpg", "acceleration", "horsepower"]
    )


@pytest.fixture(scope="module")
def fitted(small_ds):
    gp = gmb.GP(small_ds)
    gp.fit(
        outputs=["mpg"],
        continuous_dims=["horsepower"],
        MAP_kwargs=dict(n_restarts=2, maxiter=100),
    )
    return gp


def test_hmc_standard_normal():
    """The sampler must recover a known Gaussian's moments."""
    from gumbi_tpu.ops.hmc import hmc_sample

    import jax

    def logp(q):
        return -0.5 * jnp.sum(q["x"] ** 2) - 0.5 * jnp.sum((q["z"] - 2.0) ** 2 / 4.0)

    q0 = {"x": jnp.zeros(3), "z": jnp.zeros(2)}
    samples, stats = hmc_sample(
        logp, q0, jax.random.PRNGKey(0), draws=800, tune=400, chains=2, n_leapfrog=16
    )
    xs = np.asarray(samples["x"]).reshape(-1, 3)
    zs = np.asarray(samples["z"]).reshape(-1, 2)
    assert float(stats["mean_accept"]) > 0.5
    assert np.allclose(xs.mean(0), 0.0, atol=0.15)
    assert np.allclose(xs.std(0), 1.0, atol=0.2)
    assert np.allclose(zs.mean(0), 2.0, atol=0.3)
    assert np.allclose(zs.std(0), 2.0, atol=0.4)


def test_chees_standard_normal():
    """ChEES-HMC must recover a known anisotropic Gaussian's moments with no
    trajectory-length knob: T adapts by cross-chain gradient ascent during
    warmup, acceptance hits the dual-averaging target."""
    from gumbi_tpu.ops.hmc import chees_sample

    import jax

    def logp(q):
        return -0.5 * jnp.sum(q["x"] ** 2) - 0.5 * jnp.sum((q["z"] - 2.0) ** 2 / 4.0)

    q0 = {"x": jnp.zeros(3), "z": jnp.zeros(2)}
    samples, stats = chees_sample(
        logp, q0, jax.random.PRNGKey(0), draws=800, tune=600, chains=16
    )
    xs = np.asarray(samples["x"]).reshape(-1, 3)
    zs = np.asarray(samples["z"]).reshape(-1, 2)
    # adapted diagnostics must be finite and sane
    assert 0.5 < float(stats["mean_accept"]) < 1.0
    assert float(stats["trajectory_length"]) > 0.0
    assert float(stats["step_size"]) > 0.0
    assert np.allclose(xs.mean(0), 0.0, atol=0.15)
    assert np.allclose(xs.std(0), 1.0, atol=0.2)
    # the z block has std 2 — the whitened criterion must handle anisotropy
    assert np.allclose(zs.mean(0), 2.0, atol=0.3)
    assert np.allclose(zs.std(0), 2.0, atol=0.4)


def test_sample_rejects_unknown_sampler(fitted):
    with pytest.raises(ValueError, match="sampler"):
        fitted.sample(draws=2, tune=2, sampler="nuts!")


@pytest.mark.slow
def test_gp_sample_chees_matches_hmc(fitted):
    """The default (ChEES) sampler and fixed-length HMC target the same
    posterior: medians of the lengthscale trace must agree."""
    t_chees = fitted.sample(draws=150, tune=150, chains=8, seed=5)
    med_chees = np.median(np.asarray(t_chees["ls_total"]).ravel())
    assert float(t_chees["_stats"]["mean_accept"]) > 0.4
    t_hmc = fitted.sample(draws=150, tune=150, chains=2, n_leapfrog=16, sampler="hmc", seed=5)
    med_hmc = np.median(np.asarray(t_hmc["ls_total"]).ravel())
    assert np.isclose(med_chees, med_hmc, rtol=0.35)


@pytest.mark.slow
def test_gp_sample_and_trace_draws(fitted):
    trace = fitted.sample(draws=100, tune=100, chains=2, n_leapfrog=16, sampler="hmc")
    assert trace["ls_total"].shape[:2] == (2, 100)
    assert np.all(trace["σ"] > 0)
    # Posterior should concentrate near the MAP
    assert np.isfinite(trace["_stats"]["mean_accept"])

    X, _ = fitted.get_structured_data()
    pts = X[:5]
    draws = fitted.draw_point_samples(pts, n_samples=4, source=trace)
    assert draws.values().shape == (4, 5)


def test_draw_point_samples_map(fitted):
    X, _ = fitted.get_structured_data()
    pts = X[:6]
    draws = fitted.draw_point_samples(pts, n_samples=3)
    assert draws.values().shape == (3, 6)
    # Draws should be positive (log-normal output) and near the data scale
    assert np.all(draws.values() > 0)


def test_draw_point_samples_multioutput_correlated(small_ds):
    """Multi-output draws are JOINT: their empirical covariance across the
    (point, output) stack must match the exact tall posterior covariance
    (the reference declares this NotImplemented, ref GP.py:898)."""
    import jax

    from gumbi_tpu.ops.posterior import predict_cov

    gp = gmb.GP(small_ds)
    gp.fit(
        outputs=["mpg", "acceleration"],
        continuous_dims=["horsepower"],
        multitask_kernel="Hadamard",
        MAP_kwargs=dict(n_restarts=2, maxiter=100),
    )
    X, _ = gp.get_structured_data()
    hp = np.asarray(X["horsepower"].values()).ravel()
    # Off-data points (midpoints + extrapolation): posterior variance and
    # cross-output covariance are not pinned to ~0 there.
    hp_s = np.sort(np.unique(hp))
    pts = gp.parray(
        horsepower=np.array(
            [0.5 * (hp_s[0] + hp_s[1]), 0.5 * (hp_s[-2] + hp_s[-1]), hp_s[-1] * 1.15]
        )
    )
    draws = gp.draw_point_samples(pts, n_samples=4000, with_noise=False, seed=0)
    assert set(draws.names) == {"mpg", "acceleration"}
    samples = np.stack(
        [draws["mpg"].z.values(), draws["acceleration"].z.values()], axis=1
    )  # (S, 2, 3) in z-space, matching predict_cov's space
    flat = samples.reshape(samples.shape[0], -1)  # stack outputs then points

    points_array, _, _ = gp._prepare_points_for_prediction(pts, output=gp.outputs)
    xc, xk = gp._split_X(np.asarray(points_array))
    _, cov = predict_cov(
        gp._spec, gp._params, gp._ensure_dense_cache(), xc, xk, with_noise=False
    )
    cov = np.asarray(cov)
    emp = np.cov(flat.T)
    scale = float(np.max(np.diag(cov)))
    np.testing.assert_allclose(emp, cov, atol=0.08 * scale)
    # The LMC outputs must be genuinely correlated in the joint draws, not
    # just matching per-output marginals: compare the largest cross-output
    # correlation coefficient against the exact posterior's.
    D = np.sqrt(np.diag(cov))
    cor_true = cov / np.outer(D, D)
    cross = cor_true[:3, 3:]
    i, j = np.unravel_index(np.argmax(np.abs(cross)), cross.shape)
    assert abs(cross[i, j]) > 0.05, "test setup: expected real cross-output correlation"
    De = np.sqrt(np.diag(emp))
    emp_cor = emp / np.outer(De, De)
    assert emp_cor[:3, 3:][i, j] == pytest.approx(cross[i, j], abs=0.1)


def test_draw_grid_samples_multioutput_independent(small_ds):
    """Independent-structure multi-output draws: per-output models, zero
    cross-output correlation by construction."""
    gp = gmb.GP(small_ds)
    gp.fit(
        outputs=["mpg", "acceleration"],
        continuous_dims=["horsepower"],
        multitask_kernel="Independent",
        MAP_kwargs=dict(n_restarts=2, maxiter=100),
    )
    gp.prepare_grid(resolution=9)
    draws = gp.draw_grid_samples(n_samples=5)
    assert set(draws.names) == {"mpg", "acceleration"}
    assert draws["mpg"].values().shape == (5, 9)
    assert np.all(np.isfinite(draws.values()))


def test_save_load_roundtrip(tmp_path, fitted, small_ds):
    path = tmp_path / "gp_model.npz"
    fitted.save(path)
    gp2 = gmb.GP.load(path, small_ds)

    assert gp2.continuous_dims == fitted.continuous_dims
    assert np.allclose(gp2.MAP["ls_total"], fitted.MAP["ls_total"])

    X, _ = fitted.get_structured_data()
    m1, v1 = fitted.predict(np.asarray(X.z.values())[:, None][:10])
    m2, v2 = gp2.predict(np.asarray(X.z.values())[:, None][:10])
    assert np.allclose(m1, m2, atol=1e-12)
    assert np.allclose(v1, v2, atol=1e-12)


def test_cross_validate(small_ds):
    gp = gmb.GP(small_ds, outputs="mpg")
    gp.specify_model(outputs=["mpg"], continuous_dims=["horsepower"])
    result = gp.cross_validate(pct_train=0.7, warm_start=False, n_restarts=2, maxiter=80)
    assert set(result.keys()) == {"train", "test"}
    assert np.isfinite(result["train"]["NLPDs"]).all()
    assert np.isfinite(result["test"]["NLPDs"]).all()
    # Train errors should generally be smaller than test errors
    assert np.abs(result["train"]["errors"]).mean() <= np.abs(result["test"]["errors"]).mean() * 3


def test_fitc_close_to_dense(small_ds):
    gp_d = gmb.GP(small_ds)
    gp_d.fit(outputs=["mpg"], continuous_dims=["horsepower"], MAP_kwargs=dict(n_restarts=2, maxiter=100))
    gp_s = gmb.GP(small_ds)
    gp_s.fit(
        outputs=["mpg"], continuous_dims=["horsepower"], sparse=True, n_u=30,
        MAP_kwargs=dict(n_restarts=2, maxiter=100),
    )
    gp_d.prepare_grid(resolution=20)
    gp_s.prepare_grid(resolution=20)
    yd = gp_d.predict_grid()
    ys = gp_s.predict_grid()
    # With n_u close to N the FITC posterior mean tracks the dense one
    assert np.allclose(ys.μ, yd.μ, rtol=0.1, atol=0.5)


def test_gpc_separable():
    rng = np.random.default_rng(2)
    x = rng.uniform(-2, 2, 80)
    labels = (x > 0).astype(float)
    df = pd.DataFrame({"x": x, "label": labels})
    ds = gmb.DataSet(df, outputs=["label"])
    gpc = gmb.GPC(ds)
    gpc.fit(
        outputs=["label"], continuous_dims=["x"], heteroskedastic_outputs=False,
        MAP_kwargs=dict(n_restarts=2, maxiter=80),
    )
    pts = gpc.parray(x=np.array([-1.5, 1.5]))
    proba = gpc.predict_proba(pts)
    assert proba[0] < 0.3 and proba[1] > 0.7

    # Bernoulli likelihood has no Gaussian noise: σ must not be part of the
    # optimized parameter set (it was a dead, prior-only dimension).
    from gumbi_tpu.ops.priors import param_info

    assert "σ" not in gpc.MAP
    info = param_info(gpc._spec)
    assert "σ" not in info
    assert not any("Output_noise" in k for k in info)


def test_profiling_registry():
    reg = Timings()
    with phase("unit", registry=reg):
        pass
    assert "unit" in reg.totals()
    assert reg.report()


def test_fit_records_phases(fitted):
    from gumbi_tpu.utils.profiling import timings

    totals = timings.totals()
    assert "find_MAP" in totals and totals["find_MAP"] > 0


def test_map_is_stationary_point(fitted):
    """The MAP must be a genuine mode of the joint posterior (gradient ≈ 0).

    Offline parity proxy: pm.find_MAP optimizes the same joint density with
    the same priors/transforms, so agreeing on stationarity (and the earlier
    golden-value transform tests) is the strongest check available without
    PyMC installed.
    """
    import jax

    from gumbi_tpu.ops.mll import map_neg_logp
    from gumbi_tpu.ops.priors import unconstrain

    u = unconstrain(fitted._params)
    grads = jax.grad(
        lambda u: map_neg_logp(
            fitted._spec, u, fitted._xc, fitted._xk, fitted._yz,
            jnp.asarray(fitted._ls_alpha), jnp.asarray(fitted._ls_beta),
        )
    )(u)
    gnorm = float(
        np.sqrt(sum(np.sum(np.asarray(g) ** 2) for g in grads.values()))
    )
    assert gnorm < 1e-3, f"MAP gradient norm {gnorm}"


def test_graft_entry_smoke():
    import __graft_entry__ as ge
    import jax

    fn, args = ge.entry()
    mean, var = jax.jit(fn)(*args)
    assert mean.shape == (32,)
    assert np.all(np.asarray(var) >= 0)


def test_predict_diag_chunked_matches(fitted):
    from gumbi_tpu.ops.posterior import predict_diag, predict_diag_chunked

    import jax.numpy as jnp

    g = np.linspace(-2, 2, 37)[:, None]
    xc = jnp.asarray(g)
    xk = jnp.zeros((37, 0), dtype=jnp.int32)
    m1, v1 = predict_diag(fitted._spec, fitted._params, fitted._cache, xc, xk)
    m2, v2 = predict_diag_chunked(
        fitted._spec, fitted._params, fitted._cache, xc, xk, chunk=10
    )
    assert np.allclose(np.asarray(m1), np.asarray(m2), atol=1e-12)
    assert np.allclose(np.asarray(v1), np.asarray(v2), atol=1e-12)


def test_cross_validate_unit_and_train_only(small_ds):
    import pandas as pd

    # Dataset with repeated entities for unit grouping
    df = gmb.data.cars(n=30, seed=13)
    df["batch"] = ["b%d" % (i % 6) for i in range(len(df))]
    ds = gmb.DataSet(
        df, outputs=["mpg", "acceleration"], log_vars=["mpg", "acceleration", "horsepower"]
    )
    gp = gmb.GP(ds, outputs="mpg")
    gp.specify_model(outputs=["mpg"], continuous_dims=["horsepower"])
    result = gp.cross_validate(
        unit="batch", n_train=4, warm_start=False, n_restarts=2, maxiter=60
    )
    assert np.isfinite(result["train"]["NLPDs"]).all()

    # train_only pins matching rows into the training set
    pin_val = df["batch"].iloc[0]
    result2 = gp.cross_validate(
        pct_train=0.7, train_only={"batch": pin_val}, warm_start=False,
        n_restarts=2, maxiter=60,
    )
    train_df = result2["train"]["data"].wide
    assert (train_df["batch"] == pin_val).sum() >= (df["batch"] == pin_val).sum()


def test_cross_validate_train_only_unit_ambiguity():
    """`train_only` criteria that slice part of a `unit` entity must raise.

    Reference guard at base.py:945-955; the round-1 rewrite tested
    len(train_list) > 1 at a point where the list held at most one element,
    so the ambiguity was silently accepted.
    """
    df = gmb.data.cars(n=24, seed=7)
    df["batch"] = ["b%d" % (i % 4) for i in range(len(df))]
    df["flag"] = ["a" if i == 0 else "b" for i in range(len(df))]
    ds = gmb.DataSet(df, outputs=["mpg"], log_vars=["mpg", "horsepower"])
    gp = gmb.GP(ds, outputs="mpg")
    gp.specify_model(outputs=["mpg"], continuous_dims=["horsepower"])
    # flag=='a' pins one row of batch b0 while b0's other rows remain — the
    # entity is partially sliced and n_train's meaning becomes ambiguous
    with pytest.raises(ValueError, match="partially sliced"):
        gp.cross_validate(
            unit="batch", n_train=2, train_only={"flag": "a"}, warm_start=False
        )


def test_draw_grid_samples(fitted):
    fitted.prepare_grid(resolution=12)
    draws = fitted.draw_grid_samples(n_samples=4)
    assert draws.values().shape == (4, 12)


def test_gpc_latent_full_bayes_matches_laplace():
    """ESS full-Bayes over (latents, hypers) agrees with the Laplace
    probability surface on a cleanly separable problem (VERDICT r2 item 6)."""
    rng = np.random.default_rng(5)
    x = rng.uniform(-2, 2, 60)
    labels = (x > 0).astype(float)
    df = pd.DataFrame({"x": x, "label": labels})
    ds = gmb.DataSet(df, outputs=["label"])
    gpc = gmb.GPC(ds)
    gpc.fit(
        outputs=["label"], continuous_dims=["x"], heteroskedastic_outputs=False,
        MAP_kwargs=dict(n_restarts=2, maxiter=80),
    )

    trace = gpc.sample(latent=True, draws=150, tune=150, chains=2, seed=0)
    assert trace["_latent_f"].shape == (2, 150, 60)
    assert 0.05 < float(trace["_stats"]["accept_rate"].mean()) < 0.95
    # Hyper draws are finite natural-space values
    assert np.all(np.isfinite(trace["ls_total"])) and np.all(trace["ls_total"] > 0)

    pts = gpc.parray(x=np.array([-1.5, -0.5, 0.5, 1.5]))
    p_laplace = gpc.predict_proba(pts)
    p_ess = gpc.predict_proba(pts, source=trace, max_draws=64, seed=1)
    # Same side of the boundary, monotone, and close to the Laplace surface
    assert p_ess[0] < 0.3 and p_ess[-1] > 0.7
    assert np.all(np.diff(p_ess) > 0)
    assert np.allclose(p_ess, p_laplace, atol=0.15)


def test_ess_step_terminates_on_nonfinite_factor():
    """A NaN Cholesky factor (non-PD gram at f32) must degrade the ESS
    update to a no-op instead of spinning the bracket-shrink loop forever."""
    import jax

    from gumbi_tpu.ops.ess import _ess_step, bernoulli_loglik

    n = 8
    key = jax.random.PRNGKey(0)
    nu = jax.random.normal(jax.random.PRNGKey(1), (n,))
    y = jnp.asarray(np.arange(n) % 2, dtype=nu.dtype)
    L_bad = jnp.full((n, n), jnp.nan, dtype=nu.dtype)
    out = jax.jit(_ess_step, static_argnums=4)(key, nu, L_bad, y, bernoulli_loglik)
    # Terminates (the assertion would never be reached on a hang) and keeps
    # the current state: proposal(t=0) == nu.
    assert np.allclose(np.asarray(out), np.asarray(nu))


def test_ess_step_normal_operation_moves():
    import jax

    from gumbi_tpu.ops.ess import _ess_step, bernoulli_loglik

    n = 8
    nu = jax.random.normal(jax.random.PRNGKey(1), (n,))
    y = jnp.asarray(np.arange(n) % 2, dtype=nu.dtype)
    L = jnp.eye(n, dtype=nu.dtype)
    out = jax.jit(_ess_step, static_argnums=4)(jax.random.PRNGKey(2), nu, L, y, bernoulli_loglik)
    assert np.all(np.isfinite(np.asarray(out)))
    assert not np.allclose(np.asarray(out), np.asarray(nu))


def test_cross_validate_warm_start_multioutput(small_ds):
    """warm_start=True on a multi-output model: the output column is a
    tidy-only construct and must not be used to group the wide frame
    (previously KeyError: the out_col is not a wide column)."""
    gp = gmb.GP(small_ds)
    gp.specify_model(outputs=["mpg", "acceleration"], continuous_dims=["horsepower"])
    result = gp.cross_validate(pct_train=0.7, warm_start=True, n_restarts=2, maxiter=60)
    assert set(result.keys()) == {"train", "test"}
    assert np.isfinite(result["train"]["NLPDs"]).all()


def test_cross_validate_warm_start_categorical():
    """With a real categorical dim, warm_start guarantees every level
    appears in the training set (the filter must KEEP in-level groups)."""
    df = gmb.data.cars(n=60, seed=2)
    ds = gmb.DataSet(df, outputs=["mpg"], log_vars=["mpg", "horsepower"])
    gp = gmb.GP(ds)
    gp.specify_model(
        outputs=["mpg"], continuous_dims=["horsepower"], categorical_dims=["origin"]
    )
    result = gp.cross_validate(n_train=12, warm_start=True, n_restarts=2, maxiter=60)
    train_levels = set(result["train"]["data"].wide["origin"])
    assert train_levels == set(gp.categorical_levels["origin"])


def test_gpc_save_load_roundtrip(tmp_path):
    """GPC.load must restore the Bernoulli likelihood (previously the spec
    rebuilt as Gaussian and posterior_cache KeyError'd on the missing σ),
    including the bucket mask; probabilities roundtrip exactly."""
    rng = np.random.default_rng(0)
    x = rng.uniform(-2, 2, 25)
    df = pd.DataFrame({"x": x, "hit": (x > 0).astype(float)})
    ds = gmb.DataSet(df, outputs=["hit"])
    for kw in ({}, dict(bucket=16)):
        gpc = gmb.GPC(ds)
        gpc.fit(
            outputs=["hit"], continuous_dims=["x"], heteroskedastic_outputs=False,
            MAP_kwargs=dict(n_restarts=2, maxiter=100), **kw
        )
        gpc.prepare_grid(resolution=11)
        p1 = gpc.predict_grid_proba()
        path = tmp_path / f"gpc_{bool(kw)}.npz"
        gpc.save(path)
        gpc2 = gmb.GPC.load(path, ds)
        assert gpc2._spec.likelihood == "bernoulli"
        gpc2.prepare_grid(resolution=11)
        p2 = gpc2.predict_grid_proba()
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        if kw:
            assert int(np.asarray(gpc2._mask).sum()) == 25


def test_gpc_rejects_non_hadamard_multitask():
    rng = np.random.default_rng(2)
    x = rng.uniform(-2, 2, 30)
    df = pd.DataFrame({"x": x, "label": (x > 0).astype(float)})
    ds = gmb.DataSet(df, outputs=["label"])
    with pytest.raises(NotImplementedError, match="Hadamard"):
        gmb.GPC(ds).fit(
            outputs=["label"], continuous_dims=["x"],
            heteroskedastic_outputs=False, multitask_kernel="Kronecker",
        )


def test_gpc_bucket_matches_unbucketed():
    """Bucket-padded classifier fit == unpadded fit: the masked Laplace
    evidence is exact (padded rows carry zero likelihood and zero W), so the
    hyperparameter optimum and the probability surface must agree."""
    rng = np.random.default_rng(3)
    x = rng.uniform(-2, 2, 29)  # 29 → pads to 32 with bucket=16
    df = pd.DataFrame({"x": x, "label": (x > 0.3).astype(float)})
    ds = gmb.DataSet(df, outputs=["label"])

    gpc_ref = gmb.GPC(ds)
    gpc_ref.fit(
        outputs=["label"], continuous_dims=["x"], heteroskedastic_outputs=False,
        MAP_kwargs=dict(n_restarts=3, maxiter=150),
    )
    gpc_b = gmb.GPC(ds)
    gpc_b.fit(
        outputs=["label"], continuous_dims=["x"], heteroskedastic_outputs=False,
        bucket=16, MAP_kwargs=dict(n_restarts=3, maxiter=150),
    )
    assert gpc_b._xc.shape[0] == 32 and int(np.asarray(gpc_b._mask).sum()) == 29
    assert gpc_b._neg_logp == pytest.approx(gpc_ref._neg_logp, rel=1e-4)

    X = gpc_ref.prepare_grid(resolution=21)
    p_ref = gpc_ref.predict_grid_proba()
    gpc_b.prepare_grid(resolution=21)
    p_b = gpc_b.predict_grid_proba()
    np.testing.assert_allclose(np.asarray(p_b), np.asarray(p_ref), atol=2e-3)

    # Full-Bayes latent sampling also honors the mask
    trace = gpc_b.sample(latent=True, draws=40, tune=40, chains=1, seed=0)
    assert np.all(np.isfinite(trace["_latent_f"]))
    pts = X.ravel()[:5]
    proba = gpc_b.predict_proba(pts, source=trace, max_draws=16)
    assert np.all((proba >= 0) & (proba <= 1))
