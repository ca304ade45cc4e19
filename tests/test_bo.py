"""Bayesian optimization: acquisition functions and GP.propose."""

import numpy as np
import pytest

import jax.numpy as jnp

import gumbi_tpu as gmb
from gumbi_tpu.ops.acquisition import (
    _hv2d,
    expected_improvement,
    hv_dominated_mc,
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


def _hv_exact_inclusion_exclusion(points, ref):
    """Exact dominated hypervolume by inclusion-exclusion (any D, small P)."""
    from itertools import combinations

    points = np.maximum(np.asarray(points), np.asarray(ref))
    P = len(points)
    total = 0.0
    for k in range(1, P + 1):
        for idx in combinations(range(P), k):
            corner = np.min(points[list(idx)], axis=0)
            total += (-1) ** (k + 1) * np.prod(np.maximum(corner - ref, 0.0))
    return total


def test_hv_mc_matches_exact_2d_and_3d():
    rng = np.random.default_rng(0)
    u2 = jnp.asarray(sobol_uniform(4096, 2, seed=2))
    u3 = jnp.asarray(sobol_uniform(8192, 3, seed=3))

    for _ in range(5):
        pts2 = jnp.asarray(rng.uniform(0.1, 3.0, size=(5, 2)))
        ref2 = jnp.zeros(2)
        exact = float(_hv2d(pts2, ref2))
        mc = float(hv_dominated_mc(pts2, ref2, u2))
        assert np.isclose(mc, exact, rtol=0.02), (mc, exact)

    for _ in range(5):
        pts3 = rng.uniform(0.1, 3.0, size=(5, 3))
        ref3 = np.zeros(3)
        exact = _hv_exact_inclusion_exclusion(pts3, ref3)
        mc = float(hv_dominated_mc(jnp.asarray(pts3), jnp.asarray(ref3), u3))
        assert np.isclose(mc, exact, rtol=0.03), (mc, exact)


def test_hv_mc_improvement_geometry():
    """A Pareto-improving point adds volume; a dominated point adds ~none."""
    rng = np.random.default_rng(1)
    base = rng.uniform(0.2, 1.0, size=(8, 3))
    ref = np.zeros(3)
    u = jnp.asarray(sobol_uniform(8192, 3, seed=4))
    hv_base = float(hv_dominated_mc(jnp.asarray(base), jnp.asarray(ref), u))
    improving = np.vstack([base, [1.2, 1.2, 1.2]])
    dominated = np.vstack([base, [0.1, 0.1, 0.1]])
    hv_imp = float(hv_dominated_mc(jnp.asarray(improving), jnp.asarray(ref), u))
    hv_dom = float(hv_dominated_mc(jnp.asarray(dominated), jnp.asarray(ref), u))
    assert hv_imp > hv_base + 0.1
    assert abs(hv_dom - hv_base) < 0.02


def test_propose_qnehvi_three_outputs_avoids_dominated_region():
    """General-D parity (reference qLogNEHVI, ref botorch/GP.py:745-753):
    with all three outputs increasing in x, the Pareto-optimal region is the
    top of the box — proposals must not land in the dominated low-x half."""
    rng = np.random.default_rng(5)
    x = rng.uniform(0.0, 1.0, 36)
    df_dict = {"x": x}
    for j, slope in enumerate([1.0, 0.8, 1.2]):
        df_dict[f"out_{j}"] = slope * x + 0.05 * rng.normal(size=len(x))
    import pandas as pd

    ds = gmb.DataSet(pd.DataFrame(df_dict), outputs=["out_0", "out_1", "out_2"])
    gp = gmb.GP(ds)
    gp.fit(
        outputs=["out_0", "out_1", "out_2"],
        continuous_dims=["x"],
        multitask_kernel="Hadamard",
        MAP_kwargs=dict(n_restarts=2, maxiter=100),
    )
    # sequential (greedy) mode matches the reference's optimize_acqf usage
    # (ref botorch/GP.py:761-769) and avoids the q-joint flat-plateau trap
    cands, val = gp.propose(
        q=2, raw_samples=64, num_restarts=4, mc_samples=32, max_baseline=12,
        sequential=True,
    )
    assert cands.shape == (2,)
    assert np.isfinite(val)
    xs = cands.values()
    assert np.all(xs > np.median(x)), f"proposals {xs} landed in the dominated region"


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


def test_qlog_nei_invariant_to_duplicated_baseline():
    """Padding the baseline with repeated rows must not change qLogNEI.

    GP.propose pads the baseline to a static size for lab-loop program
    reuse; duplicates leave the incumbent (smooth) max over baseline draws
    unchanged only in the exact-max limit, and nearly so for the smoothed
    max — pin that the acquisition ranking over candidates is unaffected.
    """
    import jax.numpy as jnp

    from gumbi_tpu.ops import GPSpec, GPTerm
    from gumbi_tpu.ops.acquisition import qlog_nei, sobol_normal
    from gumbi_tpu.ops.posterior import posterior_cache

    rng = np.random.default_rng(0)
    n = 24
    xc = jnp.asarray(rng.uniform(-2, 2, size=(n, 1)))
    xk = jnp.zeros((n, 0), dtype=jnp.int32)
    y = jnp.asarray(np.sin(1.4 * np.asarray(xc)[:, 0]) + rng.normal(0, 0.05, n))
    spec = GPSpec(terms=(GPTerm(suffix="total", kernel="ExpQuad"),), d_cont=1, ard=True)
    params = {
        "ls_total": jnp.asarray([0.6]),
        "η_total": jnp.asarray(1.0),
        "σ": jnp.asarray(0.1),
    }
    cache = posterior_cache(spec, params, xc, xk, y)

    nb = 8
    xc_base = xc[:nb]
    reps = 3
    xc_pad = jnp.concatenate([xc_base] * reps)[: nb * reps]
    cands = jnp.asarray(rng.uniform(-2, 2, size=(5, 1, 1)))

    def scores(xc_b):
        m = xc_b.shape[0]
        bs = jnp.asarray(sobol_normal(256, 1 + m, seed=0))
        xk_c = jnp.zeros((1, 0), dtype=jnp.int32)
        xk_b = jnp.zeros((m, 0), dtype=jnp.int32)
        return np.asarray(
            [
                float(qlog_nei(spec, params, cache, c, xk_c, xc_b, xk_b, bs))
                for c in cands
            ]
        )

    s_plain = scores(xc_base)
    s_padded = scores(xc_pad)
    # The padded run draws a different (larger) QMC base-sample matrix, so
    # raw log-EI values agree only statistically — and for candidates with
    # tiny improvement the MC error in LOG units is large by construction.
    # The operative invariant is what acquisition maximization consumes:
    # the candidate RANKING, which duplicate baseline rows must not change.
    assert list(np.argsort(s_plain)) == list(np.argsort(s_padded))
    assert int(np.argmax(s_plain)) == int(np.argmax(s_padded))


def test_propose_qnehvi_independent_structure():
    """Model-list (Independent) proposal: the block-diagonal joint sampler
    (make_indep_sample_fn) must steer qNEHVI to the Pareto region exactly
    like the joint-model path (reference ModelListGP propose,
    ref botorch/GP.py:253-267, :745-753)."""
    rng = np.random.default_rng(7)
    x = rng.uniform(0.0, 1.0, 36)
    import pandas as pd

    df = pd.DataFrame(
        {
            "x": x,
            "out_0": 1.0 * x + 0.05 * rng.normal(size=len(x)),
            "out_1": 0.8 * x + 0.05 * rng.normal(size=len(x)),
        }
    )
    ds = gmb.DataSet(df, outputs=["out_0", "out_1"])
    gp = gmb.GP(ds)
    gp.fit(
        outputs=["out_0", "out_1"],
        continuous_dims=["x"],
        multitask_kernel="Independent",
        MAP_kwargs=dict(n_restarts=2, maxiter=100),
    )
    assert gp._structure == "Independent"
    cands, val = gp.propose(
        q=2, raw_samples=64, num_restarts=4, mc_samples=32, max_baseline=12,
        sequential=True,
    )
    assert cands.shape == (2,)
    assert np.isfinite(val)
    xs = cands.values()
    assert np.all(xs > np.median(x)), f"proposals {xs} landed in the dominated region"


def test_indep_sample_fn_block_layout():
    """The block-diagonal sampler reproduces each sub-model's posterior
    exactly in its own rows (layout oracle: manual per-block mean + eps·Lᵀ)."""
    import jax.numpy as jnp

    from gumbi_tpu.ops import GPSpec, GPTerm, initial_params, posterior_cache
    from gumbi_tpu.ops.acquisition import (
        DEFAULT_JITTER,
        make_indep_sample_fn,
        sobol_normal,
    )
    from gumbi_tpu.ops.posterior import predict_cov
    from gumbi_tpu.ops.priors import constrain

    spec = GPSpec(terms=(GPTerm(suffix="total", kernel="ExpQuad"),), d_cont=1)
    rng = np.random.default_rng(0)
    params_list, cache_list = [], []
    for j in range(2):
        xc = jnp.asarray(rng.uniform(-1, 1, (10, 1)))
        xk = jnp.zeros((10, 0), dtype=jnp.int32)
        y = jnp.asarray(rng.normal(size=10))
        u0 = initial_params(spec, np.array([2.0]), np.array([1.0]), 1, seed=j)
        p = constrain({k: v[0] for k, v in u0.items()})
        params_list.append(p)
        cache_list.append(posterior_cache(spec, p, xc, xk, y))

    q, nb, d_out = 2, 3, 2
    P = d_out * (q + nb)
    xc_joint = jnp.asarray(rng.uniform(-1, 1, (P, 1)))
    # out column at index 0 of a 1-column Xk (plain multi-output layout)
    xk_joint = jnp.asarray(
        np.concatenate(
            [np.repeat([0, 1], q), np.repeat([0, 1], nb)]
        ).reshape(-1, 1).astype(np.int32)
    )
    eps = jnp.asarray(sobol_normal(64, P, seed=3))
    fn = make_indep_sample_fn(spec, params_list, cache_list, out_col_idx=0)
    ys = np.asarray(fn(xc_joint, xk_joint, eps, d_out, q, nb))

    for j in range(2):
        idx = np.concatenate(
            [np.arange(j * q, (j + 1) * q), np.arange(d_out * q + j * nb, d_out * q + (j + 1) * nb)]
        )
        xk_red = jnp.zeros((q + nb, 0), dtype=jnp.int32)
        mean, cov = predict_cov(
            spec, params_list[j], cache_list[j], xc_joint[idx], xk_red, with_noise=False
        )
        L = np.linalg.cholesky(
            np.asarray(cov) + DEFAULT_JITTER * np.eye(q + nb)
        )
        expect = np.asarray(mean)[None, :] + np.asarray(eps)[:, idx] @ L.T
        np.testing.assert_allclose(ys[:, idx], expect, rtol=1e-8, atol=1e-10)
