"""Oracle tests for the iterative (mBCG + SLQ) exact-GP engine.

The key trick throughout: with the canonical probe basis z_i = √N e_i
(R = N probes) and a full-dimension Krylov space (maxiter = quad_steps = N,
tight tolerance), both the Hutchinson trace estimator and the Lanczos
quadrature are EXACT, so the iterative log-density and its custom-VJP
gradient must match the Cholesky engine to numerical precision — not just
statistically. Statistical accuracy of the practical configuration
(few Rademacher/Gaussian probes, truncated quadrature, preconditioner) is
then pinned separately with loose tolerances.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gumbi_tpu.ops import GPSpec, GPTerm
from gumbi_tpu.ops.iterative import (
    IterConfig,
    _love_factor,
    _make_matvec,
    _make_precond,
    _noise_vec,
    draw_probes,
    iter_gaussian_logp,
    iter_map_neg_logp,
    iter_posterior_cache,
    iter_predict_diag,
    iter_predict_mean,
    lanczos,
    pcg,
    pivoted_cholesky,
)
from gumbi_tpu.ops.kernels import gram, noise_diag
from gumbi_tpu.ops.mll import DEFAULT_JITTER, map_neg_logp, mll


def _problem(n=60, d=2, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    spec = GPSpec(terms=(GPTerm(suffix="total", kernel="ExpQuad"),), d_cont=d)
    xc = jnp.asarray(rng.uniform(-2, 2, size=(n, d)), dtype=dtype)
    xk = jnp.zeros((n, 0), dtype=jnp.int32)
    y = jnp.asarray(
        np.sin(1.3 * np.asarray(xc[:, 0])) + 0.1 * rng.normal(size=n), dtype=dtype
    )
    params = {
        "ls_total": jnp.asarray([0.9, 1.2], dtype=dtype)[:d],
        "η_total": jnp.asarray(1.1, dtype=dtype),
        "σ": jnp.asarray(0.3, dtype=dtype),
    }
    uparams = {k: jnp.log(v) for k, v in params.items()}
    return spec, params, uparams, xc, xk, y


def _dense_A(spec, params, xc, xk, dtype):
    K = np.asarray(gram(spec, params, xc, xk, xc, xk))
    d = np.asarray(noise_diag(spec, params, xk, dtype=dtype)) + DEFAULT_JITTER
    return K + np.diag(d)


def _exact_probes(n, dtype):
    """z_i = √n e_i for i=1..n: Hutchinson and SLQ become exact."""
    return jnp.asarray(np.sqrt(n) * np.eye(n), dtype=dtype)


def test_pcg_matches_direct_solve():
    spec, params, _, xc, xk, y = _problem(n=120)
    A = _dense_A(spec, params, xc, xk, jnp.float64)
    B = jnp.asarray(np.random.default_rng(1).standard_normal((120, 3)))
    X, *_, iters, rel = pcg(lambda V: jnp.asarray(A) @ V, lambda V: V, B, 400, 1e-12)
    ref = np.linalg.solve(A, np.asarray(B))
    assert np.allclose(np.asarray(X), ref, rtol=1e-7, atol=1e-9)
    assert int(iters) < 400  # converged, not capped
    assert float(rel) <= 1e-12  # and the reported residual says so


def test_unconverged_solve_distrusted():
    """At degenerate hyperparameters (ls→0, σ→0) the rank-k preconditioner
    goes near-singular, CG stalls at maxiter, and the SLQ value is garbage —
    observed wrong by 1e8 nats and FAVORABLE, walking the optimizer into the
    singularity. The engine must return −inf (→ +inf objective) for any
    solve whose residual did not reach tolerance, so line searches reject
    the step instead of trusting it."""
    from gumbi_tpu.ops.iterative import _iter_forward, draw_probes

    spec, params, _, xc, xk, y = _problem(n=150, seed=2)
    # f32: the production dtype on TPU, and the precision where the stall
    # manifests (the f64 preconditioner solve still limps to convergence)
    f32 = jnp.float32
    params = {k: jnp.asarray(v, f32) for k, v in params.items()}
    xc, y = jnp.asarray(xc, f32), jnp.asarray(y, f32)
    cfg = IterConfig(maxiter=60, tol=1e-6, n_probes=4, precond_rank=16,
                     quad_steps=24, block=0, love_rank=0)
    pn, pk = draw_probes(0, 150, cfg, dtype=f32)
    # healthy point: finite
    logp, (_, _, _, iters) = _iter_forward(spec, cfg, params, xc, xk, y, pn, pk, None, None)
    assert np.isfinite(float(logp))
    # degenerate point: stalled solve → distrusted
    bad = dict(params)
    bad["ls_total"] = jnp.full_like(params["ls_total"], 1e-6)
    bad["σ"] = jnp.asarray(1e-8, f32)
    logp_bad, (_, _, _, iters_bad) = _iter_forward(spec, cfg, bad, xc, xk, y, pn, pk, None, None)
    assert int(iters_bad) == cfg.maxiter  # the solve really did stall
    assert float(logp_bad) == -np.inf


def test_pivoted_cholesky_full_rank_reconstructs():
    spec, params, _, xc, xk, _ = _problem(n=40)
    K = np.asarray(gram(spec, params, xc, xk, xc, xk))
    Kj = jnp.asarray(K)
    L = pivoted_cholesky(lambda i: Kj[i], jnp.diag(Kj), 40)
    assert np.allclose(np.asarray(L @ L.T), K, atol=1e-8)


def test_preconditioner_woodbury_matches_direct():
    spec, params, _, xc, xk, _ = _problem(n=50)
    K = np.asarray(gram(spec, params, xc, xk, xc, xk))
    d = np.asarray(noise_diag(spec, params, xk, dtype=jnp.float64)) + DEFAULT_JITTER
    Kj = jnp.asarray(K)
    L = pivoted_cholesky(lambda i: Kj[i], jnp.diag(Kj), 15)
    psolve, logdet_p = _make_precond(L, jnp.asarray(d))
    P = np.asarray(L @ L.T) + np.diag(d)
    V = np.random.default_rng(2).standard_normal((50, 4))
    assert np.allclose(np.asarray(psolve(jnp.asarray(V))), np.linalg.solve(P, V), atol=1e-9)
    assert np.isclose(float(logdet_p), np.linalg.slogdet(P)[1], rtol=1e-10)
    # and PCG under the preconditioner still solves the ORIGINAL system
    A = K + 0 * np.eye(50)
    A = _dense_A(spec, params, xc, xk, jnp.float64)
    B = jnp.asarray(np.random.default_rng(3).standard_normal((50, 2)))
    X, *_ = pcg(lambda W: jnp.asarray(A) @ W, psolve, B, 200, 1e-12)
    assert np.allclose(np.asarray(X), np.linalg.solve(A, np.asarray(B)), rtol=1e-7, atol=1e-9)


def test_iter_logp_exact_with_full_probe_basis():
    """Canonical probes + full Krylov ⇒ iterative logp ≡ Cholesky logp."""
    n = 60
    spec, params, _, xc, xk, y = _problem(n=n)
    cfg = IterConfig(maxiter=n + 5, tol=1e-13, n_probes=n, precond_rank=0,
                     quad_steps=n, block=0)
    Z = _exact_probes(n, jnp.float64)
    lp = float(iter_gaussian_logp(spec, cfg, params, xc, xk, y, Z,
                                  jnp.zeros((0, n)), None, None))
    ref = float(mll(spec, params, xc, xk, y))
    assert np.isclose(lp, ref, rtol=1e-8)


def test_iter_gradient_exact_with_full_probe_basis():
    """Same exact regime ⇒ the surrogate VJP ≡ analytic MLL gradients."""
    n = 40
    spec, _, uparams, xc, xk, y = _problem(n=n)
    cfg = IterConfig(maxiter=n + 5, tol=1e-13, n_probes=n, precond_rank=0,
                     quad_steps=n, block=0)
    Z = _exact_probes(n, jnp.float64)
    la = jnp.asarray([2.0, 2.0])
    lb = jnp.asarray([1.0, 1.0])

    f_iter = lambda u: iter_map_neg_logp(spec, u, xc, xk, y, la, lb, Z,
                                         jnp.zeros((0, n)), cfg)
    f_chol = lambda u: map_neg_logp(spec, u, xc, xk, y, la, lb)
    assert np.isclose(float(f_iter(uparams)), float(f_chol(uparams)), rtol=1e-8)
    g_iter = jax.grad(f_iter)(uparams)
    g_chol = jax.grad(f_chol)(uparams)
    for k in uparams:
        assert np.allclose(np.asarray(g_iter[k]), np.asarray(g_chol[k]),
                           rtol=1e-6, atol=1e-8), k


def test_iter_logp_statistical_practical_config():
    """Realistic config (16 Gaussian probes, rank-16 preconditioner, truncated
    quadrature): logp within ~1% of exact — the fit-quality regime."""
    n = 300
    spec, params, _, xc, xk, y = _problem(n=n, seed=5)
    cfg = IterConfig(maxiter=150, tol=1e-10, n_probes=16, precond_rank=16,
                     quad_steps=40, block=0)
    pn, pk = draw_probes(0, n, cfg, dtype=jnp.float64)
    lp = float(iter_gaussian_logp(spec, cfg, params, xc, xk, y, pn, pk, None, None))
    ref = float(mll(spec, params, xc, xk, y))
    assert np.isclose(lp, ref, rtol=0.01), (lp, ref)


def test_blocked_matvec_matches_dense():
    n = 64
    spec, _, uparams, xc, xk, y = _problem(n=n)
    la = jnp.asarray([2.0, 2.0])
    lb = jnp.asarray([1.0, 1.0])
    Z = _exact_probes(n, jnp.float64)
    cfg_d = IterConfig(maxiter=n + 5, tol=1e-13, n_probes=n, precond_rank=0,
                       quad_steps=n, block=0)
    cfg_b = IterConfig(maxiter=n + 5, tol=1e-13, n_probes=n, precond_rank=0,
                       quad_steps=n, block=16)
    fd = lambda u: iter_map_neg_logp(spec, u, xc, xk, y, la, lb, Z,
                                     jnp.zeros((0, n)), cfg_d)
    fb = lambda u: iter_map_neg_logp(spec, u, xc, xk, y, la, lb, Z,
                                     jnp.zeros((0, n)), cfg_b)
    assert np.isclose(float(fd(uparams)), float(fb(uparams)), rtol=1e-10)
    gd, gb = jax.grad(fd)(uparams), jax.grad(fb)(uparams)
    for k in uparams:
        assert np.allclose(np.asarray(gd[k]), np.asarray(gb[k]), rtol=1e-8), k


def test_masked_padding_is_exact():
    """Bucket-padding via mask: padded iterative logp ≡ unpadded."""
    n, npad = 48, 64
    spec, params, _, xc, xk, y = _problem(n=n)
    cfg = IterConfig(maxiter=npad + 5, tol=1e-13, n_probes=n, precond_rank=0,
                     quad_steps=npad, block=0)
    Z = _exact_probes(n, jnp.float64)
    lp_ref = float(iter_gaussian_logp(spec, cfg, params, xc, xk, y, Z,
                                      jnp.zeros((0, n)), None, None))

    pad = npad - n
    xcp = jnp.concatenate([xc, jnp.full((pad, 2), 7.7)])  # junk coords
    xkp = jnp.concatenate([xk, jnp.zeros((pad, 0), jnp.int32)])
    yp = jnp.concatenate([y, jnp.full((pad,), 3.3)])  # junk targets
    Zp = jnp.concatenate([Z, jnp.zeros((pad, n))])  # probes vanish on padding
    mask = jnp.concatenate([jnp.ones(n), jnp.zeros(pad)])
    lp_pad = float(iter_gaussian_logp(spec, cfg, params, xcp, xkp, yp, Zp,
                                      jnp.zeros((0, n)), mask, None))
    assert np.isclose(lp_pad, lp_ref, rtol=1e-9)


def test_lanczos_tridiagonalizes():
    """Q orthonormal, T = QᵀAQ reproduced by the returned coefficients."""
    spec, params, _, xc, xk, y = _problem(n=70)
    A = jnp.asarray(_dense_A(spec, params, xc, xk, jnp.float64))
    k = 20
    Q, diag, off = lanczos(lambda V: A @ V, y, k)
    Qn = np.asarray(Q)
    assert np.allclose(Qn.T @ Qn, np.eye(k), atol=1e-10)  # reorthogonalized
    T = np.diag(np.asarray(diag)) + np.diag(np.asarray(off), 1) + np.diag(np.asarray(off), -1)
    assert np.allclose(Qn.T @ np.asarray(A) @ Qn, T, atol=1e-8)


def test_love_variance_conservative_and_converging():
    """LOVE quadratic form is a guaranteed lower bound of k*ᵀA⁻¹k* (never
    under-reports variance) and approaches exact as the rank grows."""
    n, m = 150, 41
    spec, params, _, xc, xk, y = _problem(n=n, seed=9)
    A = np.asarray(_dense_A(spec, params, xc, xk, jnp.float64))
    rng = np.random.default_rng(3)
    xs = jnp.asarray(rng.uniform(-2, 2, size=(m, 2)))
    xks = jnp.zeros((m, 0), dtype=jnp.int32)
    Ks = np.asarray(gram(spec, params, xs, xks, xc, xk))
    q_exact = np.sum(Ks * np.linalg.solve(A, Ks.T).T, axis=1)

    d = _noise_vec(spec, params, xk, DEFAULT_JITTER, None, None, jnp.float64)
    matvec = _make_matvec(
        spec, IterConfig(block=0), params, xc, xk, d, None
    )
    errs = []
    for k in (8, 32, 96):
        W = np.asarray(_love_factor(matvec, y, k))
        q_love = np.sum((Ks @ W) ** 2, axis=1)
        assert np.all(q_love <= q_exact + 1e-8), f"rank {k}: bound violated"
        errs.append(float(np.max(np.abs(q_love - q_exact))))
    assert errs[2] < errs[0]  # monotone-ish convergence across the sweep
    assert errs[2] < 1e-5 * float(q_exact.max())  # near-exact at rank 96


def test_love_block_path_matches_scalar():
    """The block-Lanczos LOVE basis (k/block fused sweeps instead of k) must
    keep the conservative bound and match the scalar path's accuracy at the
    ranks where it activates (k >= 4 blocks)."""
    n, m = 360, 37
    spec, params, _, xc, xk, y = _problem(n=n, seed=11)
    A = np.asarray(_dense_A(spec, params, xc, xk, jnp.float64))
    rng = np.random.default_rng(5)
    xs = jnp.asarray(rng.uniform(-2, 2, size=(m, 2)))
    xks = jnp.zeros((m, 0), dtype=jnp.int32)
    Ks = np.asarray(gram(spec, params, xs, xks, xc, xk))
    q_exact = np.sum(Ks * np.linalg.solve(A, Ks.T).T, axis=1)

    d = _noise_vec(spec, params, xk, DEFAULT_JITTER, None, None, jnp.float64)
    matvec = _make_matvec(spec, IterConfig(block=0), params, xc, xk, d, None)

    k = 256
    W_blk = np.asarray(_love_factor(matvec, y, k, block=64))  # block path
    W_sca = np.asarray(_love_factor(matvec, y, k, block=10**9))  # forced scalar
    q_blk = np.sum((Ks @ W_blk) ** 2, axis=1)
    q_sca = np.sum((Ks @ W_sca) ** 2, axis=1)
    assert np.all(q_blk <= q_exact + 1e-8), "block path bound violated"
    scale = float(q_exact.max())
    err_blk = float(np.max(np.abs(q_blk - q_exact))) / scale
    err_sca = float(np.max(np.abs(q_sca - q_exact))) / scale
    assert err_blk < max(10.0 * err_sca, 1e-6), (err_blk, err_sca)


def test_iter_predict_diag_love_matches_cholesky_posterior():
    """Full cache path: LOVE variances ≈ exact posterior variances, and
    strictly ≥ them (conservative); Nyström fallback still close."""
    n, m = 160, 37
    spec, params, _, xc, xk, y = _problem(n=n, seed=4)
    rng = np.random.default_rng(11)
    xs = jnp.asarray(rng.uniform(-2, 2, size=(m, 2)))
    xks = jnp.zeros((m, 0), dtype=jnp.int32)

    A = np.asarray(_dense_A(spec, params, xc, xk, jnp.float64))
    Ks = np.asarray(gram(spec, params, xs, xks, xc, xk))
    mu_ref = Ks @ np.linalg.solve(A, np.asarray(y))
    from gumbi_tpu.ops.kernels import gram_diag

    kd = np.asarray(gram_diag(spec, params, xs, xks))
    var_ref = kd - np.sum(Ks * np.linalg.solve(A, Ks.T).T, axis=1)

    cfg = IterConfig(maxiter=300, tol=1e-12, n_probes=1, precond_rank=16,
                     block=0, love_rank=120)
    cache = iter_posterior_cache(spec, cfg, params, xc, xk, y)
    assert cache["W"].shape == (n, 120)
    mean, var = iter_predict_diag(
        spec, cfg, params, cache, xc, xk, xs, xks, with_noise=False, chunk=16
    )
    assert np.allclose(np.asarray(mean), mu_ref, rtol=1e-6, atol=1e-8)
    assert np.all(np.asarray(var) >= var_ref - 1e-8)  # conservative
    assert np.allclose(np.asarray(var), var_ref, rtol=0.02, atol=1e-6)

    cfg0 = IterConfig(maxiter=300, tol=1e-12, n_probes=1, precond_rank=64,
                      block=0, love_rank=0)
    cache0 = iter_posterior_cache(spec, cfg0, params, xc, xk, y)
    assert "W" not in cache0
    _, var0 = iter_predict_diag(
        spec, cfg0, params, cache0, xc, xk, xs, xks, with_noise=False
    )
    assert np.allclose(np.asarray(var0), var_ref, rtol=0.05, atol=1e-4)


def test_iter_predict_mean_matches_cholesky():
    n, m = 80, 33
    spec, params, _, xc, xk, y = _problem(n=n)
    cfg = IterConfig(maxiter=200, tol=1e-12, n_probes=1, precond_rank=8, block=0)
    rng = np.random.default_rng(7)
    xs = jnp.asarray(rng.uniform(-2, 2, size=(m, 2)))
    xks = jnp.zeros((m, 0), dtype=jnp.int32)
    mean = np.asarray(iter_predict_mean(spec, cfg, params, xc, xk, y, xs, xks))

    A = _dense_A(spec, params, xc, xk, jnp.float64)
    Ks = np.asarray(gram(spec, params, xs, xks, xc, xk))
    ref = Ks @ np.linalg.solve(A, np.asarray(y))
    assert np.allclose(mean, ref, rtol=1e-6, atol=1e-8)
    # blocked star path
    mean_b = np.asarray(iter_predict_mean(spec, cfg, params, xc, xk, y, xs, xks,
                                          star_block=16))
    assert np.allclose(mean_b, mean, atol=1e-10)


@pytest.mark.parametrize("rank", [0, 12])
def test_iter_fit_recovers_hyperparameters(rank):
    """A short L-BFGS on the iterative objective lands in the same basin as
    the Cholesky objective (same optimizer, same start)."""
    from gumbi_tpu.ops.optimize import lbfgs_backtracking_minimize

    n = 200
    spec, _, uparams, xc, xk, y = _problem(n=n, seed=11)
    la = jnp.asarray([2.0, 2.0])
    lb = jnp.asarray([1.0, 1.0])
    cfg = IterConfig(maxiter=120, tol=1e-6, n_probes=16, precond_rank=rank,
                     quad_steps=30, block=0)
    pn, pk = draw_probes(3, n, cfg, dtype=jnp.float64)
    u0 = {k: v + 0.4 for k, v in uparams.items()}

    f_iter = lambda u: iter_map_neg_logp(spec, u, xc, xk, y, la, lb, pn, pk, cfg)
    f_chol = lambda u: map_neg_logp(spec, u, xc, xk, y, la, lb)
    ui, fi, _ = lbfgs_backtracking_minimize(f_iter, u0, maxiter=40, ftol=1e-9)
    uc, fc, _ = lbfgs_backtracking_minimize(f_chol, u0, maxiter=40, ftol=1e-9)
    # evaluate BOTH solutions under the exact objective: the iterative
    # optimum must be within a fraction of a nat of the exact optimum
    fi_exact = float(f_chol(ui))
    assert fi_exact - float(fc) < 0.5, (fi_exact, float(fc))


def test_gp_model_iterative_engine_matches_cholesky():
    """`GP.fit(MAP_kwargs=dict(engine='iterative'))` through the public API:
    same basin as the Cholesky engine, predictions close, no (N, N) cache."""
    import gumbi_tpu as gmb

    cars = gmb.data.cars(n=120)
    ds = gmb.DataSet(
        cars[["mpg", "horsepower"]].dropna(), outputs=["mpg"],
        log_vars=["mpg", "horsepower"],
    )
    kw = dict(outputs=["mpg"], continuous_dims=["horsepower"])
    gp_c = gmb.GP(ds)
    gp_c.fit(**kw, MAP_kwargs=dict(n_restarts=3, maxiter=150))
    gp_i = gmb.GP(ds)
    cfg = IterConfig(maxiter=200, tol=1e-6, n_probes=16, precond_rank=32,
                     quad_steps=32, block=32)  # 120 % 32 != 0 → exercises padding
    gp_i.fit(**kw, MAP_kwargs=dict(n_restarts=3, maxiter=150, engine="iterative",
                                   iter_config=cfg))
    assert gp_i._cache is None and gp_i._iter_cache is not None

    X = gp_c.prepare_grid(resolution=40)
    y_c = gp_c.predict_grid()
    gp_i.prepare_grid(resolution=40)
    y_i = gp_i.predict_grid()
    mu_c, mu_i = np.asarray(y_c.μ, float), np.asarray(y_i.μ, float)
    sd_c, sd_i = np.asarray(y_c.σ, float), np.asarray(y_i.σ, float)
    # same basin ⇒ close posterior surfaces (independent probe noise allows
    # small hyperparameter offsets)
    assert np.allclose(mu_i, mu_c, rtol=0.05, atol=0.05 * np.abs(mu_c).max())
    assert np.allclose(sd_i, sd_c, rtol=0.25, atol=0.1 * sd_c.max())

    # exact-objective quality: the iterative optimum scores within a nat/pt
    from gumbi_tpu.ops.mll import map_neg_logp

    la = jnp.asarray(gp_c._ls_alpha, gp_c._dtype)
    lb = jnp.asarray(gp_c._ls_beta, gp_c._dtype)
    from gumbi_tpu.ops.priors import unconstrain

    f_exact = lambda p: float(map_neg_logp(
        gp_c._spec, unconstrain(p), gp_c._xc, gp_c._xk, gp_c._yz, la, lb))
    assert f_exact(gp_i._params) - f_exact(gp_c._params) < 1.0


def test_gp_model_iterative_engine_guards():
    import gumbi_tpu as gmb

    cars = gmb.data.cars(n=60)
    ds = gmb.DataSet(
        cars[["mpg", "acceleration", "horsepower"]].dropna(),
        outputs=["mpg", "acceleration"], log_vars=["mpg", "horsepower"],
    )
    gp = gmb.GP(ds)
    gp.specify_model(outputs=["mpg"], continuous_dims=["horsepower"])
    gp.build_model(sparse=True, n_u=16)
    with pytest.raises(NotImplementedError):
        gp.find_MAP(engine="iterative")
    gp2 = gmb.GP(ds)
    gp2.specify_model(outputs=["mpg"], continuous_dims=["horsepower"])
    gp2.build_model()
    with pytest.raises(ValueError):
        gp2.find_MAP(engine="bogus")


# ------------------------------------------------------------------
# Fused Pallas matvec (interpret mode on CPU; compiled on TPU)
# ------------------------------------------------------------------


@pytest.fixture
def fused_on(monkeypatch):
    """Force the fused Pallas matvec on (interpret mode off-TPU)."""
    monkeypatch.setenv("GUMBI_TPU_FUSED_MATVEC", "1")


def test_fused_matvec_matches_xla(fused_on):
    from gumbi_tpu.ops.iterative import _fused_term

    spec, params, _, xc, xk, y = _problem(n=100, dtype=jnp.float32)
    assert _fused_term(spec) is not None
    params = {k: v.astype(jnp.float32) for k, v in params.items()}
    cfg = IterConfig(block=50)
    d = _noise_vec(spec, params, xk, cfg.jitter, None, None, jnp.float32)
    V = jnp.asarray(
        np.random.default_rng(3).standard_normal((100, 4)), dtype=jnp.float32
    )
    got = _make_matvec(spec, cfg, params, xc, xk, d, None)(V)
    import os

    os.environ["GUMBI_TPU_FUSED_MATVEC"] = "0"
    ref = _make_matvec(spec, cfg, params, xc, xk, d, None)(V)
    assert np.allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fused_matvec_masked_matches_xla(fused_on):
    spec, params, _, xc, xk, y = _problem(n=96, dtype=jnp.float32)
    params = {k: v.astype(jnp.float32) for k, v in params.items()}
    mask = jnp.asarray((np.arange(96) < 80).astype(np.float32))
    cfg = IterConfig(block=48)
    d = _noise_vec(spec, params, xk, cfg.jitter, mask, None, jnp.float32)
    V = jnp.asarray(
        np.random.default_rng(4).standard_normal((96, 3)), dtype=jnp.float32
    )
    got = _make_matvec(spec, cfg, params, xc, xk, d, mask)(V)
    import os

    os.environ["GUMBI_TPU_FUSED_MATVEC"] = "0"
    ref = _make_matvec(spec, cfg, params, xc, xk, d, mask)(V)
    assert np.allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fused_matvec_matern_and_f64_guard(fused_on):
    """Matérn specs fuse; f64 inputs must keep the XLA path exactly."""
    from gumbi_tpu.ops.iterative import _fused_term

    rng = np.random.default_rng(5)
    spec = GPSpec(terms=(GPTerm(suffix="total", kernel="Matern52"),), d_cont=2)
    assert _fused_term(spec) is not None
    xc32 = jnp.asarray(rng.uniform(-2, 2, (64, 2)), jnp.float32)
    xk = jnp.zeros((64, 0), jnp.int32)
    params = {
        "ls_total": jnp.asarray([0.7, 0.9], jnp.float32),
        "η_total": jnp.asarray(1.2, jnp.float32),
        "σ": jnp.asarray(0.2, jnp.float32),
    }
    cfg = IterConfig(block=32)
    d = _noise_vec(spec, params, xk, cfg.jitter, None, None, jnp.float32)
    V = jnp.asarray(rng.standard_normal((64, 2)), jnp.float32)
    got = _make_matvec(spec, cfg, params, xc32, xk, d, None)(V)
    K = np.asarray(gram(spec, params, xc32, xk, xc32, xk))
    ref = K @ np.asarray(V) + np.asarray(d)[:, None] * np.asarray(V)
    assert np.allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)

    # f64: the fused (f32) kernel must NOT be used — result matches the f64
    # XLA matvec to f64 precision.
    xc64 = xc32.astype(jnp.float64)
    params64 = {k: v.astype(jnp.float64) for k, v in params.items()}
    d64 = _noise_vec(spec, params64, xk, cfg.jitter, None, None, jnp.float64)
    V64 = V.astype(jnp.float64)
    got64 = _make_matvec(spec, cfg, params64, xc64, xk, d64, None)(V64)
    K64 = np.asarray(gram(spec, params64, xc64, xk, xc64, xk))
    ref64 = K64 @ np.asarray(V64) + np.asarray(d64)[:, None] * np.asarray(V64)
    assert np.allclose(np.asarray(got64), ref64, rtol=1e-12, atol=1e-12)


def test_fused_predict_paths_match_xla(fused_on):
    spec, params, _, xc, xk, y = _problem(n=90, dtype=jnp.float32)
    params = {k: v.astype(jnp.float32) for k, v in params.items()}
    cfg = IterConfig(block=45, maxiter=300, tol=1e-10, precond_rank=16, love_rank=90)
    cache = iter_posterior_cache(spec, cfg, params, xc, xk, y)
    xs = jnp.asarray(
        np.random.default_rng(6).uniform(-2, 2, (37, 2)), dtype=jnp.float32
    )
    xks = jnp.zeros((37, 0), jnp.int32)
    mu_f, var_f = iter_predict_diag(spec, cfg, params, cache, xc, xk, xs, xks)
    mean_f = iter_predict_mean(spec, cfg, params, xc, xk, y, xs, xks)
    import os

    os.environ["GUMBI_TPU_FUSED_MATVEC"] = "0"
    cache0 = iter_posterior_cache(spec, cfg, params, xc, xk, y)
    mu_x, var_x = iter_predict_diag(spec, cfg, params, cache0, xc, xk, xs, xks)
    mean_x = iter_predict_mean(spec, cfg, params, xc, xk, y, xs, xks)
    assert np.allclose(np.asarray(mu_f), np.asarray(mu_x), rtol=1e-3, atol=1e-4)
    assert np.allclose(np.asarray(var_f), np.asarray(var_x), rtol=1e-2, atol=1e-4)
    assert np.allclose(np.asarray(mean_f), np.asarray(mean_x), rtol=1e-3, atol=1e-4)


def test_gp_model_iterative_staged_fit():
    """coarse_n forces the coarse-to-fine campaign: Cholesky restart triage
    on a subsample, single full-N iterative polish — same basin as the
    all-restart iterative fit."""
    import gumbi_tpu as gmb

    rng = np.random.default_rng(0)
    n = 240
    x = rng.uniform(1, 4, n)
    y = np.exp(0.3 * np.sin(2.0 * x) + 0.1 * rng.normal(size=n)) + 1.0
    import pandas as pd

    df = pd.DataFrame({"hp": x, "mpg": y})
    ds = gmb.DataSet(df, outputs=["mpg"], log_vars=["mpg"])
    cfg = IterConfig(block=0, maxiter=200, tol=1e-6, precond_rank=16, love_rank=80)

    gp_s = gmb.GP(ds)
    gp_s.specify_model(outputs=["mpg"], continuous_dims=["hp"])
    gp_s.build_model()
    gp_s.find_MAP(engine="iterative", n_restarts=4, coarse_n=120,
                  polish_maxiter=60, iter_config=cfg)
    assert "polish_iters" in gp_s._fit_aux

    gp_f = gmb.GP(ds)
    gp_f.specify_model(outputs=["mpg"], continuous_dims=["hp"])
    gp_f.build_model()
    gp_f.find_MAP(engine="iterative", n_restarts=4, iter_config=cfg)
    assert "polish_iters" not in gp_f._fit_aux

    # same basin: exact-objective scores within a nat of each other
    from gumbi_tpu.ops.mll import map_neg_logp
    from gumbi_tpu.ops.priors import unconstrain

    la = jnp.asarray(gp_f._ls_alpha, gp_f._dtype)
    lb = jnp.asarray(gp_f._ls_beta, gp_f._dtype)
    f = lambda p: float(map_neg_logp(
        gp_f._spec, unconstrain(p), gp_f._xc, gp_f._xk, gp_f._yz, la, lb))
    assert abs(f(gp_s._params) - f(gp_f._params)) < 2.0

    gp_s.prepare_grid(resolution=30)
    pred_s = gp_s.predict_grid()
    gp_f.prepare_grid(resolution=30)
    pred_f = gp_f.predict_grid()
    assert np.allclose(np.asarray(pred_s.μ, float), np.asarray(pred_f.μ, float),
                       rtol=0.05, atol=0.05 * np.abs(np.asarray(pred_f.μ, float)).max())


def _staged_fit_dataset(n=240, seed=0):
    import pandas as pd

    rng = np.random.default_rng(seed)
    x = rng.uniform(1, 4, n)
    y = np.exp(0.3 * np.sin(2.0 * x) + 0.1 * rng.normal(size=n)) + 1.0
    import gumbi_tpu as gmb

    return gmb.DataSet(pd.DataFrame({"hp": x, "mpg": y}), outputs=["mpg"],
                       log_vars=["mpg"])


def test_staged_polish_escalates_unconverged_start():
    """A CG cap of 1 leaves the coarse winner's full-N objective unconverged
    (guarded to +inf); the polish must escalate the cap — exercising the
    dataclasses.replace path (advisor r4 high finding) — and still land a
    finite full-N fit, not the subsample fallback."""
    import gumbi_tpu as gmb

    ds = _staged_fit_dataset()
    # rank-1 preconditioner: too weak for CG to reach tol in one iteration,
    # so the coarse winner's full-N objective is guarded to +inf at maxiter=1
    # (the posterior cache needs rank ≥ 1, so the preconditioner stays on)
    cfg = IterConfig(block=0, maxiter=1, tol=1e-6, precond_rank=1,
                     quad_steps=60, love_rank=40)
    gp = gmb.GP(ds)
    gp.specify_model(outputs=["mpg"], continuous_dims=["hp"])
    gp.build_model()
    with pytest.warns(UserWarning, match="escalating the cap"):
        gp.find_MAP(engine="iterative", n_restarts=2, coarse_n=120,
                    polish_maxiter=20, iter_config=cfg)
    assert np.isfinite(gp._neg_logp)
    assert not bool(gp._fit_aux["polish_fallback"])
    # the escalation warning must name the cap that just FAILED (1), not a
    # later one (advisor r4 low finding)
    with pytest.warns(UserWarning, match=r"within maxiter=1 CG"):
        gp2 = gmb.GP(ds)
        gp2.specify_model(outputs=["mpg"], continuous_dims=["hp"])
        gp2.build_model()
        gp2.find_MAP(engine="iterative", n_restarts=2, coarse_n=120,
                     polish_maxiter=20, iter_config=cfg)


def test_staged_polish_fallback_flagged():
    """A negative tol makes CG unconvergeable at any cap (residuals are
    nonnegative; tol=0.0 IS reachable in f32 once the residual underflows to
    exactly zero): the fit must keep the coarse-subsample MAP and FLAG the
    provenance of the stored objective (advisor r4: the subsample value is
    not comparable to full-N numbers)."""
    import gumbi_tpu as gmb

    ds = _staged_fit_dataset(n=120)
    cfg = IterConfig(block=0, maxiter=1024, tol=-1.0, precond_rank=8,
                     quad_steps=40, love_rank=20)
    gp = gmb.GP(ds)
    gp.specify_model(outputs=["mpg"], continuous_dims=["hp"])
    gp.build_model()
    with pytest.warns(UserWarning, match="subsample"):
        gp.find_MAP(engine="iterative", n_restarts=2, coarse_n=60,
                    polish_maxiter=10, iter_config=cfg)
    assert bool(gp._fit_aux["polish_fallback"])
    assert int(gp._fit_aux["polish_iters"]) == 0


@pytest.mark.parametrize("n,d,kern", [(300, 2, "ExpQuad"), (2500, 3, "ExpQuad"),
                                      (2048, 2, "Matern52"), (1024, 1, "Matern32")])
def test_fused_sym_matvec_matches_general(n, d, kern):
    """The symmetric staggered-band kernel (each unordered tile built once,
    consumed twice) must match the general fused kernel to f32 accumulation
    round-off — covering single-tile, odd-band (nb=3), and even-band (nb=2)
    grids. Interpret mode on CPU; compiled on TPU."""
    from gumbi_tpu.ops.pallas_kernels import (
        fused_stationary_matvec,
        fused_stationary_matvec_sym,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-2, 2, (n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(n, 5)), jnp.float32)
    ls = jnp.asarray(rng.uniform(0.5, 1.5, (d,)), jnp.float32)
    g = np.asarray(fused_stationary_matvec(x, x, v, ls, kern))
    s = np.asarray(fused_stationary_matvec_sym(x, v, ls, kern))
    assert np.allclose(s, g, rtol=1e-5, atol=1e-5 * np.abs(g).max())


def test_fused_sym_matvec_accumulator_guard():
    """Requests whose VMEM accumulator would not fit must raise, not wedge."""
    from gumbi_tpu.ops.pallas_kernels import fused_stationary_matvec_sym

    x = jnp.zeros((70_000, 2), jnp.float32)
    v = jnp.zeros((70_000, 129), jnp.float32)  # r_pad 256 → 71680*256*4 > 32MB
    with pytest.raises(ValueError, match="accumulator"):
        fused_stationary_matvec_sym(x, v, jnp.ones((2,), jnp.float32))


def test_iterative_engine_sym_matvec_path(fused_on):
    """With the fused matvec forced on (interpret off-TPU), the engine's
    matvec closure routes the self-Gram through the symmetric kernel and the
    masked objective stays exact (mask folded outside the kernel)."""
    import dataclasses as _dc

    spec, params, uparams, xc, xk, y = _problem(n=200, d=2, seed=4, dtype=jnp.float32)
    cfg = IterConfig(maxiter=220, tol=1e-6, n_probes=200, precond_rank=0,
                     quad_steps=48, block=100, love_rank=0, sym_matvec=True)
    n = 200
    pn = jnp.sqrt(jnp.asarray(float(n), jnp.float32)) * jnp.eye(n, dtype=jnp.float32)
    pk = jnp.zeros((n, 0), jnp.int32)
    logp_sym = float(iter_gaussian_logp(spec, cfg, params, xc, xk, y, pn, pk, None, None))

    # the config field (not an env flip: it is part of the jit cache key,
    # so it toggles reliably even after programs have compiled)
    cfg_gen = _dc.replace(cfg, sym_matvec=False)
    logp_gen = float(iter_gaussian_logp(spec, cfg_gen, params, xc, xk, y, pn, pk, None, None))
    assert np.isfinite(logp_sym)
    assert abs(logp_sym - logp_gen) < 1e-3 * max(1.0, abs(logp_gen))


def test_exhausted_factorization_woodbury_exact():
    """Smooth-kernel f32 regime: the pivoted factorization exhausts inside
    its rank budget, and the engine must short-circuit to the exact Woodbury
    value with ZERO CG iterations — CG structurally cannot certify
    convergence there (the f32 matvec noise floor ε·λmax/λmin sits above the
    residual tolerance; measured at the 50k campaign's true MAP basin).
    The value and the custom-VJP gradient must match the f64 Cholesky MLL."""
    from gumbi_tpu.ops.iterative import _iter_forward

    n = 2000
    rng = np.random.default_rng(3)
    spec = GPSpec(terms=(GPTerm(suffix="total", kernel="ExpQuad"),), d_cont=2)
    Xc = jnp.asarray(rng.uniform(-2, 2, (n, 2)), jnp.float32)
    xk = jnp.zeros((n, 0), jnp.int32)
    f = np.sin(1.3 * np.asarray(Xc[:, 0])) * np.cos(0.9 * np.asarray(Xc[:, 1]))
    y = jnp.asarray(f + rng.normal(0, 0.1, n), jnp.float32)
    params32 = {"ls_total": jnp.asarray([1.4, 2.1], jnp.float32),
                "η_total": jnp.asarray(1.1, jnp.float32),
                "σ": jnp.asarray(0.1, jnp.float32)}
    cfg = IterConfig(maxiter=64, tol=1e-2, n_probes=16, precond_rank=256,
                     quad_steps=32, block=500, love_rank=0)
    pn, pk = draw_probes(0, n, cfg, dtype=jnp.float32)
    logp, (_, _, _, iters) = _iter_forward(
        spec, cfg, params32, Xc, xk, y, pn, pk, None, None
    )
    assert int(iters) == 0, "exhausted regime must skip CG"
    params64 = {k: jnp.asarray(v, jnp.float64) for k, v in params32.items()}
    ref = float(mll(spec, params64, jnp.asarray(Xc, jnp.float64), xk,
                    jnp.asarray(y, jnp.float64)))
    assert np.isfinite(float(logp))
    assert abs(float(logp) - ref) < max(1.0, 2e-4 * abs(ref)), (float(logp), ref)

    # Gradient contract: the Woodbury path must reproduce what CONVERGED CG
    # produces with the SAME probes (the fixed-probe Hutchinson estimator is
    # intrinsically noisy at smooth hyperparameters — measured: f64 CG with
    # these 16 probes is ~2x off the analytic ls gradient — so the analytic
    # gradient is the wrong oracle; the estimator itself is the contract).
    la = jnp.asarray([2.0, 2.0], jnp.float32)
    lb = jnp.asarray([1.0, 1.0], jnp.float32)
    u32 = {k: jnp.log(v) for k, v in params32.items()}
    g32 = jax.grad(lambda u: iter_map_neg_logp(
        spec, u, Xc, xk, y, la, lb, pn, pk, cfg))(u32)
    # same probes, f64, tight-tolerance CG (f64 thresholds keep the
    # factorization un-exhausted there, so this runs the Krylov path)
    cfg64 = IterConfig(maxiter=600, tol=1e-10, n_probes=16, precond_rank=256,
                       quad_steps=32, block=500, love_rank=0)
    u64 = {k: jnp.asarray(v, jnp.float64) for k, v in u32.items()}
    g64 = jax.grad(lambda u: iter_map_neg_logp(
        spec, u, jnp.asarray(Xc, jnp.float64), xk, jnp.asarray(y, jnp.float64),
        jnp.asarray(la, jnp.float64), jnp.asarray(lb, jnp.float64),
        jnp.asarray(pn, jnp.float64), jnp.asarray(pk, jnp.float64), cfg64))(u64)
    for k in u32:
        a, b = np.asarray(g32[k], float), np.asarray(g64[k], float)
        assert np.allclose(a, b, rtol=0.05, atol=0.05 * np.abs(b).max() + 1e-3), (k, a, b)


def test_degenerate_basin_still_distrusted():
    """The exhausted-regime bypass must NOT resurrect the collapsed-noise
    garbage values the distrust guard exists for: at σ→0 the residual-trace
    bound fails (tr(A−P)/λmin is thousands of nats) and the value stays
    −inf even if the factorization hits its floor."""
    from gumbi_tpu.ops.iterative import _iter_forward

    spec, params, _, xc, xk, y = _problem(n=150, seed=2)
    f32 = jnp.float32
    params = {k: jnp.asarray(v, f32) for k, v in params.items()}
    xc, y = jnp.asarray(xc, f32), jnp.asarray(y, f32)
    bad = dict(params)
    bad["ls_total"] = jnp.full_like(params["ls_total"], 1e-6)
    bad["σ"] = jnp.asarray(1e-8, f32)
    cfg = IterConfig(maxiter=60, tol=1e-6, n_probes=4, precond_rank=16,
                     quad_steps=24, block=0, love_rank=0)
    pn, pk = draw_probes(0, 150, cfg, dtype=f32)
    logp_bad, _ = _iter_forward(spec, cfg, bad, xc, xk, y, pn, pk, None, None)
    assert float(logp_bad) == -np.inf


def test_staged_fit_reuses_compiled_programs():
    """Repeat fits at the same shapes must NOT retrace the polish/coarse
    programs: the staged path dispatches through module-level jits
    (iter_map_value_and_grad / iter_map_value / coarse_restart_map /
    iter_cache_build), so the second fit's jit cache size equals the
    first's. A per-fit closure would retrace — and on the remote TPU
    service, re-load the program for seconds-to-minutes per fit."""
    import gumbi_tpu as gmb
    from gumbi_tpu.ops import iterative as it_mod
    from gumbi_tpu.ops import optimize as opt_mod

    ds = _staged_fit_dataset(n=256)
    cfg = IterConfig(block=0, maxiter=200, tol=1e-6, precond_rank=16,
                     quad_steps=40, love_rank=20)

    def fit_once():
        gp = gmb.GP(ds)
        gp.specify_model(outputs=["mpg"], continuous_dims=["hp"])
        gp.build_model()
        gp.find_MAP(engine="iterative", n_restarts=2, coarse_n=128,
                    polish_maxiter=10, iter_config=cfg)
        return gp._neg_logp

    f1 = fit_once()
    sizes1 = tuple(
        f._cache_size()
        for f in (it_mod.iter_map_value_and_grad, it_mod.iter_map_value,
                  it_mod.iter_cache_build, opt_mod.coarse_restart_map)
    )
    f2 = fit_once()
    sizes2 = tuple(
        f._cache_size()
        for f in (it_mod.iter_map_value_and_grad, it_mod.iter_map_value,
                  it_mod.iter_cache_build, opt_mod.coarse_restart_map)
    )
    assert sizes2 == sizes1, (sizes1, sizes2)
    assert np.isclose(f1, f2, rtol=1e-6)


def test_exhausted_predict_mean_matches_cholesky():
    """iter_predict_mean must take the same exhausted-regime Woodbury path
    as the forward: at the smooth f32 basin CG stalls on matvec noise, and
    before r5's fix this function silently returned the stalled solve."""
    n, m = 1500, 64
    rng = np.random.default_rng(3)
    spec = GPSpec(terms=(GPTerm(suffix="total", kernel="ExpQuad"),), d_cont=2)
    Xc = jnp.asarray(rng.uniform(-2, 2, (n, 2)), jnp.float32)
    xk = jnp.zeros((n, 0), jnp.int32)
    f = np.sin(1.3 * np.asarray(Xc[:, 0])) * np.cos(0.9 * np.asarray(Xc[:, 1]))
    y = jnp.asarray(f + rng.normal(0, 0.1, n), jnp.float32)
    params = {"ls_total": jnp.asarray([1.4, 2.1], jnp.float32),
              "η_total": jnp.asarray(1.1, jnp.float32),
              "σ": jnp.asarray(0.1, jnp.float32)}
    cfg = IterConfig(maxiter=64, tol=1e-2, n_probes=8, precond_rank=256,
                     quad_steps=16, block=500, love_rank=0)
    xs = jnp.asarray(rng.uniform(-2, 2, (m, 2)), jnp.float32)
    xks = jnp.zeros((m, 0), jnp.int32)
    mean = np.asarray(iter_predict_mean(spec, cfg, params, Xc, xk, y, xs, xks))

    p64 = {k: jnp.asarray(v, jnp.float64) for k, v in params.items()}
    X64, y64 = jnp.asarray(Xc, jnp.float64), jnp.asarray(y, jnp.float64)
    K = gram(spec, p64, X64, xk, X64, xk)
    dv = noise_diag(spec, p64, xk, dtype=jnp.float64) + DEFAULT_JITTER
    alpha = jnp.linalg.solve(K + jnp.diag(dv), y64)
    ref = np.asarray(gram(spec, p64, jnp.asarray(xs, jnp.float64), xks, X64, xk) @ alpha)
    # 2e-2: f32 Woodbury at the rank-256 truncation floor vs f64 direct —
    # a STALLED CG solve (the pre-fix behavior) errs by O(0.1-1) here
    assert np.allclose(mean, ref, atol=2e-2 * max(1.0, np.abs(ref).max())), (
        np.abs(mean - ref).max(), np.abs(ref).max())


def test_staged_polish_ladder_survives_degenerate_maxiter():
    """cfg.maxiter=0 must not hang the ladder builder (min(0*4, cap) == 0
    pinned the escalation loop forever before the floor); the fit degrades
    to the flagged subsample fallback instead."""
    import gumbi_tpu as gmb

    ds = _staged_fit_dataset(n=120)
    cfg = IterConfig(block=0, maxiter=0, tol=1e-6, precond_rank=4,
                     quad_steps=8, love_rank=8)
    gp = gmb.GP(ds)
    gp.specify_model(outputs=["mpg"], continuous_dims=["hp"])
    gp.build_model()
    with pytest.warns(UserWarning):
        gp.find_MAP(engine="iterative", n_restarts=2, coarse_n=60,
                    polish_maxiter=5, iter_config=cfg)
    assert "polish_fallback" in gp._fit_aux
