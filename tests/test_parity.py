"""Numerical parity: fixed-hyperparameter posterior vs an independent f64 oracle.

BASELINE.md's parity row demands posterior mean/var agreement at rtol 1e-5 on
an mpg-style quickstart at float64. PyMC is not installable here, so the
independent oracle is a direct numpy float64 solve of the textbook GP
equations (Rasmussen & Williams 2.23-2.24) built from the same model
definition the reference uses (pm.gp.cov.ExpQuad conventions + ICM coregion,
reference gumbi/regression/pymc/GP.py:61-94). Golden values are pinned so the
whole chain (standardization → kernel → solve → packaging) cannot drift.

The TPU-f64 half of the parity row lives in ``test_tpu_f64_parity`` (slow):
it re-runs the fixed-parameter posterior in a subprocess on the default
(hardware) backend with x64 enabled and checks the same oracle at rtol 1e-5.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

import gumbi_tpu as gmb
from gumbi_tpu.ops.mll import DEFAULT_JITTER
from gumbi_tpu.ops.posterior import posterior_cache

RTOL = 1e-5


def _expquad(Xa, Xb, ls, eta):
    d2 = (((Xa[:, None, :] - Xb[None, :, :]) / np.asarray(ls)) ** 2).sum(-1)
    return eta**2 * np.exp(-0.5 * d2)


def _pin_params(gp, params):
    gp._params = {k: jnp.asarray(v, dtype=gp._dtype) for k, v in params.items()}
    gp.MAP = {k: np.asarray(v) for k, v in gp._params.items()}
    gp._cache = posterior_cache(
        gp._spec, gp._params, gp._xc, gp._xk, gp._yz, mask=getattr(gp, "_mask", None)
    )
    return gp


@pytest.fixture(scope="module")
def single_output_gp():
    df = gmb.data.cars(n=60, seed=1)
    ds = gmb.DataSet(df, outputs=["mpg"], log_vars=["mpg", "horsepower"])
    gp = gmb.GP(ds)
    gp.specify_model(outputs=["mpg"], continuous_dims=["horsepower"])
    gp.build_model(heteroskedastic_outputs=False)
    return _pin_params(gp, {"ls_total": [0.8], "η_total": 1.2, "σ": 0.3})


def _single_output_oracle(gp, Zg):
    """Direct numpy f64 GP posterior at standardized grid Zg (M, 1)."""
    Xz = np.asarray(gp._xc, dtype=np.float64)
    yz = np.asarray(gp._yz, dtype=np.float64)
    ls, eta, sig = [np.asarray(gp.MAP[k], dtype=np.float64) for k in ("ls_total", "η_total", "σ")]
    K = _expquad(Xz, Xz, ls, eta) + (sig**2 + DEFAULT_JITTER) * np.eye(len(yz))
    Ks = _expquad(Zg, Xz, ls, eta)
    Kinv_y = np.linalg.solve(K, yz)
    mean = Ks @ Kinv_y
    var = eta**2 - np.einsum("mn,nm->m", Ks, np.linalg.solve(K, Ks.T)) + sig**2
    return mean, var


def test_single_output_posterior_parity(single_output_gp):
    gp = single_output_gp
    Zg = np.linspace(-2.0, 2.0, 41)[:, None]
    mean, var = gp.predict(Zg)  # z-space, with_noise=True
    mean_ref, var_ref = _single_output_oracle(gp, Zg)
    assert np.allclose(mean, mean_ref, rtol=RTOL, atol=1e-12)
    assert np.allclose(var, var_ref, rtol=RTOL, atol=1e-12)


def test_single_output_posterior_goldens(single_output_gp):
    """Pinned oracle values — guards the full chain against silent drift.

    Regenerate with tests/test_parity.py::_regen_goldens if the fixture's
    data or pinned hyperparameters ever change deliberately.
    """
    gp = single_output_gp
    Zg = np.linspace(-2.0, 2.0, 5)[:, None]
    mean, var = gp.predict(Zg)
    mean_gold, var_gold = GOLDEN_SINGLE
    assert np.allclose(mean, mean_gold, rtol=RTOL)
    assert np.allclose(var, var_gold, rtol=RTOL)


@pytest.fixture(scope="module")
def lmc_gp():
    df = gmb.data.cars(n=50, seed=2)
    ds = gmb.DataSet(
        df, outputs=["mpg", "acceleration"], log_vars=["mpg", "acceleration", "horsepower"]
    )
    gp = gmb.GP(ds)
    gp.specify_model(outputs=["mpg", "acceleration"], continuous_dims=["horsepower"])
    gp.build_model(heteroskedastic_outputs=False, multitask_kernel="Hadamard")
    rng = np.random.default_rng(0)
    cg = gp._spec.terms[0].coregs[0]  # output coregion, named after out_col
    return _pin_params(
        gp,
        {
            "ls_total": [0.9],
            "η_total": 1.1,
            "σ": 0.25,
            f"W_{cg.name}": rng.normal(size=(2, 2)) * 0.6,
            f"κ_{cg.name}": [0.5, 0.7],
        },
    )


def _lmc_oracle(gp, Zg, ok_new):
    """Tall ICM-LMC posterior: K[i,j] = B[oi,oj]·k(xi,xj) + δ(σ²+jitter)."""
    Xz = np.asarray(gp._xc, dtype=np.float64)
    yz = np.asarray(gp._yz, dtype=np.float64)
    ok = np.asarray(gp._xk[:, 0])
    cg = gp._spec.terms[0].coregs[0]
    W = np.asarray(gp.MAP[f"W_{cg.name}"], dtype=np.float64)
    kappa = np.asarray(gp.MAP[f"κ_{cg.name}"], dtype=np.float64)
    B = W @ W.T + np.diag(kappa)
    ls, eta, sig = [np.asarray(gp.MAP[k], dtype=np.float64) for k in ("ls_total", "η_total", "σ")]

    K = B[np.ix_(ok, ok)] * _expquad(Xz, Xz, ls, eta) + (sig**2 + DEFAULT_JITTER) * np.eye(len(yz))
    Ks = B[np.ix_(ok_new, ok)] * _expquad(Zg, Xz, ls, eta)
    mean = Ks @ np.linalg.solve(K, yz)
    kss = B[ok_new, ok_new] * eta**2
    var = kss - np.einsum("mn,nm->m", Ks, np.linalg.solve(K, Ks.T)) + sig**2
    return mean, var


def test_lmc_posterior_parity(lmc_gp):
    gp = lmc_gp
    g = np.linspace(-1.5, 1.5, 17)
    Zg = np.concatenate([g, g])[:, None]
    ok_new = np.concatenate([np.zeros(17, int), np.ones(17, int)])
    pts = np.column_stack([Zg, ok_new.astype(float)])
    mean, var = gp.predict(pts)
    mean_ref, var_ref = _lmc_oracle(gp, Zg, ok_new)
    assert np.allclose(mean, mean_ref, rtol=RTOL, atol=1e-12)
    assert np.allclose(var, var_ref, rtol=RTOL, atol=1e-12)


# Pinned f64 oracle values for test_single_output_posterior_goldens.
# Regenerate by evaluating gp.predict(np.linspace(-2, 2, 5)[:, None]) on the
# single_output_gp fixture at CPU float64 if data/params change deliberately.
GOLDEN_SINGLE = (
    np.array([1.3227115015545485, 0.9439055837113006, 0.17764900131246275,
              -1.0247291084785113, -1.7762578895154058]),
    np.array([0.1322700422492266, 0.09732210468220606, 0.0979395331384855,
              0.09790891183191933, 0.21495424943113886]),
)


TPU_PARITY_SNIPPET = r"""
import os, sys
os.environ["GUMBI_TPU_X64"] = "1"
sys.path.insert(0, "@REPO@")
import numpy as np
import jax
if jax.default_backend() == "cpu":
    print("SKIP: no accelerator backend"); raise SystemExit(0)
import jax.numpy as jnp
from gumbi_tpu.ops import GPSpec, GPTerm
from gumbi_tpu.ops.mll import DEFAULT_JITTER
from gumbi_tpu.ops.posterior import posterior_cache, predict_diag

rng = np.random.default_rng(0)
n = 200
Xz = rng.uniform(-2, 2, size=(n, 1))
yz = np.sin(1.7 * Xz[:, 0]) + 0.1 * rng.normal(size=n)
spec = GPSpec(terms=(GPTerm(suffix="total", kernel="ExpQuad"),), d_cont=1)
params = {"ls_total": jnp.asarray([0.8], jnp.float64),
          "η_total": jnp.asarray(1.2, jnp.float64),
          "σ": jnp.asarray(0.3, jnp.float64)}
xc = jnp.asarray(Xz, jnp.float64); xk = jnp.zeros((n, 0), jnp.int32)
y = jnp.asarray(yz, jnp.float64)
cache = posterior_cache(spec, params, xc, xk, y)
Zg = np.linspace(-2, 2, 33)[:, None]
mean, var = predict_diag(spec, params, cache, jnp.asarray(Zg, jnp.float64),
                         jnp.zeros((33, 0), jnp.int32))
assert mean.dtype == jnp.float64, mean.dtype

def expquad(Xa, Xb, ls, eta):
    d2 = (((Xa[:, None, :] - Xb[None, :, :]) / ls) ** 2).sum(-1)
    return eta**2 * np.exp(-0.5 * d2)

K = expquad(Xz, Xz, 0.8, 1.2) + (0.09 + DEFAULT_JITTER) * np.eye(n)
Ks = expquad(Zg, Xz, 0.8, 1.2)
mean_ref = Ks @ np.linalg.solve(K, yz)
var_ref = 1.2**2 - np.einsum("mn,nm->m", Ks, np.linalg.solve(K, Ks.T)) + 0.09
merr = np.max(np.abs(np.asarray(mean) - mean_ref) / (np.abs(mean_ref) + 1e-12))
verr = np.max(np.abs(np.asarray(var) - var_ref) / np.abs(var_ref))
print(f"backend={jax.default_backend()} mean_rel_err={merr:.2e} var_rel_err={verr:.2e}")
assert np.allclose(np.asarray(mean), mean_ref, rtol=1e-5, atol=1e-10), merr
assert np.allclose(np.asarray(var), var_ref, rtol=1e-5, atol=1e-10), verr
print("TPU F64 PARITY OK")
"""


@pytest.mark.slow
def test_tpu_f64_parity():
    """Float64 posterior on the hardware backend matches the numpy oracle.

    Proves (or disproves, loudly) that the f64 path works on the TPU backend
    — bench.py's 'f64 is emulated + fragile' claim is now tested, not
    asserted. Skips when no accelerator is attached.
    """
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, "-c", TPU_PARITY_SNIPPET.replace("@REPO@", repo)],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    out = proc.stdout + proc.stderr
    if "SKIP: no accelerator backend" in out:
        pytest.skip("no accelerator backend attached")
    assert proc.returncode == 0, out
    assert "TPU F64 PARITY OK" in out


def test_map_fit_parity():
    """The statistical half of parity: where does the MAP *land*?

    The fixed-hyperparameter oracles above pin the posterior math but not the
    fit. This test pins (a) the lengthscale-prior construction — the fitted
    InverseGamma must place the requested mass between the data-derived
    pairwise-distance bounds with equal tails (reference
    pm.find_constrained_prior semantics, gumbi/utils/gp_utils.py:51-87) —
    and (b) the optimizer: an INDEPENDENT textbook implementation of the
    same log-posterior (numpy f64 + scipy L-BFGS-B with numerical gradients,
    reference optimizer: pm.find_MAP → scipy, GP.py:799-813) started from the
    same restarts must land on the same hyperparameters and the same
    objective value.
    """
    from scipy import optimize as sopt
    from scipy import special as ssp
    from scipy import stats as sstats

    from gumbi_tpu.ops import initial_params
    from gumbi_tpu.ops.mll import DEFAULT_JITTER
    from gumbi_tpu.utils.gp_utils import parse_ls_limits

    df = gmb.data.cars(n=60, seed=1)
    ds = gmb.DataSet(df, outputs=["mpg"], log_vars=["mpg", "horsepower"])
    gp = gmb.GP(ds)
    gp.specify_model(outputs=["mpg"], continuous_dims=["horsepower"])
    gp.build_model(heteroskedastic_outputs=False)
    assert gp._dtype == jnp.float64  # the parity fit must run in f64

    # (a) prior construction: equal-tail mass between the pdist bounds
    Xz = np.asarray(gp._xc, dtype=np.float64)
    (lo,), (hi,) = parse_ls_limits(Xz, ARD=True)
    alpha, beta = float(gp._ls_alpha[0]), float(gp._ls_beta[0])
    dist = sstats.invgamma(alpha, scale=beta)
    tail = (1.0 - 0.98) / 2.0
    assert np.isclose(dist.cdf(lo), tail, atol=1e-5)
    assert np.isclose(dist.cdf(hi), 1.0 - tail, atol=1e-5)

    # (b) the fit: engine vs an independent scipy L-BFGS-B oracle
    gp.find_MAP(n_restarts=6, maxiter=500, tol=1e-12, seed=3)

    yz = np.asarray(gp._yz, dtype=np.float64)
    n = len(yz)

    def neg_log_posterior(u):
        u_ls, u_eta, u_sig = u[0], u[1], u[2]
        ls, eta, sig = np.exp(u_ls), np.exp(u_eta), np.exp(u_sig)
        K = eta**2 * np.exp(-0.5 * ((Xz - Xz.T) / ls) ** 2)
        A = K + (sig**2 + DEFAULT_JITTER) * np.eye(n)
        L = np.linalg.cholesky(A)
        w = np.linalg.solve(L, yz)
        mll = -0.5 * (w @ w) - np.log(np.diag(L)).sum() - 0.5 * n * np.log(2 * np.pi)
        lp_ls = alpha * np.log(beta) - ssp.gammaln(alpha) - (alpha + 1) * u_ls - beta / ls
        lp_eta = u_eta - eta  # Gamma(2, 1): log x - x - lgamma(2)
        lp_sig = -sig  # Exponential(1)
        jac = u_ls + u_eta + u_sig  # log|dx/du| for x = exp(u)
        return -(mll + lp_ls + lp_eta + lp_sig + jac)

    u0s = initial_params(gp._spec, gp._ls_alpha, gp._ls_beta, n_restarts=6, seed=3)
    best = None
    for r in range(6):
        x0 = np.array(
            [float(u0s["ls_total"][r][0]), float(u0s["η_total"][r]), float(u0s["σ"][r])]
        )
        res = sopt.minimize(
            neg_log_posterior, x0, method="L-BFGS-B",
            options={"maxiter": 500, "ftol": 1e-14, "gtol": 1e-12},
        )
        if best is None or res.fun < best.fun:
            best = res

    engine_obj = float(gp._neg_logp)
    oracle_obj = float(best.fun)
    # Same basin, same optimum: objective values agree to well under a nat
    assert abs(engine_obj - oracle_obj) < 1e-3, (engine_obj, oracle_obj)
    ls_o, eta_o, sig_o = np.exp(best.x)
    assert np.isclose(float(gp.MAP["ls_total"][0]), ls_o, rtol=1e-3)
    assert np.isclose(float(gp.MAP["η_total"]), eta_o, rtol=1e-3)
    assert np.isclose(float(gp.MAP["σ"]), sig_o, rtol=1e-3)
