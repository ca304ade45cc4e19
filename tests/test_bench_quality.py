"""Quality guard for the benchmark's coarse-to-fine MAP shortcut.

bench.py searches restart basins on a small subsample, refines the best
candidate on a mid-size subsample, and polishes only that candidate at full
N. This test certifies the shortcut on a scaled-down version of the same
problem: the polished optimum's full-data objective must match an exhaustive
full-data multi-restart search to within a per-point tolerance, so the
published wall-clock number cannot silently ship a worse optimum
(VERDICT r1, weak point 6).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gumbi_tpu.ops import CoregTerm, GPSpec, GPTerm, initial_params, ls_prior_params
from gumbi_tpu.ops.kronecker import kron_neg_logp
from gumbi_tpu.ops.optimize import lbfgs_backtracking_minimize

# Scaled-down mirror of bench.py's stage sizes/iteration caps (ratios kept)
N_LOCS = 1024
COARSE_N = 128
MID_N = 205  # bench: 1024 of 5120
N_RESTARTS = 8
COARSE_ITERS = 20
MID_ITERS = 12
POLISH_ITERS = 20
POLISH_FTOL = 1e-4  # bench.py's BENCH_POLISH_FTOL default


def _problem():
    rng = np.random.default_rng(0)
    Xb = rng.uniform(-2, 2, size=(N_LOCS, 2))
    f1 = np.sin(1.3 * Xb[:, 0]) * np.cos(0.9 * Xb[:, 1])
    f2 = 0.7 * f1 + 0.3 * np.cos(1.1 * Xb[:, 0])
    Y = np.stack([f1 + rng.normal(0, 0.1, N_LOCS), f2 + rng.normal(0, 0.15, N_LOCS)], axis=1)
    out_cg = CoregTerm(name="Parameter", col=0, d_out=2)
    spec = GPSpec(
        terms=(GPTerm(suffix="total", kernel="ExpQuad", coregs=(out_cg,)),),
        d_cont=2,
        ard=True,
        noise_coreg=CoregTerm(name="Output_noise", col=0, d_out=2),
    )
    la, lb = ls_prior_params([0.05, 0.05], [4.0, 4.0])
    return spec, jnp.asarray(Xb), jnp.asarray(Y), jnp.asarray(la), jnp.asarray(lb)


@pytest.mark.slow
def test_coarse_to_fine_matches_full_search():
    spec, xc, Y, la, lb = _problem()
    u0s = initial_params(spec, la, lb, n_restarts=N_RESTARTS, seed=0)

    def runner_on(xc_d, Y_d, maxiter, ftol=1e-6):
        def objective(u):
            return kron_neg_logp(spec, u, xc_d, Y_d, la, lb)

        return lambda u0: lbfgs_backtracking_minimize(
            objective, u0, maxiter=maxiter, ftol=ftol
        )

    # Exhaustive: every restart optimized on the FULL data with the combined
    # iteration budget of the staged scheme
    total_iters = COARSE_ITERS + MID_ITERS + POLISH_ITERS
    xs_full, fs_full, _ = jax.jit(
        lambda u0s: jax.lax.map(runner_on(xc, Y, total_iters), u0s)
    )(u0s)
    f_exhaustive = float(jnp.min(jnp.where(jnp.isfinite(fs_full), fs_full, jnp.inf)))

    # Coarse → mid → polish: bench.py's exact scheme at reduced size
    rng = np.random.default_rng(1)
    sub_c = np.sort(rng.choice(N_LOCS, COARSE_N, replace=False))
    sub_m = np.sort(rng.choice(N_LOCS, MID_N, replace=False))
    xc_c, Y_c = xc[jnp.asarray(sub_c)], Y[jnp.asarray(sub_c)]
    xc_m, Y_m = xc[jnp.asarray(sub_m)], Y[jnp.asarray(sub_m)]

    xs_c, fs_c, _ = jax.jit(
        lambda u0s: jax.lax.map(runner_on(xc_c, Y_c, COARSE_ITERS), u0s)
    )(u0s)
    best = jnp.argmin(jnp.where(jnp.isfinite(fs_c), fs_c, jnp.inf))
    u_cand = jax.tree_util.tree_map(lambda leaf: leaf[best], xs_c)
    u_mid, _, _ = jax.jit(lambda u0: runner_on(xc_m, Y_m, MID_ITERS)(u0))(u_cand)
    _, f_polished, _ = jax.jit(
        lambda u0: runner_on(xc, Y, POLISH_ITERS, ftol=POLISH_FTOL)(u0)
    )(u_mid)
    f_polished = float(f_polished)

    # Tolerance: 0.005 nats/point of slack — a basin-equivalence criterion,
    # far tighter than any visible difference in the posterior surface.
    n_points = N_LOCS * 2
    assert f_polished <= f_exhaustive + 0.005 * n_points, (
        f"coarse-to-fine {f_polished:.2f} vs exhaustive {f_exhaustive:.2f} "
        f"({(f_polished - f_exhaustive) / n_points:.4f} nats/pt worse)"
    )
