"""Benchmark: fit + predict_grid for a 10k-point 2-output LMC GP on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = steady-state wall-clock seconds for the MAP fit (8-restart L-BFGS,
restarts dispatched in vmapped chunks) plus a 100-pt-per-output grid
prediction. vs_baseline is measured against the BASELINE.json north-star
budget of 1.0 s (a v5e-8 target; this runs on 1 chip).

The model is the bench-native Kronecker formulation of the LMC: identical
posterior to the dense tall model (verified in tests/test_kronecker.py), with
the (ND)³ Cholesky replaced by a batched (D, N, N) one. Extra diagnostics
(Gram+Cholesky GFLOP/s, compile time) go to stderr.
"""

import json
import os
import sys
import time

os.environ.setdefault("GUMBI_TPU_X64", "0")  # f32 on TPU (f64 is emulated + fragile)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gumbi_tpu.ops import CoregTerm, GPSpec, GPTerm, initial_params, ls_prior_params  # noqa: E402
from gumbi_tpu.ops.kronecker import kron_cache, kron_neg_logp, kron_predict_diag  # noqa: E402
from gumbi_tpu.ops.optimize import lbfgs_backtracking_minimize  # noqa: E402
from gumbi_tpu.ops.priors import constrain  # noqa: E402

N_LOCS = int(os.environ.get("BENCH_N_LOCS", 5120))  # per output → 2×N_LOCS points
N_RESTARTS = int(os.environ.get("BENCH_RESTARTS", 8))
MAXITER = int(os.environ.get("BENCH_MAXITER", 60))
COARSE_N = int(os.environ.get("BENCH_COARSE_N", 640))  # restart search subsample
POLISH_ITERS = int(os.environ.get("BENCH_POLISH_ITERS", 40))
POLISH_TOP = int(os.environ.get("BENCH_POLISH_TOP", 1))  # candidates polished at full N
GRID = int(os.environ.get("BENCH_GRID", 100))
BASELINE_SECONDS = 1.0
DTYPE = jnp.float32


def make_problem():
    """2-output LMC: correlated smooth surfaces over 2 continuous dims."""
    rng = np.random.default_rng(0)
    Xb = rng.uniform(-2, 2, size=(N_LOCS, 2)).astype(np.float32)
    f1 = np.sin(1.3 * Xb[:, 0]) * np.cos(0.9 * Xb[:, 1])
    f2 = 0.7 * f1 + 0.3 * np.cos(1.1 * Xb[:, 0])
    Y = np.stack(
        [f1 + rng.normal(0, 0.1, N_LOCS), f2 + rng.normal(0, 0.15, N_LOCS)], axis=1
    ).astype(np.float32)

    out_cg = CoregTerm(name="Parameter", col=0, d_out=2)
    spec = GPSpec(
        terms=(GPTerm(suffix="total", kernel="ExpQuad", coregs=(out_cg,)),),
        d_cont=2,
        ard=True,
        noise_coreg=CoregTerm(name="Output_noise", col=0, d_out=2),
    )

    sub = Xb[rng.choice(N_LOCS, min(512, N_LOCS), replace=False)]
    lowers, uppers = [], []
    for j in range(2):
        dd = np.abs(sub[:, j : j + 1] - sub[:, j : j + 1].T)[np.triu_indices(len(sub), 1)]
        dd = dd[dd > 0]
        lowers.append(max(float(dd.min()), 0.01))
        uppers.append(float(dd.max()))
    ls_alpha, ls_beta = ls_prior_params(lowers, uppers)
    return spec, jnp.asarray(Xb), jnp.asarray(Y), ls_alpha, ls_beta


def main():
    t_setup = time.time()
    spec, xc_locs, Y, ls_alpha, ls_beta = make_problem()
    g = np.linspace(-2, 2, GRID).astype(np.float32)
    xc_grid = jnp.asarray(np.column_stack([g, np.zeros_like(g)]), dtype=DTYPE)

    la = jnp.asarray(ls_alpha, dtype=DTYPE)
    lb = jnp.asarray(ls_beta, dtype=DTYPE)
    u0s = initial_params(spec, ls_alpha, ls_beta, n_restarts=N_RESTARTS, seed=0, dtype=DTYPE)
    print(f"[bench] setup {time.time()-t_setup:.1f}s, device={jax.devices()[0]}", file=sys.stderr)

    # Coarse-to-fine MAP: the multi-restart basin search runs on a subsample
    # (hyperparameters are global — a fraction of the data identifies the
    # basin), then a single full-data L-BFGS polish refines the optimum.
    # Restarts run sequentially on device (lax.map): with the custom-VJP MLL
    # the vmapped mode also works on TPU now, but lax.map measures ~3-4x
    # faster on ONE chip (benchmarks/probe_vmap_tpu.py) — batching buys
    # nothing for XLA's TPU Cholesky and vmapped lanes run to the slowest
    # lane. The quality of the coarse-to-fine optimum vs an exhaustive
    # full-N search is guarded by tests/test_bench_quality.py.
    rng = np.random.default_rng(1)
    sub = np.sort(rng.choice(N_LOCS, min(COARSE_N, N_LOCS), replace=False))
    xc_sub = xc_locs[jnp.asarray(sub)]
    Y_sub = Y[jnp.asarray(sub)]

    @jax.jit
    def coarse_fit(u0s):
        def objective(u):
            return kron_neg_logp(spec, u, xc_sub, Y_sub, la, lb)

        def runner(u0):
            return lbfgs_backtracking_minimize(objective, u0, maxiter=MAXITER)

        xs, fs, its = jax.lax.map(runner, u0s)
        # Top-k candidates by coarse objective, polished at full N
        order = jnp.argsort(jnp.where(jnp.isfinite(fs), fs, jnp.inf))[:POLISH_TOP]
        return jax.tree_util.tree_map(lambda leaf: leaf[order], xs), fs, its

    @jax.jit
    def polish_fit(u_cands):
        def objective(u):
            return kron_neg_logp(spec, u, xc_locs, Y, la, lb)

        def runner(u0):
            return lbfgs_backtracking_minimize(objective, u0, maxiter=POLISH_ITERS)

        xs, fs, its = jax.lax.map(runner, u_cands)
        best = jnp.argmin(jnp.where(jnp.isfinite(fs), fs, jnp.inf))
        return jax.tree_util.tree_map(lambda leaf: leaf[best], xs), fs[best], its

    @jax.jit
    def predict(params):
        kc = kron_cache(spec, params, xc_locs, Y)
        return kron_predict_diag(spec, params, kc, xc_grid, with_noise=True)

    def fit_predict(phases=None):
        t0 = time.perf_counter()
        u_cands, _, its_c = coarse_fit(u0s)
        jax.block_until_ready(its_c)
        t1 = time.perf_counter()
        u_best, f_best, its_p = polish_fit(u_cands)
        jax.block_until_ready(its_p)
        t2 = time.perf_counter()
        params = constrain(u_best)
        mean, var = predict(params)
        mean, var = np.asarray(mean), np.asarray(var)
        t3 = time.perf_counter()
        if phases is not None:
            phases.update(
                coarse=t1 - t0, polish=t2 - t1, predict=t3 - t2,
                coarse_iters=np.asarray(its_c).tolist(),
                polish_iters=np.asarray(its_p).tolist(),
            )
        return params, float(f_best), mean, var

    t0 = time.time()
    params, neg, mean, var = fit_predict()
    compile_and_run = time.time() - t0
    print(
        f"[bench] compile+first-run {compile_and_run:.1f}s, neg_logp={neg:.2f}",
        file=sys.stderr,
    )

    phases = {}
    t0 = time.time()
    params, neg, mean, var = fit_predict(phases)
    steady = time.time() - t0
    print(
        f"[bench] phases: coarse {phases['coarse']*1e3:.0f}ms (iters {phases['coarse_iters']}) | "
        f"polish {phases['polish']*1e3:.0f}ms (iters {phases['polish_iters']}) | "
        f"predict {phases['predict']*1e3:.0f}ms",
        file=sys.stderr,
    )

    # Hot-path throughput: batched (D, N, N) Gram+Cholesky
    from gumbi_tpu.ops.kronecker import kron_mll

    @jax.jit
    def hot(params):
        return kron_mll(spec, params, xc_locs, Y)

    float(hot(params))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        v = float(hot(params))
    dt = (time.perf_counter() - t0) / reps
    d_out = Y.shape[1]
    flops = d_out * (N_LOCS**3 / 3) + 2 * N_LOCS * N_LOCS * spec.d_cont
    rate = flops / dt / 1e9
    print(
        f"[bench] steady fit+predict {steady:.3f}s | batched Gram+Chol {rate:.0f} GFLOP/s "
        f"({dt*1e3:.1f} ms per MLL) | mean range [{mean.min():.3f}, {mean.max():.3f}]",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": f"fit+predict_grid {2*N_LOCS}-pt 2-output LMC GP (1 chip, f32)",
                "value": round(steady, 3),
                "unit": "s",
                "vs_baseline": round(BASELINE_SECONDS / steady, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
