"""Benchmark: fit + predict_grid for a 10k-point 2-output LMC GP on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = steady-state wall-clock seconds for MAP fit (8-restart vmapped L-BFGS)
plus a 100-pt-per-output grid prediction. vs_baseline is measured against the
BASELINE.json north-star budget of 1.0 s (v5e-8 target; we run on 1 chip).

Extra diagnostics (Gram+Cholesky GFLOP/s, compile time) go to stderr.
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

from gumbi_tpu.ops import (  # noqa: E402
    CoregTerm,
    GPSpec,
    GPTerm,
    fit_gp_map,
    initial_params,
    ls_prior_params,
    posterior_cache,
    predict_diag,
)

N_LOCS = int(os.environ.get("BENCH_N_LOCS", 5120))  # per output → 2×N_LOCS tall rows
N_RESTARTS = int(os.environ.get("BENCH_RESTARTS", 8))
RESTART_CHUNK = int(os.environ.get("BENCH_RESTART_CHUNK", 2))  # HBM control
MAXITER = int(os.environ.get("BENCH_MAXITER", 100))
GRID = int(os.environ.get("BENCH_GRID", 100))
BASELINE_SECONDS = 1.0
DTYPE = jnp.float32


def make_problem():
    """2-output LMC: correlated smooth surfaces over 2 continuous dims."""
    rng = np.random.default_rng(0)
    Xb = rng.uniform(-2, 2, size=(N_LOCS, 2)).astype(np.float32)
    f1 = np.sin(1.3 * Xb[:, 0]) * np.cos(0.9 * Xb[:, 1])
    f2 = 0.7 * f1 + 0.3 * np.cos(1.1 * Xb[:, 0])
    y1 = f1 + rng.normal(0, 0.1, N_LOCS)
    y2 = f2 + rng.normal(0, 0.15, N_LOCS)

    xc = jnp.asarray(np.vstack([Xb, Xb]), dtype=DTYPE)
    xk = jnp.asarray(
        np.concatenate([np.zeros(N_LOCS), np.ones(N_LOCS)])[:, None].astype(np.int32)
    )
    y = jnp.asarray(np.concatenate([y1, y2]), dtype=DTYPE)

    out_cg = CoregTerm(name="Parameter", col=0, d_out=2)
    spec = GPSpec(
        terms=(GPTerm(suffix="total", kernel="ExpQuad", coregs=(out_cg,)),),
        d_cont=2,
        ard=True,
        noise_coreg=CoregTerm(name="Output_noise", col=0, d_out=2),
    )

    # Lengthscale prior bounds from subsampled pairwise distances
    sub = Xb[rng.choice(N_LOCS, min(512, N_LOCS), replace=False)]
    lowers, uppers = [], []
    for j in range(2):
        dd = np.abs(sub[:, j : j + 1] - sub[:, j : j + 1].T)[np.triu_indices(len(sub), 1)]
        dd = dd[dd > 0]
        lowers.append(max(float(dd.min()), 0.01))
        uppers.append(float(dd.max()))
    ls_alpha, ls_beta = ls_prior_params(lowers, uppers)
    return spec, xc, xk, y, ls_alpha, ls_beta


def grid_points():
    g = np.linspace(-2, 2, GRID).astype(np.float32)
    pts = np.column_stack([g, np.zeros_like(g)])
    xc_new = jnp.asarray(np.vstack([pts, pts]), dtype=DTYPE)
    xk_new = jnp.asarray(
        np.concatenate([np.zeros(GRID), np.ones(GRID)])[:, None].astype(np.int32)
    )
    return xc_new, xk_new


def bench_gram_chol_rate(spec, params, xc, xk, reps=3):
    """Gram+Cholesky hot-path throughput (GFLOP/s) on this chip."""
    from gumbi_tpu.ops.mll import cholesky_factor

    n = xc.shape[0]

    @jax.jit
    def hot(params, xc, xk):
        L = cholesky_factor(spec, params, xc, xk, xc.dtype)
        return jnp.sum(jnp.log(jnp.diag(L)))

    float(hot(params, xc, xk))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        v = float(hot(params, xc, xk))
    dt = (time.perf_counter() - t0) / reps
    flops = n**3 / 3 + 2 * n * n * spec.d_cont
    return flops / dt / 1e9, dt, v


def main():
    t_setup = time.time()
    spec, xc, xk, y, ls_alpha, ls_beta = make_problem()
    xc_new, xk_new = grid_points()
    la = jnp.asarray(ls_alpha, dtype=DTYPE)
    lb = jnp.asarray(ls_beta, dtype=DTYPE)
    u0s = initial_params(spec, ls_alpha, ls_beta, n_restarts=N_RESTARTS, seed=0, dtype=DTYPE)
    print(f"[bench] setup {time.time()-t_setup:.1f}s, device={jax.devices()[0]}", file=sys.stderr)

    def fit_predict():
        params, neg, aux = fit_gp_map(
            spec, xc, xk, y, la, lb, u0s, maxiter=MAXITER, tol=1e-5,
            restart_chunk=RESTART_CHUNK,
        )
        cache = posterior_cache(spec, params, xc, xk, y)
        mean, var = predict_diag(spec, params, cache, xc_new, xk_new, with_noise=True)
        return params, neg, mean, var

    t0 = time.time()
    params, neg, mean, var = fit_predict()
    jax.block_until_ready(mean)
    _ = float(neg)
    compile_and_run = time.time() - t0
    print(f"[bench] compile+first-run {compile_and_run:.1f}s, neg_logp={float(neg):.2f}", file=sys.stderr)

    t0 = time.time()
    params, neg, mean, var = fit_predict()
    _ = float(neg)
    _ = np.asarray(mean)
    steady = time.time() - t0

    rate, chol_dt, _ = bench_gram_chol_rate(spec, {k: v for k, v in params.items()}, xc, xk)
    print(
        f"[bench] steady fit+predict {steady:.3f}s | Gram+Chol {rate:.0f} GFLOP/s "
        f"({chol_dt*1e3:.1f} ms per {xc.shape[0]}² factorization) | "
        f"mean range [{float(np.min(mean)):.3f}, {float(np.max(mean)):.3f}]",
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
