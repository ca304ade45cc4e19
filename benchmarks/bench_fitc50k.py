"""BASELINE config 4 (single-chip variant): 50k-point sparse-GP stress.

The dense 50k² Gram (10 GB f32, several live copies under autodiff) exceeds
one v5e's HBM — the exact dense path at this scale is the round-2 multi-chip
target. The supported single-chip path is FITC with inducing points: O(N·M²)
fit with multi-restart hyperparameter optimization, entirely on device.

Prints one JSON line with steady-state wall-clock for fit + 200-pt predict.
"""

import json
import os
import sys
import time

# BENCH_DTYPE=float64 runs the full FITC path in f64 (BASELINE config 4's
# dtype letter); BENCH_FITC_RESTARTS=32 its restart letter.
_dtype_name = os.environ.get("BENCH_DTYPE", "float32")
os.environ.setdefault("GUMBI_TPU_X64", "1" if _dtype_name == "float64" else "0")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gumbi_tpu.ops import GPSpec, GPTerm, initial_params, ls_prior_params  # noqa: E402
from gumbi_tpu.ops.fitc import fitc_neg_logp, fitc_predict, kmeans_inducing  # noqa: E402
from gumbi_tpu.ops.optimize import multi_restart_minimize  # noqa: E402
from gumbi_tpu.ops.priors import constrain  # noqa: E402

N = int(os.environ.get("BENCH_FITC_N", 50_000))
N_U = int(os.environ.get("BENCH_FITC_NU", 512))
N_RESTARTS = int(os.environ.get("BENCH_FITC_RESTARTS", 8))
MAXITER = int(os.environ.get("BENCH_FITC_MAXITER", 60))
DTYPE = jnp.float64 if _dtype_name == "float64" else jnp.float32
NP_DTYPE = np.float64 if _dtype_name == "float64" else np.float32


def main():
    rng = np.random.default_rng(0)
    X = rng.uniform(-2, 2, size=(N, 2)).astype(NP_DTYPE)
    y = (np.sin(1.3 * X[:, 0]) * np.cos(0.9 * X[:, 1]) + rng.normal(0, 0.1, N)).astype(
        NP_DTYPE
    )

    spec = GPSpec(terms=(GPTerm(suffix="total", kernel="ExpQuad"),), d_cont=2, ard=True)

    t0 = time.time()
    Xu = kmeans_inducing(X[rng.choice(N, 8192, replace=False)], N_U, seed=0, n_iter=10)
    print(f"[fitc50k] kmeans {time.time()-t0:.1f}s ({N_U} inducing)", file=sys.stderr)

    sub = X[rng.choice(N, 512, replace=False)]
    lowers, uppers = [], []
    for j in range(2):
        dd = np.abs(sub[:, j : j + 1] - sub[:, j : j + 1].T)[np.triu_indices(len(sub), 1)]
        dd = dd[dd > 0]
        lowers.append(max(float(dd.min()), 0.01))
        uppers.append(float(dd.max()))
    la_np, lb_np = ls_prior_params(lowers, uppers)

    xc = jnp.asarray(X)
    yj = jnp.asarray(y)
    xk = jnp.zeros((N, 0), dtype=jnp.int32)
    xu_c = jnp.asarray(Xu, dtype=DTYPE)
    xu_k = jnp.zeros((N_U, 0), dtype=jnp.int32)
    la = jnp.asarray(la_np, dtype=DTYPE)
    lb = jnp.asarray(lb_np, dtype=DTYPE)
    u0s = initial_params(spec, la_np, lb_np, n_restarts=N_RESTARTS, seed=0, dtype=DTYPE)

    g = np.linspace(-2, 2, 200).astype(NP_DTYPE)
    xc_new = jnp.asarray(np.column_stack([g, np.zeros_like(g)]))
    xk_new = jnp.zeros((200, 0), dtype=jnp.int32)

    @jax.jit
    def fit(u0s):
        def objective(u):
            return fitc_neg_logp(spec, u, xc, xk, xu_c, xu_k, yj, la, lb)

        return multi_restart_minimize(objective, u0s, maxiter=MAXITER, mode="sequential")

    def fit_predict():
        u, f, _ = fit(u0s)
        params = constrain(u)
        mean, var = fitc_predict(spec, params, xc, xk, xu_c, xu_k, yj, xc_new, xk_new)
        return float(f), np.asarray(mean), np.asarray(var)

    t0 = time.time()
    f, mean, var = fit_predict()
    compile_s = time.time() - t0
    print(f"[fitc50k] compile+first {compile_s:.1f}s neg_logp={f:.1f}", file=sys.stderr)

    t0 = time.time()
    f, mean, var = fit_predict()
    steady = time.time() - t0

    rmse = float(np.sqrt(np.mean((mean - np.sin(1.3 * g) * np.cos(0.0)) ** 2)))
    print(
        f"[fitc50k] steady {steady:.2f}s | grid RMSE vs truth {rmse:.4f} | "
        f"mean range [{mean.min():.2f}, {mean.max():.2f}]",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"FITC fit+predict {N}-pt GP ({N_U} inducing, {N_RESTARTS} restarts, 1 chip {_dtype_name})",
                "value": round(steady, 2),
                "unit": "s",
                "vs_baseline": None,
                "dtype": _dtype_name,
                "restarts": N_RESTARTS,
                "compile_s": round(compile_s, 1),
                "grid_rmse": round(rmse, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
