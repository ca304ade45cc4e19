"""Benchmark: fit + predict_grid for a 10k-point 2-output LMC GP on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = steady-state wall-clock seconds for the MAP fit (8-restart L-BFGS)
plus a 100-pt-per-output grid prediction. vs_baseline is measured against the
BASELINE.json north-star budget of 1.0 s (a v5e-8 target; this runs on 1 chip).

The model is the bench-native Kronecker formulation of the LMC: identical
posterior to the dense tall model (verified in tests/test_kronecker.py), with
the (ND)³ Cholesky replaced by a batched (D, N, N) one.

Fit strategy — a coarse-to-fine warm-start chain, certified against an
exhaustive full-data multi-restart search by tests/test_bench_quality.py:

  coarse  all restarts on a 640-pt subsample (hyperparameters are global;
          a fraction of the data identifies the basin)
  mid     best candidate refined on a 2048-pt subsample
  polish  full-N L-BFGS from the mid optimum (few iterations; the full-data
          gradient at N=5120 costs ~50 ms, so iterations are what matter)

The headline number runs all stages + prediction as ONE jitted program (no
host round-trips); a phase table from per-stage dispatches goes to stderr.
"""

import json
import os
import sys
import time

os.environ.setdefault("GUMBI_TPU_X64", "0")  # f32 on TPU (f64 is emulated + fragile)

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# The env-var spelling of the compilation cache is ignored by this toolchain;
# only the config API works (verified: cache dir stayed empty through a 340 s
# compile). A warm cache turns compile+first-run from ~340 s into seconds.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("GUMBI_TPU_CACHE_DIR", os.path.expanduser("~/.cache/jax")),
)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gumbi_tpu.ops import CoregTerm, GPSpec, GPTerm, initial_params, ls_prior_params  # noqa: E402
from gumbi_tpu.ops.kronecker import kron_cache, kron_neg_logp, kron_predict_diag  # noqa: E402
from gumbi_tpu.ops.optimize import lbfgs_backtracking_minimize  # noqa: E402
from gumbi_tpu.ops.priors import constrain  # noqa: E402

N_LOCS = int(os.environ.get("BENCH_N_LOCS", 5120))  # per output → 2×N_LOCS points
N_RESTARTS = int(os.environ.get("BENCH_RESTARTS", 8))
COARSE_N = int(os.environ.get("BENCH_COARSE_N", 640))  # restart basin search
COARSE_ITERS = int(os.environ.get("BENCH_COARSE_ITERS", 32))
# Mid config is a measured trade: investing more in mid (2560 pts, 24 iters,
# tight ftol) does NOT reduce polish iterations — the N=2.5k optimum differs
# from the full-N optimum by a few nats regardless, so polish has ~the same
# genuine work from any subsample start. Keep mid cheap.
MID_N = int(os.environ.get("BENCH_MID_N", 2048))  # warm-start refinement
MID_ITERS = int(os.environ.get("BENCH_MID_ITERS", 16))
MID_FTOL = float(os.environ.get("BENCH_MID_FTOL", 1e-6))
POLISH_ITERS = int(os.environ.get("BENCH_POLISH_ITERS", 20))  # full-N cap
# Relative-decrease stop for the full-N polish. 3e-5 ≈ 0.2 nats/step at this
# problem's scale — far inside the 0.005 nats/pt (≈51 nats total)
# basin-equivalence tolerance the quality guard (tests/test_bench_quality.py)
# certifies.
POLISH_FTOL = float(os.environ.get("BENCH_POLISH_FTOL", 3e-5))
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

    # Subsamples for the warm-start chain (fixed seeds; quality guarded by
    # tests/test_bench_quality.py against an exhaustive full-N search).
    rng = np.random.default_rng(1)
    sub_c = np.sort(rng.choice(N_LOCS, min(COARSE_N, N_LOCS), replace=False))
    xc_c, Y_c = xc_locs[jnp.asarray(sub_c)], Y[jnp.asarray(sub_c)]
    sub_m = np.sort(rng.choice(N_LOCS, min(MID_N, N_LOCS), replace=False))
    xc_m, Y_m = xc_locs[jnp.asarray(sub_m)], Y[jnp.asarray(sub_m)]

    def stage(xc_d, Y_d, maxiter, ftol=1e-6):
        def objective(u):
            return kron_neg_logp(spec, u, xc_d, Y_d, la, lb)

        return lambda u0: lbfgs_backtracking_minimize(
            objective, u0, maxiter=maxiter, ftol=ftol
        )

    def coarse(u0s):
        # Restarts run sequentially on device (lax.map): with the custom-VJP
        # MLL the vmapped mode also works on TPU, but lax.map measures ~3-4x
        # faster on ONE chip (benchmarks/probe_vmap_tpu.py) — vmapped lanes
        # all run to the slowest lane. Multi-chip meshes shard restarts
        # instead (parallel/sharded.py).
        xs, fs, its = jax.lax.map(stage(xc_c, Y_c, COARSE_ITERS), u0s)
        best = jnp.argmin(jnp.where(jnp.isfinite(fs), fs, jnp.inf))
        return jax.tree_util.tree_map(lambda leaf: leaf[best], xs), its

    def mid(u0):
        x, _, it = stage(xc_m, Y_m, MID_ITERS, ftol=MID_FTOL)(u0)
        return x, it

    def polish(u0):
        return stage(xc_locs, Y, POLISH_ITERS, ftol=POLISH_FTOL)(u0)

    def predict(params):
        kc = kron_cache(spec, params, xc_locs, Y)
        return kron_predict_diag(spec, params, kc, xc_grid, with_noise=True)

    # One jitted program per stage. (Fusing the whole chain into a single
    # program was tried and abandoned: XLA takes >9.5 min to compile the
    # combined map-of-while + 2 whiles + predict program, for ~60 ms of
    # saved dispatch. Four cached programs compile in a fraction of that.)
    coarse_j, mid_j, polish_j, predict_j = map(jax.jit, (coarse, mid, polish, predict))

    def run_chain():
        t0 = time.perf_counter()
        u_c, its_c = coarse_j(u0s)
        jax.block_until_ready(u_c)
        t1 = time.perf_counter()
        u_m, its_m = mid_j(u_c)
        jax.block_until_ready(u_m)
        t2 = time.perf_counter()
        u_best, f_best, its_p = polish_j(u_m)
        jax.block_until_ready(u_best)
        t3 = time.perf_counter()
        params = constrain(u_best)
        mean, var = predict_j(params)
        mean, var = np.asarray(mean), np.asarray(var)
        t4 = time.perf_counter()
        return params, f_best, mean, var, (its_c, its_m, its_p), (t0, t1, t2, t3, t4)

    # --- compile + first run ---
    t0 = time.time()
    params, neg, mean_h, var_h, its, ts0 = run_chain()
    neg = float(neg)
    compile_and_run = time.time() - t0
    c0, c1, c2, c3, c4 = ts0
    print(
        f"[bench] compile+first-run {compile_and_run:.1f}s "
        f"(per program: coarse {c1-c0:.0f}s | mid {c2-c1:.0f}s | polish {c3-c2:.0f}s | "
        f"predict {c4-c3:.0f}s), neg_logp={neg:.2f}",
        file=sys.stderr,
    )

    # --- steady state ---
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        params, neg, mean_h, var_h, its, ts = run_chain()
    steady = (time.perf_counter() - t0) / reps
    its_c, its_m, its_p = (np.asarray(x).tolist() for x in its)
    p0, p1, p2, p3, p4 = ts
    print(
        f"[bench] phases: coarse {(p1-p0)*1e3:.0f}ms (iters {its_c}) | "
        f"mid {(p2-p1)*1e3:.0f}ms (iters {its_m}) | polish {(p3-p2)*1e3:.0f}ms (iters {its_p}) | "
        f"predict {(p4-p3)*1e3:.0f}ms | neg_logp {float(neg):.2f}",
        file=sys.stderr,
    )
    print(f"[bench] steady fit+predict {steady:.3f}s", file=sys.stderr)

    # Hot-path throughput: batched (D, N, N) Gram+Cholesky
    from gumbi_tpu.ops.kronecker import kron_mll

    @jax.jit
    def hot(params):
        return kron_mll(spec, params, xc_locs, Y)

    float(hot(params))
    t0 = time.perf_counter()
    reps = 5
    out = None
    for _ in range(reps):
        out = hot(params)
    float(out)
    dt = (time.perf_counter() - t0) / reps
    d_out = Y.shape[1]
    flops = d_out * (N_LOCS**3 / 3) + 2 * N_LOCS * N_LOCS * spec.d_cont
    rate = flops / dt / 1e9
    print(
        f"[bench] batched Gram+Chol {rate:.0f} GFLOP/s ({dt*1e3:.1f} ms per MLL) "
        f"| mean range [{mean_h.min():.3f}, {mean_h.max():.3f}]",
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
