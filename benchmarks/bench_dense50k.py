"""BASELINE config 4 (exact-dense variant): data-sharded dense large-N GP.

The exact dense N-point GP — no FITC approximation — with the N×N Gram, the
blocked Cholesky, and the analytic-VJP gradient all sharded over the 'data'
mesh axis (gumbi_tpu/parallel/blocked.py): per-device memory O(N²/P), compute
O(N³/P). This is the path that makes dense 50k feasible on a v5e-8 (per-chip
row block at N=50k, P=8: 50k×6250×4 B = 1.25 GB), where one chip cannot hold
the 10 GB Gram plus autodiff workspace.

Defaults adapt to where it runs:
  * multi-device (or forced virtual mesh): full data-sharded fit at BENCH_N
    (default 16384 on a CPU mesh — CI-feasible; set BENCH_N=50000 for the
    full stress on real hardware or a long CPU run)
  * single real chip: largest HBM-feasible exact dense fit (BENCH_N=20480)
    as the demonstration that the same code path runs undistributed

Equality of the distributed factorization/MLL/gradients vs the single-device
ops is pinned by tests/test_parallel.py on the 8-device CPU mesh.

Prints one JSON line: steady wall-clock of ONE MAP fit (multi-restart
L-BFGS warm-started coarse-to-fine like bench.py) + per-MLL timing.
"""

import json
import os
import sys
import time

# BASELINE config 4 letter: "vmapped 32-restart hyperparameter optimization,
# float64 Cholesky". BENCH_DTYPE=float64 runs the whole path (data, Gram,
# blocked Cholesky, analytic VJP — all dtype-generic) in f64; restarts via
# BENCH_RESTARTS. BENCH_FACT_ONLY=1 skips the fit and times just the
# factorization-bound value+grad (the f64-at-scale demonstration, where a
# full f64 fit would be prohibitive on emulated-f64 hardware or 1 CPU core).
_dtype_name = os.environ.get("BENCH_DTYPE", "float32")
os.environ.setdefault("GUMBI_TPU_X64", "1" if _dtype_name == "float64" else "0")

# Allow forcing the virtual mesh BEFORE jax initializes (mirrors
# __graft_entry__.dryrun_multichip's self-configuration: the axon TPU plugin
# ignores the JAX_PLATFORMS env var — only the config API reroutes it).
_force = os.environ.get("BENCH_FORCE_CPU_DEVICES")
if _force:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={_force}"
        # XLA's CPU collective rendezvous hard-kills the process when a
        # participant is >40 s late; on a 1-core host timesharing 8 virtual
        # devices a heavy f64 panel can legitimately take minutes while the
        # other 7 threads wait (observed at N=16384 f64). Raise the limits —
        # virtual-mesh runs here measure correctness, not latency.
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
    )

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if _force:
    jax.config.update("jax_platforms", "cpu")

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("GUMBI_TPU_CACHE_DIR", os.path.expanduser("~/.cache/jax")),
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax.sharding import Mesh  # noqa: E402

from gumbi_tpu.ops import GPSpec, GPTerm, initial_params, ls_prior_params  # noqa: E402
from gumbi_tpu.ops.optimize import lbfgs_backtracking_minimize  # noqa: E402
from gumbi_tpu.ops.priors import constrain, log_prior  # noqa: E402
from gumbi_tpu.ops.mll import map_neg_logp, map_neg_logp_blocked  # noqa: E402
from gumbi_tpu.parallel.sharded import sharded_gram_mll  # noqa: E402

N_RESTARTS = int(os.environ.get("BENCH_RESTARTS", 8))
COARSE_N = int(os.environ.get("BENCH_COARSE_N", 1024))
COARSE_ITERS = int(os.environ.get("BENCH_COARSE_ITERS", 32))
POLISH_ITERS = int(os.environ.get("BENCH_POLISH_ITERS", 12))
FACT_ONLY = os.environ.get("BENCH_FACT_ONLY", "0") == "1"
DTYPE = jnp.float64 if _dtype_name == "float64" else jnp.float32
NP_DTYPE = np.float64 if _dtype_name == "float64" else np.float32


def default_n(n_dev, backend):
    if "BENCH_N" in os.environ:
        return int(os.environ["BENCH_N"])
    if n_dev > 1:
        # CI-feasible on the virtual CPU mesh; 50k is the same program with
        # bigger shards (set BENCH_N=50000 on real multi-chip hardware).
        return 16384
    if backend == "tpu":
        # Largest comfortable 1-chip dense fit through the plain analytic-VJP
        # path (~8 live N² buffers in the fwd+bwd program; 16384² f32 ≈ 1 GB
        # each). The shard_map path at n_dev=1 holds far more live
        # intermediates and OOMs beyond ~8k (measured: 129 GB requested at
        # N=20480).
        return 16384
    return 8192


def main():
    n_dev = jax.device_count()
    backend = jax.default_backend()
    N = default_n(n_dev, backend)
    mesh = Mesh(np.array(jax.devices()), ("data",))

    rng = np.random.default_rng(0)
    X = rng.uniform(-2, 2, size=(N, 2)).astype(NP_DTYPE)
    y = (np.sin(1.3 * X[:, 0]) * np.cos(0.9 * X[:, 1]) + rng.normal(0, 0.1, N)).astype(
        NP_DTYPE
    )
    spec = GPSpec(terms=(GPTerm(suffix="total", kernel="ExpQuad"),), d_cont=2, ard=True)

    sub = X[rng.choice(N, 512, replace=False)]
    lowers, uppers = [], []
    for j in range(2):
        dd = np.abs(sub[:, j : j + 1] - sub[:, j : j + 1].T)[np.triu_indices(len(sub), 1)]
        dd = dd[dd > 0]
        lowers.append(max(float(dd.min()), 0.01))
        uppers.append(float(dd.max()))
    la = jnp.asarray(ls_prior_params(lowers, uppers)[0], DTYPE)
    lb = jnp.asarray(ls_prior_params(lowers, uppers)[1], DTYPE)

    xc = jnp.asarray(X)
    yj = jnp.asarray(y)
    xk = jnp.zeros((N, 0), dtype=DTYPE)
    u0s = initial_params(spec, la, lb, n_restarts=N_RESTARTS, seed=0, dtype=DTYPE)
    print(
        f"[dense] N={N}, devices={n_dev} ({backend}), per-device rows {N // n_dev}, "
        f"Gram {N*N*4/1e9:.1f} GB total / {N*N*4/n_dev/1e9:.2f} GB per device",
        file=sys.stderr,
    )

    if FACT_ONLY:
        # f64-at-scale demonstration: one factorization-bound value+grad of
        # the (distributed when n_dev>1) MLL, no fit. Records runtime +
        # internal-consistency accuracy (quad/logdet vs a numpy f64 oracle at
        # a subsampled size is covered by tests/test_parity.py; here the
        # check is finiteness + grad norms).
        # BENCH_BLOCKED_BWD: 1 → panel-wise backward (ops/mll.py
        # map_neg_logp_blocked — the backward never holds an (N, N)
        # cotangent, so f64 value+grad fits on one chip at N ≥ 8,192 where
        # the dense VJP OOMs at 20.5 GB); 0 → dense VJP; auto → blocked
        # exactly for the single-device f64-at-scale demonstration.
        _blk = os.environ.get("BENCH_BLOCKED_BWD", "auto")
        use_blocked = (
            _blk == "1"
            or (_blk == "auto" and n_dev == 1 and _dtype_name == "float64" and N >= 8192)
        )
        if n_dev > 1:
            def objective(u):
                params = constrain(u)
                logp = sharded_gram_mll(mesh, spec, params, xc, xk, yj)
                total = logp + log_prior(spec, u, la, lb)
                return jnp.where(jnp.isfinite(total), -total, jnp.inf)
        elif use_blocked:
            def objective(u):
                return map_neg_logp_blocked(spec, u, xc, xk, yj, la, lb)
        else:
            def objective(u):
                return map_neg_logp(spec, u, xc, xk, yj, la, lb)

        # BENCH_FACT_GRAD=0 demonstrates the forward factorization (Cholesky
        # + quad/logdet value) only — the f64 gradient program can be a
        # compile bomb on emulated-f64 backends.
        with_grad = os.environ.get("BENCH_FACT_GRAD", "1") == "1"
        u0 = jax.tree_util.tree_map(lambda a: a[0], u0s)
        if with_grad:
            vg = jax.jit(jax.value_and_grad(objective))
        else:
            vg = jax.jit(lambda u: (objective(u), None))
        t0 = time.time()
        v, g = vg(u0)
        v = float(v)
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        v, g = vg(u0)
        v = float(v)
        per_vg = time.perf_counter() - t0
        gnorm = (
            float(jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree_util.tree_leaves(g))))
            if with_grad
            else float("nan")
        )
        assert np.isfinite(v), "f64 factorization not finite"
        assert not with_grad or np.isfinite(gnorm), "f64 gradient not finite"
        chol_flops = N**3 / 3
        print(
            f"[dense] FACT_ONLY {_dtype_name} ({'value+grad' if with_grad else 'value only'}): "
            f"{per_vg:.2f}s (compile+first {compile_s:.1f}s), neg_logp={v:.2f}, "
            f"|grad|={gnorm:.3f}, "
            f"{chol_flops/per_vg/1e9:.0f} GFLOP/s factorization lower bound",
            file=sys.stderr,
        )
        print(
            json.dumps(
                {
                    "metric": (
                        f"exact dense {N}-pt {_dtype_name} MLL "
                        f"{'value+grad' if with_grad else 'value'} "
                        f"({'data-sharded ' + str(n_dev) + ' devices' if n_dev > 1 else 'single device'}, {backend})"
                    ),
                    "value": round(per_vg, 3),
                    "unit": "s",
                    "vs_baseline": None,
                    "dtype": _dtype_name,
                    "compile_s": round(compile_s, 1),
                    "neg_logp": round(v, 3),
                    "blocked_bwd": bool(use_blocked),
                }
            )
        )
        return

    # Coarse basin search on a subsample (single-device objective — tiny)
    subi = np.sort(rng.choice(N, min(COARSE_N, N), replace=False))
    xc_c, y_c, xk_c = xc[subi], yj[subi], xk[subi]

    @jax.jit
    def coarse(u0s):
        def obj(u):
            return map_neg_logp(spec, u, xc_c, xk_c, y_c, la, lb)

        xs, fs, _ = jax.lax.map(
            lambda u0: lbfgs_backtracking_minimize(obj, u0, maxiter=COARSE_ITERS), u0s
        )
        best = jnp.argmin(jnp.where(jnp.isfinite(fs), fs, jnp.inf))
        return jax.tree_util.tree_map(lambda leaf: leaf[best], xs)

    # Full-N polish: every MLL evaluation (and its analytic-VJP gradient)
    # runs the distributed blocked factorization over the 'data' axis. On a
    # single device the plain dense objective is the right program — same
    # math through quad_and_logdet, ~8 live N² buffers instead of the
    # shard_map path's many (which OOM one chip beyond ~8k points).
    if n_dev > 1:
        def dist_objective(u):
            params = constrain(u)
            logp = sharded_gram_mll(mesh, spec, params, xc, xk, yj)
            total = logp + log_prior(spec, u, la, lb)
            return jnp.where(jnp.isfinite(total), -total, jnp.inf)
    else:
        def dist_objective(u):
            return map_neg_logp(spec, u, xc, xk, yj, la, lb)

    @jax.jit
    def polish(u0):
        return lbfgs_backtracking_minimize(dist_objective, u0, maxiter=POLISH_ITERS)

    t0 = time.time()
    u_c = coarse(u0s)
    jax.block_until_ready(jax.tree_util.tree_leaves(u_c)[0])
    u_best, f_best, iters = polish(u_c)
    f_best = float(f_best)
    compile_and_run = time.time() - t0
    print(
        f"[dense] compile+first-run {compile_and_run:.1f}s, neg_logp={f_best:.2f}, "
        f"polish iters={int(iters)}",
        file=sys.stderr,
    )

    t0 = time.perf_counter()
    u_c = coarse(u0s)
    jax.block_until_ready(jax.tree_util.tree_leaves(u_c)[0])
    u_best, f_best, iters = polish(u_c)
    f_best = float(f_best)
    steady = time.perf_counter() - t0

    # Per-MLL cost of the distributed objective (value+grad)
    vg = jax.jit(jax.value_and_grad(dist_objective))
    v, g = vg(u_best)
    jax.block_until_ready(v)
    t0 = time.perf_counter()
    v, g = vg(u_best)
    float(v)
    per_mll = time.perf_counter() - t0
    chol_flops = N**3 / 3
    print(
        f"[dense] steady fit {steady:.2f}s | dist value+grad {per_mll*1e3:.0f} ms "
        f"({chol_flops/per_mll/1e9:.0f} GFLOP/s lower bound on the factorization phase)",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": (
                    f"exact dense {N}-pt {_dtype_name} GP MAP fit ({N_RESTARTS} restarts), "
                    + (
                        f"data-sharded over {n_dev} devices ({backend})"
                        if n_dev > 1
                        else f"single {backend} device"
                    )
                ),
                "value": round(steady, 3),
                "unit": "s",
                "vs_baseline": None,
                "dtype": _dtype_name,
                "restarts": N_RESTARTS,
                "per_mll_grad_ms": round(per_mll * 1e3, 1),
                "compile_s": round(compile_and_run, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
