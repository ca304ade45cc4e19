"""EXACT dense-GP MLL at N = 50,000 on ONE chip: the iterative (mBCG) engine.

BASELINE config 4 is the 50k-point stress test. The Cholesky engine cannot
run it exactly on one chip — the (N, N) factor alone is 10 GB and the
O(N³/3) = 4.2e13 FLOP factorization at the measured ~8 TFLOP/s XLA-Cholesky
rate would take ~5 s per objective evaluation *if* it fit. The iterative
engine (`ops/iterative.py`) runs the same exact-GP objective matrix-free:
Gram tiles are built on the fly and consumed by MXU GEMMs, memory is
O(N·block), and one MLL value+gradient costs a few CG sweeps.

Reports one JSON line:
  value           steady value+grad wall-clock seconds at N (the optimizer
                  step cost — what a 50k MAP fit pays per iteration)
  vs_baseline     extrapolated one-chip Cholesky value+grad time / value
                  (cube-law extrapolation from a measured smaller-N Cholesky
                  MLL on the same chip — the Cholesky can't run at 50k)
  cg_iters        PCG iterations to tol on the blocked RHS
  matvec_ms       one blocked A·V sweep (the roofline unit)
  gflops          matvec GEMM throughput (distance matmuls + tile GEMMs)
  rel_err_16k     |iterative − Cholesky| / |Cholesky| MLL at N=16,384 f32
                  (largest N where the dense Cholesky still runs on-chip)

Env knobs: BENCH_ITER_N (50000), BENCH_ITER_BLOCK (2500), BENCH_ITER_RANK
(64), BENCH_ITER_PROBES (8), BENCH_ITER_TOL (1e-2), BENCH_ITER_MAXITER (256).
"""

import json
import os
import sys
import time

os.environ.setdefault("GUMBI_TPU_X64", "0")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("GUMBI_TPU_CACHE_DIR", os.path.expanduser("~/.cache/jax")),
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gumbi_tpu.ops import GPSpec, GPTerm  # noqa: E402
from gumbi_tpu.ops.iterative import (  # noqa: E402
    IterConfig,
    draw_probes,
    iter_map_neg_logp,
)
from gumbi_tpu.ops.mll import map_neg_logp  # noqa: E402

N = int(os.environ.get("BENCH_ITER_N", 50_000))
BLOCK = int(os.environ.get("BENCH_ITER_BLOCK", 2_500))
RANK = int(os.environ.get("BENCH_ITER_RANK", 64))
PROBES = int(os.environ.get("BENCH_ITER_PROBES", 8))
TOL = float(os.environ.get("BENCH_ITER_TOL", 1e-2))
MAXITER = int(os.environ.get("BENCH_ITER_MAXITER", 256))
CHOL_N = int(os.environ.get("BENCH_ITER_CHOL_N", 16_384))
DTYPE = jnp.float32


def make_data(n, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-2, 2, size=(n, 2)).astype(np.float32)
    y = (np.sin(1.3 * X[:, 0]) * np.cos(0.9 * X[:, 1]) + rng.normal(0, 0.1, n)).astype(
        np.float32
    )
    return jnp.asarray(X), jnp.asarray(y)


def main():
    assert N % BLOCK == 0, f"N ({N}) must be divisible by BLOCK ({BLOCK})"
    spec = GPSpec(terms=(GPTerm(suffix="total", kernel="ExpQuad"),), d_cont=2)
    xc, y = make_data(N)
    xk = jnp.zeros((N, 0), dtype=jnp.int32)
    la = jnp.asarray([2.0, 2.0], DTYPE)
    lb = jnp.asarray([1.0, 1.0], DTYPE)
    # Evaluate at SHORT lengthscales: at ls ≈ 1 on [-2, 2]² the kernel's
    # effective rank is below the preconditioner rank and CG converges in
    # ~2 iterations (measured) — flattering but unrepresentative. A MAP
    # optimizer traverses ls ~ 0.3 territory where the Gram has thousands
    # of significant eigenvalues; that is the honest per-step cost.
    u = {
        "ls_total": jnp.log(jnp.asarray([0.30, 0.35], DTYPE)),
        "η_total": jnp.log(jnp.asarray(1.0, DTYPE)),
        "σ": jnp.log(jnp.asarray(0.10, DTYPE)),
    }
    cfg = IterConfig(
        maxiter=MAXITER, tol=TOL, n_probes=PROBES, precond_rank=RANK,
        quad_steps=32, block=BLOCK,
    )
    pn, pk = draw_probes(0, N, cfg, dtype=DTYPE)
    print(f"[iter50k] N={N} block={BLOCK} rank={RANK} probes={PROBES} tol={TOL} "
          f"device={jax.devices()[0]}", file=sys.stderr)

    vg = jax.jit(jax.value_and_grad(
        lambda uu: iter_map_neg_logp(spec, uu, xc, xk, y, la, lb, pn, pk, cfg)
    ))

    t0 = time.time()
    v, g = vg(u)
    jax.block_until_ready(g)
    compile_s = time.time() - t0
    assert np.isfinite(float(v)), "iterative MLL not finite"
    print(f"[iter50k] compile+first value+grad {compile_s:.1f}s, neg_logp={float(v):.1f}",
          file=sys.stderr)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        v, g = vg(u)
    jax.block_until_ready(g)
    steady = (time.perf_counter() - t0) / reps

    # CG iteration count + one matvec cost (instrumented run)
    from gumbi_tpu.ops.iterative import _iter_forward
    from gumbi_tpu.ops.priors import constrain

    params = constrain(u)

    @jax.jit
    def fwd_count(params):
        _, (_, _, _, iters) = _iter_forward(spec, cfg, params, xc, xk, y, pn, pk, None, None)
        return iters

    cg_iters = int(fwd_count(params))

    from gumbi_tpu.ops.iterative import _make_matvec, _noise_vec

    d = _noise_vec(spec, params, xk, cfg.jitter, None, None, DTYPE)
    matvec = jax.jit(lambda V: _make_matvec(spec, cfg, params, xc, xk, d, None)(V))
    V0 = jnp.concatenate([y[:, None], pn], axis=1)
    jax.block_until_ready(matvec(V0))
    t0 = time.perf_counter()
    for _ in range(5):
        out = matvec(V0)
    jax.block_until_ready(out)
    matvec_s = (time.perf_counter() - t0) / 5
    rcols = 1 + PROBES
    matvec_flops = 2 * N * N * (2 + rcols)  # distance matmuls (d=2) + tile GEMM
    gflops = matvec_flops / matvec_s / 1e9

    # Cholesky reference at the largest on-chip N: rel err + cube-law extrapolation
    xc_s, y_s = xc[:CHOL_N], y[:CHOL_N]
    xk_s = jnp.zeros((CHOL_N, 0), dtype=jnp.int32)
    cfg_s = IterConfig(maxiter=MAXITER, tol=1e-4, n_probes=PROBES,
                       precond_rank=RANK, quad_steps=32, block=BLOCK if CHOL_N % BLOCK == 0 else 0)
    pn_s, pk_s = draw_probes(0, CHOL_N, cfg_s, dtype=DTYPE)
    vi = float(jax.jit(lambda uu: iter_map_neg_logp(
        spec, uu, xc_s, xk_s, y_s, la, lb, pn_s, pk_s, cfg_s))(u))
    vg_chol = jax.jit(jax.value_and_grad(
        lambda uu: map_neg_logp(spec, uu, xc_s, xk_s, y_s, la, lb)))
    vc, gc = vg_chol(u)
    jax.block_until_ready(gc)
    t0 = time.perf_counter()
    for _ in range(3):
        vc, gc = vg_chol(u)
    jax.block_until_ready(gc)
    chol_s = (time.perf_counter() - t0) / 3
    rel_err = abs(vi - float(vc)) / abs(float(vc))
    chol_extrap = chol_s * (N / CHOL_N) ** 3
    print(f"[iter50k] steady value+grad {steady:.3f}s | cg_iters {cg_iters} | "
          f"matvec {matvec_s*1e3:.1f}ms ({gflops:.0f} GFLOP/s) | "
          f"chol@{CHOL_N} {chol_s:.3f}s → cube-law @{N} ≈ {chol_extrap:.1f}s | "
          f"rel_err@{CHOL_N} {rel_err:.2e}", file=sys.stderr)

    print(json.dumps({
        "metric": f"EXACT dense {N}-pt GP MLL value+grad, iterative mBCG engine (1 chip, f32)",
        "value": round(steady, 3),
        "unit": "s",
        "vs_baseline": round(chol_extrap / steady, 2),
        "compile_s": round(compile_s, 1),
        "cg_iters": cg_iters,
        "matvec_ms": round(matvec_s * 1e3, 2),
        "gflops": round(gflops),
        "rel_err_16k": round(rel_err, 6),
        "chol_16k_s": round(chol_s, 3),
    }))


if __name__ == "__main__":
    main()
