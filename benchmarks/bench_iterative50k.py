"""EXACT dense-GP at N = 50,000 on ONE chip: the iterative (mBCG) engine.

BASELINE config 4 is the 50k-point stress test. The Cholesky engine cannot
run it exactly on one chip — the (N, N) factor alone is 10 GB and the
O(N³/3) = 4.2e13 FLOP factorization at the measured ~8 TFLOP/s XLA-Cholesky
rate would take ~5 s per objective evaluation *if* it fit. The iterative
engine (`ops/iterative.py`) runs the same exact-GP objective matrix-free;
since round 4 its matvec is a fused Pallas kernel (`ops/pallas_kernels.py`):
Gram tiles are built in VMEM from exact f32 elementwise distances and
consumed by the MXU without K ever touching HBM.

Reports one JSON line:
  value           steady value+grad wall-clock seconds at N (the optimizer
                  step cost — what a 50k MAP fit pays per iteration)
  vs_baseline     extrapolated one-chip Cholesky value+grad time / value
                  (cube-law extrapolation from a measured smaller-N Cholesky
                  MLL on the same chip — the Cholesky can't run at 50k)
  fit_s           END-TO-END user-API campaign: GP.find_MAP(engine=
                  'iterative', n_restarts=32) — coarse Cholesky restart
                  triage on a subsample, full-N iterative polish, posterior
                  cache with the LOVE variance factor
  predict_s       GP.predict_grid over a 100×100 grid from that fit
  cg_iters        PCG iterations to tol on the blocked RHS
  matvec_ms       one fused A·V sweep (the roofline unit)
  matvec_tflops   matvec throughput over counted useful FLOPs
                  2·N²·(d + R); the VERDICT r3 roofline row
  matvec_xla_ms   the materialize-then-GEMM XLA path it replaced
  rel_err_16k     |iterative − Cholesky| / |Cholesky| MLL at N=16,384 f32
                  (largest N where the dense Cholesky still runs on-chip)
  love_var_relerr median |LOVE − exact| / exact posterior variance at
                  N=16,384 (exact diagonal from the Cholesky posterior),
                  love_rank alongside — the accuracy regime of the headline

Env knobs: BENCH_ITER_N (50000), BENCH_ITER_BLOCK (2500), BENCH_ITER_RANK
(512), BENCH_ITER_PROBES (64), BENCH_ITER_TOL (1e-2), BENCH_ITER_MAXITER
(256), BENCH_ITER_SKIP_FIT (0 → run the end-to-end campaign).
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
RANK = int(os.environ.get("BENCH_ITER_RANK", 512))
# 64 probes: the fused matvec is flat in column count up to the 128-lane MXU
# width (R sweep in benchmarks/README.md — 19.3 ms at R=9 vs 19.1 ms at
# R=65), so the wide probe block buys an 8× lower-variance SLQ logdet for
# free. Counted-throughput plateau at very large R is ~40 TFLOP/s (R=513).
PROBES = int(os.environ.get("BENCH_ITER_PROBES", 64))
TOL = float(os.environ.get("BENCH_ITER_TOL", 1e-2))
MAXITER = int(os.environ.get("BENCH_ITER_MAXITER", 256))
CHOL_N = int(os.environ.get("BENCH_ITER_CHOL_N", 16_384))
SKIP_FIT = os.environ.get("BENCH_ITER_SKIP_FIT", "0") == "1"
# 512: measured accuracy knee at N=16,384 (rank 64 → 860× median variance
# over-estimate, 256 → 1.5×, 512 → 0.6% median rel err, plateau beyond).
LOVE_RANK = int(os.environ.get("BENCH_ITER_LOVE_RANK", 512))
DTYPE = jnp.float32


def make_data(n, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-2, 2, size=(n, 2)).astype(np.float32)
    y = (np.sin(1.3 * X[:, 0]) * np.cos(0.9 * X[:, 1]) + rng.normal(0, 0.1, n)).astype(
        np.float32
    )
    return X, y


def bench_step(spec, xc, xk, y, la, lb, u, cfg, pn, pk):
    """Steady value+grad time + CG iteration count + matvec unit costs."""
    vg = jax.jit(jax.value_and_grad(
        lambda uu: iter_map_neg_logp(spec, uu, xc, xk, y, la, lb, pn, pk, cfg)
    ))
    t0 = time.time()
    v, g = vg(u)
    jax.block_until_ready(g)
    compile_s = time.time() - t0
    assert np.isfinite(float(v)), "iterative MLL not finite"
    print(f"[iter50k] compile+first value+grad {compile_s:.1f}s, "
          f"neg_logp={float(v):.1f}", file=sys.stderr)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        v, g = vg(u)
    jax.block_until_ready(g)
    v = float(v)  # force
    steady = (time.perf_counter() - t0) / reps

    from gumbi_tpu.ops.iterative import _iter_forward, _make_matvec, _noise_vec
    from gumbi_tpu.ops.priors import constrain

    params = constrain(u)

    @jax.jit
    def fwd_count(params):
        _, (_, _, _, iters) = _iter_forward(
            spec, cfg, params, xc, xk, y, pn, pk, None, None
        )
        return iters

    cg_iters = int(fwd_count(params))

    d = _noise_vec(spec, params, xk, cfg.jitter, None, None, DTYPE)
    V0 = jnp.concatenate([y[:, None], pn], axis=1)

    def time_matvec(c):
        mv = jax.jit(lambda V: _make_matvec(spec, c, params, xc, xk, d, None)(V))
        out = mv(V0)
        _ = float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(5):
            out = mv(V0)
        _ = float(jnp.sum(out))
        return (time.perf_counter() - t0) / 5

    matvec_s = time_matvec(cfg)
    # the XLA blocked path it replaced
    os.environ["GUMBI_TPU_FUSED_MATVEC"] = "0"
    matvec_xla_s = time_matvec(cfg)
    os.environ.pop("GUMBI_TPU_FUSED_MATVEC")
    rcols = 1 + PROBES
    n = xc.shape[0]
    matvec_flops = 2 * n * n * (2 + rcols)  # distances (d=2) + tile GEMM
    return compile_s, steady, cg_iters, matvec_s, matvec_xla_s, matvec_flops, v


def bench_chol_anchor(spec, X, y_np, la, lb, u, cfg_template):
    """Cholesky at the largest on-chip N: rel err + cube-law extrapolation +
    the LOVE-variance accuracy regime against the exact posterior diagonal."""
    xc_s = jnp.asarray(X[:CHOL_N])
    y_s = jnp.asarray(y_np[:CHOL_N])
    xk_s = jnp.zeros((CHOL_N, 0), dtype=jnp.int32)
    cfg_s = IterConfig(
        maxiter=MAXITER, tol=1e-4, n_probes=PROBES, precond_rank=RANK,
        quad_steps=32, block=BLOCK if CHOL_N % BLOCK == 0 else 2048,
        love_rank=LOVE_RANK,
    )
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
    vc = float(vc)
    chol_s = (time.perf_counter() - t0) / 3
    rel_err = abs(vi - vc) / abs(vc)
    chol_extrap = chol_s * (N / CHOL_N) ** 3

    # LOVE variance accuracy vs the exact Cholesky posterior diagonal
    from gumbi_tpu.ops.iterative import iter_posterior_cache, iter_predict_diag
    from gumbi_tpu.ops.mll import DEFAULT_JITTER
    from gumbi_tpu.ops.kernels import gram, gram_diag, noise_diag
    from gumbi_tpu.ops.priors import constrain

    params = constrain(u)
    rng = np.random.default_rng(7)
    m_star = 512
    xs = jnp.asarray(rng.uniform(-2, 2, (m_star, 2)).astype(np.float32))
    xks = jnp.zeros((m_star, 0), dtype=jnp.int32)
    cache = jax.jit(lambda p: iter_posterior_cache(
        spec, cfg_s, p, xc_s, xk_s, y_s))(params)
    _, var_love = jax.jit(lambda p, c: iter_predict_diag(
        spec, cfg_s, p, c, xc_s, xk_s, xs, xks, with_noise=False))(params, cache)

    @jax.jit
    def exact_var(p):
        K = gram(spec, p, xc_s, xk_s, xc_s, xk_s)
        dvec = noise_diag(spec, p, xk_s, dtype=DTYPE) + DEFAULT_JITTER
        A = K + jnp.diag(dvec)
        C = jnp.linalg.cholesky(A)
        Ks = gram(spec, p, xs, xks, xc_s, xk_s)
        W = jax.scipy.linalg.solve_triangular(C, Ks.T, lower=True)
        return gram_diag(spec, p, xs, xks) - jnp.sum(W * W, axis=0)

    ve = np.asarray(exact_var(params))
    vl = np.asarray(var_love)
    love_relerr = float(np.median(np.abs(vl - ve) / np.maximum(ve, 1e-12)))
    conservative_frac = float(np.mean(vl >= ve - 1e-6))
    return chol_s, chol_extrap, rel_err, love_relerr, conservative_frac


def bench_campaign(X, y_np, label="cold"):
    """End-to-end through the USER API: DataSet → GP.fit(engine='iterative',
    32 restarts) → 100×100 predict_grid. One wall-clock number each.

    Run twice by the caller: the first (cold) pass is compile-dominated
    (~110 s of one-time program builds in a fresh process — the coarse
    restart program, the polish value/value+grad, the posterior cache; the
    32 coarse restarts themselves execute in 2.7 s, measured), the second
    (warm) pass is what a session that has already fitted once — a lab
    loop, a cross-validation sweep — actually pays.
    """
    import pandas as pd

    import gumbi_tpu as gmb

    df = pd.DataFrame({"x1": X[:, 0], "x2": X[:, 1], "y": y_np})
    t0 = time.time()
    ds = gmb.DataSet(df, outputs=["y"])
    gp = gmb.GP(ds)
    gp.specify_model(outputs=["y"], continuous_dims=["x1", "x2"])
    gp.build_model()
    cfg = IterConfig(
        maxiter=MAXITER, tol=TOL, n_probes=PROBES, precond_rank=RANK,
        quad_steps=32, block=BLOCK, love_rank=LOVE_RANK,
    )
    setup_s = time.time() - t0
    t0 = time.time()
    gp.find_MAP(
        engine="iterative", n_restarts=32, maxiter=40, seed=0,
        iter_config=cfg, coarse_n=2048, polish_maxiter=40,
    )
    fit_s = time.time() - t0
    t0 = time.time()
    gp.prepare_grid(resolution=100)
    pred = gp.predict_grid(with_noise=False)
    _ = np.asarray(pred.μ)
    predict_s = time.time() - t0
    print(f"[iter50k] campaign ({label}): setup {setup_s:.1f}s | fit {fit_s:.1f}s "
          f"(coarse 32 restarts @2048 + polish @{N}) | predict {predict_s:.2f}s "
          f"(10k grid) | MAP ls={np.round(gp.MAP['ls_total'], 3)}",
          file=sys.stderr)
    return fit_s, predict_s


def main():
    assert N % BLOCK == 0, f"N ({N}) must be divisible by BLOCK ({BLOCK})"
    spec = GPSpec(terms=(GPTerm(suffix="total", kernel="ExpQuad"),), d_cont=2)
    X, y_np = make_data(N)
    xc, y = jnp.asarray(X), jnp.asarray(y_np)
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
        quad_steps=32, block=BLOCK, love_rank=LOVE_RANK,
    )
    pn, pk = draw_probes(0, N, cfg, dtype=DTYPE)
    print(f"[iter50k] N={N} block={BLOCK} rank={RANK} probes={PROBES} tol={TOL} "
          f"device={jax.devices()[0]}", file=sys.stderr)

    compile_s, steady, cg_iters, matvec_s, matvec_xla_s, matvec_flops, v = (
        bench_step(spec, xc, xk, y, la, lb, u, cfg, pn, pk)
    )
    tflops = matvec_flops / matvec_s / 1e12
    print(f"[iter50k] steady value+grad {steady:.3f}s | cg_iters {cg_iters} | "
          f"fused matvec {matvec_s*1e3:.1f}ms ({tflops:.2f} TFLOP/s counted) | "
          f"XLA matvec {matvec_xla_s*1e3:.1f}ms", file=sys.stderr)

    chol_s, chol_extrap, rel_err, love_relerr, conservative = bench_chol_anchor(
        spec, X, y_np, la, lb, u, cfg
    )
    print(f"[iter50k] chol@{CHOL_N} {chol_s:.3f}s → cube-law @{N} ≈ "
          f"{chol_extrap:.1f}s | rel_err@{CHOL_N} {rel_err:.2e} | LOVE var "
          f"median rel err {love_relerr:.3f} (rank {LOVE_RANK}, "
          f"{conservative*100:.0f}% conservative)", file=sys.stderr)

    fit_s = predict_s = fit_warm_s = predict_warm_s = None
    if not SKIP_FIT:
        fit_s, predict_s = bench_campaign(X, y_np, label="cold")
        fit_warm_s, predict_warm_s = bench_campaign(X, y_np, label="warm")

    out = {
        "metric": f"EXACT dense {N}-pt GP MLL value+grad, iterative mBCG engine "
                  "(1 chip, f32, fused Pallas matvec)",
        "value": round(steady, 3),
        "unit": "s",
        "vs_baseline": round(chol_extrap / steady, 2),
        "compile_s": round(compile_s, 1),
        "cg_iters": cg_iters,
        "matvec_ms": round(matvec_s * 1e3, 2),
        "matvec_tflops": round(tflops, 2),
        "matvec_xla_ms": round(matvec_xla_s * 1e3, 2),
        "rel_err_16k": round(rel_err, 6),
        "chol_16k_s": round(chol_s, 3),
        "love_rank": LOVE_RANK,
        "love_var_relerr_16k": round(love_relerr, 4),
        "love_conservative_frac": round(conservative, 3),
    }
    if fit_s is not None:
        out["fit_s"] = round(fit_s, 1)
        out["predict_s"] = round(predict_s, 2)
        out["fit_warm_s"] = round(fit_warm_s, 1)
        out["predict_warm_s"] = round(predict_warm_s, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
