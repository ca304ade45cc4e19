"""Cost of a real 100×100-grid × 2-output Kronecker prediction (N=5120).

VERDICT r2 weak #2 / next-item 1: the bench predicted a 100-pt slice; the
reference's grid semantics for a 2-continuous-dim model is resolution=100
per dim → 10,000 points (ref gumbi/regression/base.py:701-726). This probe
measures the full-grid predict both ways:

  solve   t = Σ solve_triangular(L_i, Kxs)²      (sequential panel sweep,
          N×M triangular solve per output)
  gemm    V_i = tri_inverse(L_i) once, t = Σ (V_i @ Kxs)²  (pure MXU GEMMs)

plus the kron_cache rebuild that precedes prediction in the bench chain.

Run on the real chip:  python benchmarks/probe_predict_grid.py
"""

import os
import sys
import time

os.environ.setdefault("GUMBI_TPU_X64", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from gumbi_tpu.ops import CoregTerm, GPSpec, GPTerm
from gumbi_tpu.ops.kronecker import (
    _continuous_diag,
    _continuous_gram,
    kron_cache,
    kron_predict_diag,
)
from gumbi_tpu.ops.linalg import tri_inverse

N = int(os.environ.get("PROBE_N", 5120))
GRID = int(os.environ.get("PROBE_GRID", 100))
D = 2
DTYPE = jnp.float32


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    xc = jnp.asarray(rng.uniform(-2, 2, size=(N, 2)).astype(np.float32))
    Y = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    g = np.linspace(-2, 2, GRID).astype(np.float32)
    G1, G2 = np.meshgrid(g, g, indexing="ij")
    xc_grid = jnp.asarray(np.column_stack([G1.ravel(), G2.ravel()]))
    M = xc_grid.shape[0]

    out_cg = CoregTerm(name="Parameter", col=0, d_out=D)
    spec = GPSpec(
        terms=(GPTerm(suffix="total", kernel="ExpQuad", coregs=(out_cg,)),),
        d_cont=2,
        ard=True,
        noise_coreg=CoregTerm(name="Output_noise", col=0, d_out=D),
    )
    params = {
        "ls_total": jnp.asarray([0.8, 0.9], DTYPE),
        "η_total": jnp.asarray(1.2, DTYPE),
        "σ": jnp.asarray(0.15, DTYPE),
        "W_Parameter": jnp.asarray(rng.normal(size=(D, 2)).astype(np.float32) * 0.5),
        "κ_Parameter": jnp.asarray([0.5, 0.5], DTYPE),
        "W_Output_noise": jnp.asarray(rng.normal(size=(D, 2)).astype(np.float32) * 0.1),
        "κ_Output_noise": jnp.asarray([0.9, 0.9], DTYPE),
    }

    print(f"device={jax.devices()[0]}, N={N}, M={M}, D={D}", file=sys.stderr)

    cache_j = jax.jit(lambda p: kron_cache(spec, p, xc, Y))
    cache = cache_j(params)
    t_cache = timeit(cache_j, params)

    # Current library path (solve_triangular per output)
    predict_solve_j = jax.jit(
        lambda p, c: kron_predict_diag(spec, p, c, xc_grid, with_noise=True)
    )
    m1, v1 = predict_solve_j(params, cache)
    t_solve = timeit(predict_solve_j, params, cache)

    # GEMM variant: invert L once, then everything is batched matmul
    def predict_gemm(p, c):
        Kxs = _continuous_gram(spec, p, c.xc_locs, xc_grid)  # (N, M)
        mean = c.B @ (c.alpha @ Kxs)
        V = jax.lax.optimization_barrier(tri_inverse(c.L))  # (D, N, N)
        t = jnp.sum((V @ Kxs[None, :, :]) ** 2, axis=1)  # (D, M)
        kss = _continuous_diag(spec, p, xc_grid)
        var = jnp.diag(c.B)[:, None] * kss[None, :] - (c.C**2).T @ t
        var = jnp.maximum(var, 0.0) + (c.s2 - 1e-6)[:, None]
        return mean, var

    predict_gemm_j = jax.jit(predict_gemm)
    m2, v2 = predict_gemm_j(params, cache)
    t_gemm = timeit(predict_gemm_j, params, cache)

    dm = float(jnp.max(jnp.abs(m1 - m2)))
    dv = float(jnp.max(jnp.abs(v1 - v2)))
    print(f"kron_cache rebuild   {t_cache:7.1f} ms")
    print(f"predict solve path   {t_solve:7.1f} ms")
    print(f"predict gemm path    {t_gemm:7.1f} ms   |Δmean|={dm:.2e} |Δvar|={dv:.2e}")
    flops = D * N * N * M * 2  # dominant term both ways
    print(
        f"gemm rate {flops / (t_gemm * 1e-3) / 1e12:6.2f} TFLOP/s | "
        f"solve rate {flops / (t_solve * 1e-3) / 1e12:6.2f} TFLOP/s"
    )


if __name__ == "__main__":
    main()
