"""Decompose the hot Kronecker MLL (N=5120, D=2, f32) into its op costs.

VERDICT r2 weak #1: the composed MLL measured 17.2 ms while the measured op
floors sum to ~13-14 ms (11.0 ms batched chol + ~2 ms Gram + solves). This
probe times each stage as its own jitted program to locate the gap:

  gram        continuous RBF Gram Kx (N, N)
  assemble    A = ω·Kx + I (2, N, N) + whitening (tiny eigh)
  chol        batched (2, N, N) Cholesky
  solve_w     w = L⁻¹ z (one triangular solve, 1 RHS) → quad = |w|²
  cho_solve   α = A⁻¹ z (two triangular solves, 1 RHS — what cho_solve does)
  mll         the full composed kron_mll
  mll_pallas  same with the Pallas fused RBF Gram enabled

Run on the real chip:  python benchmarks/probe_mll_compose.py
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
from gumbi_tpu.ops.kernels import enable_pallas
from gumbi_tpu.ops.kronecker import _continuous_gram, _whitened_eig, kron_mll, kron_parts

N = int(os.environ.get("PROBE_N", 5120))
D = 2
DTYPE = jnp.float32


def timeit(fn, *args, reps=10):
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

    print(f"device={jax.devices()[0]}, N={N}, D={D}", file=sys.stderr)

    # --- stage programs ---
    gram_j = jax.jit(lambda p: _continuous_gram(spec, p, xc, xc))

    def assemble(p, Kx):
        B, s2 = kron_parts(spec, p)
        s, ω, U = _whitened_eig(B, s2)
        Z = (Y / s[None, :]) @ U
        eye = jnp.eye(N, dtype=Kx.dtype)
        A = ω[:, None, None] * Kx[None, :, :] + eye[None, :, :]
        return A, Z

    assemble_j = jax.jit(assemble)
    chol_j = jax.jit(lambda A: jnp.linalg.cholesky(A))
    solve_w_j = jax.jit(
        lambda L, Z: jnp.sum(
            jsl.solve_triangular(L, Z.T[..., None], lower=True)[..., 0] ** 2, axis=-1
        )
    )
    cho_solve_j = jax.jit(
        lambda L, Z: jsl.cho_solve((L, True), Z.T[..., None])[..., 0]
    )
    # Pallas is default-on under TPU since r4 — pin it OFF for the XLA
    # baseline stages, then ON for the comparison.
    enable_pallas(False)
    mll_j = jax.jit(lambda p: kron_mll(spec, p, xc, Y))

    Kx = gram_j(params)
    A, Z = assemble_j(params, Kx)
    L = chol_j(A)

    t_gram = timeit(gram_j, params)
    t_asm = timeit(assemble_j, params, Kx)
    t_chol = timeit(chol_j, A)
    t_solve_w = timeit(solve_w_j, L, Z)
    t_cho_solve = timeit(cho_solve_j, L, Z)
    t_mll = timeit(mll_j, params)

    enable_pallas(True)
    mll_pallas_j = jax.jit(lambda p: kron_mll(spec, p, xc, Y))
    gram_pallas_j = jax.jit(lambda p: _continuous_gram(spec, p, xc, xc))
    v_ref = float(mll_j(params))
    v_pal = float(mll_pallas_j(params))
    t_mll_pal = timeit(mll_pallas_j, params)
    t_gram_pal = timeit(gram_pallas_j, params)
    enable_pallas(False)

    print(f"gram        {t_gram:7.2f} ms")
    print(f"gram_pallas {t_gram_pal:7.2f} ms")
    print(f"assemble    {t_asm:7.2f} ms")
    print(f"chol        {t_chol:7.2f} ms")
    print(f"solve_w     {t_solve_w:7.2f} ms  (1-RHS lower solve: the value path needs only this)")
    print(f"cho_solve   {t_cho_solve:7.2f} ms  (two 1-RHS solves: what quad_and_logdet's primal does)")
    print(f"sum(gram+asm+chol+cho_solve) {t_gram+t_asm+t_chol+t_cho_solve:7.2f} ms")
    print(f"mll (composed)               {t_mll:7.2f} ms")
    print(f"mll (pallas gram)            {t_mll_pal:7.2f} ms   |Δvalue|={abs(v_pal-v_ref):.3e}")
    flops = D * (N**3 / 3)
    print(f"mll rate {flops / (t_mll * 1e-3) / 1e12:.2f} TFLOP/s (chol-only FLOPs)")


if __name__ == "__main__":
    main()
