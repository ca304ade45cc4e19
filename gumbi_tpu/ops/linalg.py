"""Cholesky-backed quadratic form + log-determinant with a hand-derived VJP.

Every Gaussian (marginal) likelihood in the engine reduces to

    quad   = zᵀ A⁻¹ z
    logdet = log |A|

for an SPD matrix ``A``. Differentiating these through ``jnp.linalg.cholesky``
is the single worst program on the TPU toolchain: the batched Cholesky VJP
blows compile time up ~250× (502 s vs 2.1 s measured at N=512) and faults the
worker at N ≳ 2.5k, which is why round 1 had to run hyperparameter restarts
sequentially. The analytic gradients

    ∂quad/∂A   = −α αᵀ,   α = A⁻¹ z
    ∂quad/∂z   = 2 α
    ∂logdet/∂A = A⁻¹

never differentiate the factorization at all: the backward pass is two
(batched) triangular solves against the forward factor. ``quad_and_logdet``
packages this as a ``jax.custom_vjp`` so callers (dense MLL, Kronecker MLL,
FITC) get exact gradients with Cholesky appearing only in forward passes —
vmap/batching then lowers to plain batched factorizations and solves.

The reference has no analog (PyTensor/PyTorch autodiff handled this); this is
TPU-native infrastructure mandated by the vmapped-multi-restart target
(BASELINE.md north star).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

__all__ = ["quad_and_logdet", "spd_solve", "tri_inverse"]

# Size gate for the recursive triangular inverse in the VJP: below this,
# XLA's fused solve wins (fewer ops, no concat traffic); above it the
# GEMM-based recursion is ~2.4× faster — but ONLY behind an optimization
# barrier (measured on v5e at N=5120 f32, benchmarks/probe_qld_bwd.py:
# XLA solve+GEMM 23.0 ms; recursion w/o barrier 24.7 ms — XLA fuses or
# rematerializes the concat tree into consumers; recursion + barrier 9.4 ms).
_TRI_INV_RECURSION_MIN = 2048
_TRI_INV_BASE = 640


def tri_inverse(L, base=_TRI_INV_BASE):
    """L⁻¹ for lower-triangular ``L`` (..., N, N) by divide and conquer.

    The identity  [[L11, 0], [L21, L22]]⁻¹ = [[V11, 0], [−V22 L21 V11, V22]]
    is log-depth with all heavy work in large batched GEMMs — XLA's
    ``solve_triangular(L, I)`` on TPU runs its sequential panel sweep at a
    few percent of the MXU rate instead. Callers composing the result into
    further GEMMs should wrap it in ``jax.lax.optimization_barrier`` (see
    :func:`_qld_bwd`).
    """
    n = L.shape[-1]
    if n <= base:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=L.dtype), L.shape)
        return jsl.solve_triangular(L, eye, lower=True)
    h = n // 2
    V11 = tri_inverse(L[..., :h, :h], base)
    V22 = tri_inverse(L[..., h:, h:], base)
    V21 = -(V22 @ (L[..., h:, :h] @ V11))
    z12 = jnp.zeros(L.shape[:-2] + (h, n - h), dtype=L.dtype)
    top = jnp.concatenate([V11, z12], axis=-1)
    bot = jnp.concatenate([V21, V22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _chol_and_alpha(A, z):
    L = jnp.linalg.cholesky(A)
    α = jsl.cho_solve((L, True), z[..., :, None])[..., 0]
    return L, α


@jax.custom_vjp
def quad_and_logdet(A, z):
    """(zᵀA⁻¹z, log|A|) for SPD ``A`` — Cholesky is never differentiated.

    Shapes: ``A`` (..., N, N), ``z`` (..., N); returns two (...,) arrays.
    Leading batch dimensions map onto XLA's batched Cholesky/solves. A
    non-PD ``A`` surfaces as NaNs (downstream NaN→+inf guards handle it).

    The primal (what value-only line-search trials evaluate) computes the
    quadratic form as |L⁻¹z|² — ONE triangular solve. The full α = A⁻¹z
    (two solves) is only needed for the backward pass, so it lives in
    ``_qld_fwd``. Measured on v5e at N=5120, D=2: each 1-RHS triangular
    solve costs ~4.4 ms against an 11 ms Cholesky (the sequential panel
    sweep is latency-bound, not FLOP-bound), so dropping the second solve
    cuts the hot MLL from 14.3 to ~12 ms (benchmarks/probe_mll_compose.py).
    """
    L = jnp.linalg.cholesky(A)
    w = jsl.solve_triangular(L, z[..., :, None], lower=True)[..., 0]
    quad = jnp.sum(w * w, axis=-1)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return quad, logdet


def _qld_fwd(A, z):
    L, α = _chol_and_alpha(A, z)
    quad = jnp.sum(z * α, axis=-1)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return (quad, logdet), (L, α)


def _qld_bwd(res, cotangents):
    L, α = res
    g_quad, g_logdet = cotangents
    n = L.shape[-1]
    # A⁻¹ = L⁻ᵀ L⁻¹. Large N: recursive GEMM inverse behind an optimization
    # barrier (2.4× the XLA solve, see module constant above). Small N: one
    # fused triangular solve (the sequential-panel cost is negligible and the
    # recursion's concat overhead is not). float64 ON TPU always takes the
    # fused solve: f64 there is emulated and the recursion's unrolled GEMM
    # tree makes the program uncompilable in practice (>10 min at N=4096,
    # measured r3) — the emulation also erases the GEMM-vs-solve advantage.
    # (CPU/GPU f64 keeps the recursion; tests exercise it at f64.)
    f64_on_tpu = L.dtype == jnp.float64 and jax.default_backend() == "tpu"
    if n >= _TRI_INV_RECURSION_MIN and not f64_on_tpu:
        Linv = jax.lax.optimization_barrier(tri_inverse(L))
    else:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=L.dtype), L.shape)
        Linv = jsl.solve_triangular(L, eye, lower=True)
    Ainv = jnp.swapaxes(Linv, -1, -2) @ Linv
    outer = α[..., :, None] * α[..., None, :]
    A_bar = g_logdet[..., None, None] * Ainv - g_quad[..., None, None] * outer
    z_bar = 2.0 * g_quad[..., None] * α
    return A_bar, z_bar


quad_and_logdet.defvjp(_qld_fwd, _qld_bwd)


@jax.custom_vjp
def spd_solve(A, B):
    """A⁻¹B for SPD ``A`` (..., N, N) and ``B`` (..., N, K).

    Same rationale as :func:`quad_and_logdet`: the backward pass solves
    against the forward Cholesky factor (B̄ = A⁻¹Ḡ, Ā = −B̄Xᵀ for symmetric
    A) instead of differentiating the factorization/triangular solves.
    """
    L = jnp.linalg.cholesky(A)
    return jsl.cho_solve((L, True), B)


def _spd_solve_fwd(A, B):
    L = jnp.linalg.cholesky(A)
    X = jsl.cho_solve((L, True), B)
    return X, (L, X)


def _spd_solve_bwd(res, G):
    L, X = res
    B_bar = jsl.cho_solve((L, True), G)
    A_bar = -B_bar @ jnp.swapaxes(X, -1, -2)
    return A_bar, B_bar


spd_solve.defvjp(_spd_solve_fwd, _spd_solve_bwd)
