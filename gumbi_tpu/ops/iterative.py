"""Iterative exact-GP marginal likelihood: batched PCG + stochastic Lanczos.

The Cholesky MLL (`ops/mll.py`) is the right tool up to N ≈ 20k on one chip,
but its throughput is capped by the factorization's serial panel recurrence
(~13% of the MXU GEMM roofline, docs/perf.md §3) and its memory by the dense
O(N²) factor. This module is the TPU-native alternative for large N: every
FLOP is a batched GEMM (kernel-matrix matvecs on the MXU), memory is
O(N·block) in matrix-free mode, and the whole Krylov loop lives in one XLA
`while_loop` — dense EXACT GP inference at N = 50k fits on a single v5e chip.

The algorithm is the modified batched conjugate-gradients (mBCG) approach of
Gardner et al., "GPyTorch: Blackbox Matrix-Matrix Gaussian Process Inference
with GPU Acceleration" (NeurIPS 2018) — the same engine GPyTorch runs under
the reference's own BoTorch backend (reference gumbi/regression/botorch/GP.py
delegates all solves to GPyTorch, which routes them through mBCG for large N).
Reimplemented here from the published algorithm, TPU-first:

  * one preconditioned CG on the blocked RHS [y | z₁ … z_R] yields the solve
    α = A⁻¹y, the probe solves A⁻¹zᵢ, AND (from the CG step scalars) the
    Lanczos tridiagonalizations used for the log-determinant quadrature;
  * logdet A ≈ logdet P + mean_i[(zᵢᵀP⁻¹zᵢ) · e₁ᵀ log(Tᵢ) e₁] with
    zᵢ ~ N(0, P) (stochastic Lanczos quadrature under a preconditioner);
  * the preconditioner P = LLᵀ + D is a rank-k pivoted Cholesky of the
    kernel matrix plus the exact noise diagonal, applied by Woodbury;
  * gradients NEVER differentiate the Krylov loop: given the converged
    solves, d mll = ½ αᵀ(dA)α − 1/(2R) Σᵢ sᵢᵀ(dA)wᵢ with sᵢ = A⁻¹zᵢ and
    wᵢ = P⁻¹zᵢ (E[zzᵀ] = P makes the Hutchinson trace estimator exact in
    expectation), packaged as a `jax.custom_vjp` whose backward pass is one
    differentiation of the Gram *assembly* — the same "never differentiate
    the factorization" discipline as `ops/linalg.py`.

Bucket padding reuses the engine-wide masking convention (`ops/mll.py`):
masked rows become identity rows of A, contributing zero to the quadratic
form and log-determinant, so padding to a static shape is exact.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .kernels import GPSpec, gram, gram_diag, noise_diag
from .mll import DEFAULT_JITTER
from .priors import constrain, log_prior

__all__ = [
    "IterConfig",
    "draw_probes",
    "pivoted_cholesky",
    "lanczos",
    "pcg",
    "iter_gaussian_logp",
    "iter_map_neg_logp",
    "iter_predict_mean",
]

_HI = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class IterConfig:
    """Static configuration for the iterative MLL (hashable; jit-cache key).

    maxiter        CG iteration cap (the while_loop exits early on tol).
    tol            relative residual stop: ‖r‖ ≤ tol·‖b‖ per column.
    n_probes       Hutchinson/SLQ probe vectors R.
    precond_rank   pivoted-Cholesky rank k of the preconditioner (0 = off).
    block          0 → materialize the dense (N, N) matrix once per
                   objective evaluation (fastest for N ≲ 20k);
                   B > 0 → matrix-free row-block matvecs: Gram tiles of
                   shape (B, N) are built on the fly and immediately
                   consumed by the (B, N) @ (N, R) GEMM, so peak memory is
                   O(N·B) and N = 50k dense fits on one chip.
    quad_steps     Lanczos steps kept for the logdet quadrature (t ≤ maxiter;
                   the t×t tridiagonal eigenproblems are negligible).
    jitter         diagonal stabilization added to the noise (PyMC-matched).
    love_rank      Lanczos rank of the LOVE predictive-variance factor
                   (Pleiss et al., "Constant-Time Predictive Distributions
                   for Gaussian Processes", ICML 2018 — the algorithm behind
                   GPyTorch's `fast_pred_var`, which the reference's BoTorch
                   backend runs under, ref gumbi/regression/botorch/GP.py:420).
                   0 falls back to the preconditioner (Nyström) surrogate.
    """

    maxiter: int = 256
    tol: float = 1e-2
    n_probes: int = 8
    precond_rank: int = 32
    block: int = 0
    quad_steps: int = 32
    jitter: float = DEFAULT_JITTER
    love_rank: int = 64
    # Symmetric fused self-Gram matvec: None → follow GUMBI_TPU_SYM_MATVEC
    # (read at TRACE time — the config field is part of every module-level
    # jit's cache key, so setting it explicitly is the reliable way to
    # toggle the kernel after programs have compiled; an env flip alone
    # cannot invalidate cached executables).
    sym_matvec: bool | None = None


def draw_probes(seed: int, n: int, cfg: IterConfig, dtype=jnp.float32):
    """Host-side deterministic probe draws (fixed per fit → deterministic MLL).

    Returns ``(probe_n, probe_k)``: standard normals of shape (n, R) and
    (rank, R). With ``precond_rank == 0`` the (n, R) block is Rademacher
    (±1, the minimum-variance Hutchinson choice); with a preconditioner the
    probes must be z ~ N(0, P) = L a + √D b, so both blocks are Gaussian.
    """
    rng = np.random.default_rng(seed)
    r = cfg.n_probes
    if cfg.precond_rank > 0:
        pn = rng.standard_normal((n, r))
        pk = rng.standard_normal((cfg.precond_rank, r))
    else:
        pn = rng.choice(np.asarray([-1.0, 1.0]), size=(n, r))
        pk = np.zeros((0, r))
    return jnp.asarray(pn, dtype=dtype), jnp.asarray(pk, dtype=dtype)


# ------------------------------------------------------------------
# Matvec builders
# ------------------------------------------------------------------


def _fused_term(spec):
    """The single stationary term eligible for the fused Pallas matvec, or None.

    Eligible = exactly one additive term, a pure stationary kernel (no linear
    component, no coregionalization factors). Masking is NOT a restriction:
    (m mᵀ ∘ K) V = m ∘ (K (m ∘ V)) lets the caller fold the mask outside the
    kernel exactly.
    """
    if len(spec.terms) != 1:
        return None
    t = spec.terms[0]
    from .pallas_kernels import FUSABLE_KERNELS

    if t.kernel in FUSABLE_KERNELS and not t.linear_idx and not t.coregs:
        return t
    return None


def _fused_matvec_args(spec, params, term):
    """(ls, η²) for the fused kernel from the parameter dict."""
    ls = params[f"ls_{term.suffix}"]
    if not spec.ard:
        ls = jnp.broadcast_to(ls, (spec.d_cont,))
    return ls, params[f"η_{term.suffix}"] ** 2


def _masked_gram(spec, params, xc, xk, mask):
    K = gram(spec, params, xc, xk, xc, xk)
    if mask is not None:
        K = K * (mask[:, None] * mask[None, :])
    return K


def _noise_vec(spec, params, xk, jitter, mask, noise_mult, dtype):
    """Full diagonal d with masked rows pinned to 1 (identity rows of A)."""
    d = noise_diag(spec, params, xk, dtype=dtype)
    if noise_mult is not None:
        d = d * noise_mult
    d = d + jitter
    if mask is not None:
        d = mask * d + (1.0 - mask)
    return d


def _make_matvec(spec, cfg, params, xc, xk, d, mask):
    """A·V for A = K_masked + diag(d): fused Pallas kernel (TPU, stationary
    single-term specs), dense, or matrix-free XLA row blocks."""
    n = xc.shape[0]
    if cfg.block > 0:
        from .pallas_kernels import fused_matvec_active, fused_stationary_matvec

        term = _fused_term(spec)
        # f32-only: the kernel computes in f32; an f64 run (x64 parity paths)
        # must keep the XLA matvec rather than silently lose precision.
        if term is not None and xc.dtype == jnp.float32 and fused_matvec_active():
            # Gram tiles are built and consumed inside VMEM — K never touches
            # HBM (ops/pallas_kernels.py; 2.7× the XLA blocked path at 50k).
            # The self-Gram is symmetric, so when the full-array VMEM
            # accumulator fits, the symmetric variant builds each unordered
            # tile once and consumes it twice — halving the VPU tile-build
            # work that bounds the kernel at production probe widths.
            from .pallas_kernels import fused_stationary_matvec_sym, sym_matvec_fits

            ls, eta2 = _fused_matvec_args(spec, params, term)
            if cfg.sym_matvec is not None:
                sym_on = bool(cfg.sym_matvec)
            else:
                sym_on = os.environ.get("GUMBI_TPU_SYM_MATVEC", "1") != "0"

            def matvec(V):
                Vm = V * mask[:, None] if mask is not None else V
                if sym_on and sym_matvec_fits(xc.shape[0], V.shape[1]):
                    out = eta2 * fused_stationary_matvec_sym(xc, Vm, ls, term.kernel)
                else:
                    out = eta2 * fused_stationary_matvec(xc, xc, Vm, ls, term.kernel)
                if mask is not None:
                    out = out * mask[:, None]
                return out + d[:, None] * V

            return matvec

    if cfg.block <= 0:
        Kn = _masked_gram(spec, params, xc, xk, mask)

        def matvec(V):
            return jnp.dot(Kn, V, precision=_HI) + d[:, None] * V

        return matvec

    b = cfg.block
    if n % b != 0:
        raise ValueError(
            f"blocked matvec needs N ({n}) divisible by block ({b}); "
            "bucket-pad the data (mask handles the padding exactly)"
        )
    nb = n // b

    def matvec(V):
        def body(i, out):
            xcb = jax.lax.dynamic_slice_in_dim(xc, i * b, b)
            xkb = jax.lax.dynamic_slice_in_dim(xk, i * b, b)
            Kb = gram(spec, params, xcb, xkb, xc, xk)
            if mask is not None:
                mb = jax.lax.dynamic_slice_in_dim(mask, i * b, b)
                Kb = Kb * (mb[:, None] * mask[None, :])
            yb = jnp.dot(Kb, V, precision=_HI)
            return jax.lax.dynamic_update_slice_in_dim(out, yb, i * b, axis=0)

        out = jax.lax.fori_loop(0, nb, body, jnp.zeros_like(V))
        return out + d[:, None] * V

    return matvec


# ------------------------------------------------------------------
# Preconditioner: rank-k pivoted Cholesky of the kernel + exact noise diag
# ------------------------------------------------------------------


def pivoted_cholesky(row_fn, diag, rank, return_resid=False):
    """Rank-``rank`` pivoted (greedy) Cholesky of an SPD matrix.

    ``row_fn(i)`` returns row i of the matrix (matrix-free: one (1, N) Gram
    strip); ``diag`` is its exact diagonal. Returns L of shape (N, rank) with
    L Lᵀ the best-pivot rank-k approximation (and, with ``return_resid``,
    the final residual diagonal — diag(A − L Lᵀ) up to clamping). O(rank·N·d)
    work — negligible against the CG loop it accelerates.

    Columns stop once the residual diagonal falls below 100·eps·max(diag) —
    a RELATIVE working-precision floor. Below it the residual row
    ``row − L L[i]ᵀ`` is pure cancellation noise, and dividing that noise by
    a ~√eps pivot injects O(1) junk columns that make the preconditioner
    WORSE than none (measured at N=50k f32, smooth kernel: the 1e-12
    absolute guard admitted ~58 junk columns and PCG stalled at rel 4.1 vs
    1.2 unpreconditioned; with the relative guard the factorization stops at
    the f32 numerical rank and the exhausted case short-circuits to the
    exact Woodbury path — see :func:`_iter_forward`).
    """
    n = diag.shape[0]
    L0 = jnp.zeros((n, rank), dtype=diag.dtype)
    thresh = jnp.maximum(
        100.0 * jnp.finfo(diag.dtype).eps * jnp.max(diag), 1e-30
    )

    def body(k, state):
        dres, L = state
        i = jnp.argmax(dres)
        pii = jnp.sqrt(jnp.maximum(dres[i], 1e-30))
        row = row_fn(i)  # (n,)
        # subtract the already-factored part: (L @ L[i])
        li = (row - jnp.dot(L, L[i], precision=_HI)) / pii
        li = li.at[i].set(pii)
        li = jnp.where(dres[i] > thresh, li, jnp.zeros_like(li))
        dres = jnp.maximum(dres - li * li, 0.0).at[i].set(
            jnp.where(dres[i] > thresh, 0.0, dres[i])
        )
        return dres, L.at[:, k].set(li)

    dres, L = jax.lax.fori_loop(0, rank, body, (diag, L0))
    return (L, dres) if return_resid else L


def exhausted_factorization(dres, kdiag, d, mask, n_eff):
    """The two-regime gate: is P = LLᵀ + D an (f32-)exact factorization of A?

    True when the pivoted Cholesky hit the working-precision floor inside
    its rank budget (max residual diagonal ≤ the same 100·eps·max(diag)
    threshold the column guard uses) AND the residual trace bounds the
    log-density error below nat scale (|Δ logp| ≤ tr(A−P)/2λ_min; the
    second clause keeps collapsed-noise basins, where tr/λ_min is huge,
    distrusted). ONE definition shared by the single-device forward, the
    posterior caches, and the distributed engine — the paths must stay
    value-identical (tests/test_parallel.py, the dryrun equality checks).
    """
    d_real = d if mask is None else jnp.where(mask > 0, d, jnp.inf)
    eps = jnp.finfo(d.dtype).eps
    return jnp.logical_and(
        jnp.max(dres) <= 100.0 * eps * jnp.maximum(jnp.max(kdiag), 1e-30),
        jnp.sum(dres) <= 2e-3 * n_eff * jnp.min(d_real),
    )


def _make_precond(L, d):
    """Woodbury apply + logdet for P = L Lᵀ + diag(d).

    P⁻¹v = D⁻¹v − D⁻¹L (I + LᵀD⁻¹L)⁻¹ LᵀD⁻¹v
    log|P| = Σ log d + 2 Σ log diag chol(I + LᵀD⁻¹L)
    """
    k = L.shape[1]
    dinv = 1.0 / d
    DL = L * dinv[:, None]  # D⁻¹L (n, k)
    M = jnp.eye(k, dtype=L.dtype) + jnp.dot(L.T, DL, precision=_HI)
    C = jnp.linalg.cholesky(M)
    logdet_p = jnp.sum(jnp.log(d)) + 2.0 * jnp.sum(jnp.log(jnp.diagonal(C)))

    def psolve(V):
        t = jnp.dot(DL.T, V, precision=_HI)  # (k, R)
        t = jax.scipy.linalg.cho_solve((C, True), t)
        return dinv[:, None] * V - jnp.dot(DL, t, precision=_HI)

    return psolve, logdet_p


# ------------------------------------------------------------------
# LOVE predictive variances: rank-k Lanczos factor of A
# ------------------------------------------------------------------


def lanczos(matvec, b, k):
    """k-step Lanczos of the SPD operator behind ``matvec``, fully
    reorthogonalized (two Gram-Schmidt passes per step — mandatory in f32,
    and what keeps the tridiagonal T = QᵀAQ exactly to rounding).

    Returns ``(Q, diag, off)``: Q (n, k) with orthonormal live columns and
    zero columns after a breakdown (invariant subspace reached), and the
    tridiagonal coefficients of T. Dead steps are padded with diag=1/off=0 —
    an identity block that keeps T positive definite and is invisible to
    any quadratic form through Q (the dead columns are zero).
    """
    n = b.shape[0]
    dt = b.dtype
    bnorm = jnp.sqrt(jnp.sum(b * b))
    q0 = b / jnp.maximum(bnorm, 1e-30)
    Q0 = jnp.zeros((n, k), dt).at[:, 0].set(q0)

    def body(j, state):
        Q, diag, off = state
        q = jax.lax.dynamic_slice_in_dim(Q, j, 1, axis=1)[:, 0]
        live = jnp.sum(q * q) > 0.5  # columns are unit-norm or exactly zero
        w = matvec(q[:, None])[:, 0]
        a = jnp.dot(q, w, precision=_HI)
        diag = diag.at[j].set(jnp.where(live, a, 1.0))
        # full reorthogonalization: projects out q, q_prev, AND accumulated
        # rounding drift against every earlier column (zero cols are inert)
        w = w - Q @ jnp.dot(Q.T, w, precision=_HI)
        w = w - Q @ jnp.dot(Q.T, w, precision=_HI)
        bnext = jnp.sqrt(jnp.sum(w * w))
        tiny = jnp.asarray(1e-7 if dt == jnp.float32 else 1e-12, dt)
        good = jnp.logical_and(live, bnext > tiny * jnp.abs(a))
        off = off.at[j].set(jnp.where(good, bnext, 0.0))
        qn = jnp.where(good, w / jnp.maximum(bnext, 1e-30), jnp.zeros_like(w))
        Q = jax.lax.cond(
            j + 1 < k,
            lambda Q: Q.at[:, jnp.minimum(j + 1, k - 1)].set(qn),
            lambda Q: Q,
            Q,
        )
        return Q, diag, off

    state = (Q0, jnp.zeros((k,), dt), jnp.zeros((k,), dt))
    Q, diag, off = jax.lax.fori_loop(0, k, body, state)
    return Q, diag, off[: k - 1]


def _cholqr2(W, eps_scale):
    """Orthonormalize the tall block W (n, b) by two rounds of
    Cholesky-QR — all GEMM, no Householder (XLA's tall-skinny QR is a
    serial panel recurrence on TPU; CholQR² reaches the same orthogonality
    in f32 for the mildly-conditioned blocks full reorthogonalization
    produces). A trace-scaled jitter keeps the Gram factorizable through a
    rank-deficient block (breakdown: the Krylov space closed early) — the
    affected directions carry ~zero weight after reorthogonalization.
    """

    def one_pass(V):
        G = jnp.dot(V.T, V, precision=_HI)
        jit_ = eps_scale * (jnp.trace(G) / G.shape[0] + 1e-30)
        C = jnp.linalg.cholesky(G + jit_ * jnp.eye(G.shape[0], dtype=V.dtype))
        return jax.scipy.linalg.solve_triangular(C, V.T, lower=True).T

    return one_pass(one_pass(W))


def block_lanczos_basis(matvec, B0, k, block):
    """Orthonormal basis Q (n, k) of the block-Krylov space K(A, B0) and
    the projection AQ, by ``k // block`` fused matvec sweeps.

    The scalar Lanczos pays one full A·v sweep per COLUMN; on TPU the fused
    Gram-matvec's sweep time is flat in the column count up to the 128-lane
    MXU width (benchmarks/probe_fused_matvec.py), so building the same
    rank-k space block-wise costs k/block sweeps — 64× fewer at the default
    block. Full (two-pass) reorthogonalization against all previous columns
    keeps Q orthonormal in f32; T is NOT assembled from the three-term
    recurrence but computed directly as QᵀAQ by the caller, which is exact
    for whatever basis the loop actually produced.
    """
    n = B0.shape[0]
    dt = B0.dtype
    nb = k // block
    eps = 1e-6 if dt == jnp.float32 else 1e-12

    Q = jnp.zeros((n, k), dt)
    AQ = jnp.zeros((n, k), dt)
    Q = jax.lax.dynamic_update_slice_in_dim(Q, _cholqr2(B0, eps), 0, axis=1)

    def body(j, state):
        Q, AQ = state
        Qj = jax.lax.dynamic_slice_in_dim(Q, j * block, block, axis=1)
        Wj = matvec(Qj)
        AQ = jax.lax.dynamic_update_slice_in_dim(AQ, Wj, j * block, axis=1)
        # two-pass full reorthogonalization (not-yet-written columns of Q
        # are zero and inert)
        W = Wj - Q @ jnp.dot(Q.T, Wj, precision=_HI)
        W = W - Q @ jnp.dot(Q.T, W, precision=_HI)
        Qn = _cholqr2(W, eps)
        Q = jax.lax.cond(
            j + 1 < nb,
            lambda Q: jax.lax.dynamic_update_slice_in_dim(
                Q, Qn, (j + 1) * block, axis=1
            ),
            lambda Q: Q,
            Q,
        )
        return Q, AQ

    Q, AQ = jax.lax.fori_loop(0, nb, body, (Q, AQ))
    return Q, AQ


def _love_factor(matvec, b, k, block=64):
    """W (n, k) with W Wᵀ = Q T⁻¹ Qᵀ ≈ A⁻¹ — the LOVE root decomposition.

    The projection bound vᵀQ(QᵀAQ)⁻¹Qᵀv ≤ vᵀA⁻¹v (Schur complement of the
    PSD block matrix [[A, v], [vᵀ, vᵀA⁻¹v]] projected onto range(Q)) holds
    for EVERY v, so variances computed from W are conservative: never
    smaller than the exact posterior variance. The bound needs only an
    orthonormal Q and T = QᵀAQ — any Krylov basis qualifies, which is what
    lets the block path below swap in freely.

    For k ≥ 2·block (the large-N regime) the basis is built block-wise:
    K(A, [b | Ω]) with Ω standard-normal columns (fixed key — the cache is
    deterministic), k/block fused sweeps instead of k. Small k keeps the
    scalar Lanczos (its Krylov space of pure K(A, b) depth k is slightly
    tighter per column when columns are the scarce resource).
    """
    n = b.shape[0]
    # Gate at 4 blocks: measured (CPU oracle, n=640) the block basis matches
    # the scalar Krylov at k ≥ 256 (rel err 1.3e-6 vs 1.1e-6) but trails it
    # at k = 128 (2.8e-2 vs 4.5e-5) — per COLUMN the pure K(A, b) space is
    # tighter, and below ~4 blocks columns are the scarce resource.
    if k >= 4 * block and k % block == 0 and n >= k:
        om = jax.random.normal(jax.random.PRNGKey(7), (n, block - 1), b.dtype)
        B0 = jnp.concatenate([b[:, None], om], axis=1)
        Q, AQ = block_lanczos_basis(matvec, B0, k, block)
        T = jnp.dot(Q.T, AQ, precision=_HI)
        T = 0.5 * (T + T.T)
        eps = 1e-6 if b.dtype == jnp.float32 else 1e-12
        T = T + (eps * jnp.trace(T) / k) * jnp.eye(k, dtype=b.dtype)
        C = jnp.linalg.cholesky(T)
        Wt = jax.scipy.linalg.solve_triangular(C, Q.T, lower=True)
        return Wt.T
    Q, diag, off = lanczos(matvec, b, k)
    T = jnp.diag(diag) + jnp.diag(off, 1) + jnp.diag(off, -1)
    C = jnp.linalg.cholesky(T)
    # W = Q C⁻ᵀ via one (k, n) triangular solve
    Wt = jax.scipy.linalg.solve_triangular(C, Q.T, lower=True)
    return Wt.T


# ------------------------------------------------------------------
# Batched preconditioned CG with Lanczos-coefficient tracking (mBCG)
# ------------------------------------------------------------------


def pcg(matvec, psolve, B, maxiter, tol, track=0, skip=None):
    """Solve A X = B for SPD A, all RHS columns simultaneously.

    Returns (X, alphas, betas, valid, iters, rel_res): the CG step scalars
    α_j, β_j and a validity mask for the first ``track`` iterations of each
    column (the Lanczos tridiagonal of P⁻¹A in the P-inner product is
    recovered from them; Saad, Iterative Methods, §6.7), the iteration
    count, and the worst column's final relative residual ‖r‖/‖b‖ — the
    caller's evidence of whether the solve actually converged (at
    ``maxiter`` exit it may not have, and downstream quantities computed
    from an unconverged solve can be arbitrarily wrong).

    Fixed-shape state in one `lax.while_loop`: converged columns freeze
    (their α is forced to 0 and excluded from `valid`), the loop exits when
    every column is converged or at ``maxiter``.

    ``skip`` (optional traced bool) makes the loop exit before the first
    iteration, returning X = 0 — callers use it when the answer comes from
    an exact factorization instead (the exhausted-preconditioner regime)
    and the O(maxiter · N²) Krylov work would be wasted.
    """
    r_cols = B.shape[1]
    track = int(track) if track else 0
    bnorm = jnp.sqrt(jnp.sum(B * B, axis=0))
    stop = tol * jnp.maximum(bnorm, 1e-30)

    X0 = jnp.zeros_like(B)
    R0 = B
    Z0 = psolve(R0)
    P0 = Z0
    rz0 = jnp.sum(R0 * Z0, axis=0)
    al0 = jnp.zeros((max(track, 1), r_cols), dtype=B.dtype)
    be0 = jnp.zeros((max(track, 1), r_cols), dtype=B.dtype)
    va0 = jnp.zeros((max(track, 1), r_cols), dtype=bool)

    def cond(state):
        i, _, R, *_ = state
        rn = jnp.sqrt(jnp.sum(R * R, axis=0))
        go = jnp.logical_and(i < maxiter, jnp.any(rn > stop))
        if skip is not None:
            go = jnp.logical_and(go, jnp.logical_not(skip))
        return go

    def body(state):
        i, X, R, P, Z, rz, al, be, va = state
        live = jnp.sqrt(jnp.sum(R * R, axis=0)) > stop  # per column
        Ap = matvec(P)
        pAp = jnp.sum(P * Ap, axis=0)
        safe = jnp.logical_and(live, pAp > 0.0)
        alpha = jnp.where(safe, rz / jnp.where(pAp > 0.0, pAp, 1.0), 0.0)
        X = X + alpha[None, :] * P
        R = R - alpha[None, :] * Ap
        Z = psolve(R)
        rz_new = jnp.sum(R * Z, axis=0)
        beta = jnp.where(safe, rz_new / jnp.where(rz > 0.0, rz, 1.0), 0.0)
        P = Z + beta[None, :] * P
        if track:
            j = jnp.minimum(i, track - 1)
            al = jax.lax.cond(
                i < track, lambda a: a.at[j].set(alpha), lambda a: a, al
            )
            be = jax.lax.cond(
                i < track, lambda b_: b_.at[j].set(beta), lambda b_: b_, be
            )
            va = jax.lax.cond(
                i < track, lambda v: v.at[j].set(safe), lambda v: v, va
            )
        return i + 1, X, R, P, Z, rz_new, al, be, va

    state = (0, X0, R0, P0, Z0, rz0, al0, be0, va0)
    i, X, R, P, Z, rz, al, be, va = jax.lax.while_loop(cond, body, state)
    rel_res = jnp.max(jnp.sqrt(jnp.sum(R * R, axis=0)) / jnp.maximum(bnorm, 1e-30))
    return X, al, be, va, i, rel_res


def _tridiag_from_cg(alphas, betas, valid):
    """(t, R) CG scalars → (R, t, t) symmetric Lanczos tridiagonals.

    T_jj = 1/α_j + β_{j-1}/α_{j-1},  T_{j,j+1} = √β_j / α_j. Iterations a
    column never ran (converged early / α guarded to 0) pad the tridiagonal
    with an identity block: block-diagonal padding is invisible to the
    e₁-quadrature (e₁ has no component in the padding block) and keeps
    eigenvalues at 1 → log λ = 0.
    """
    t, r = alphas.shape
    a = jnp.where(valid, alphas, 1.0)
    b = jnp.where(valid, betas, 0.0)
    inv_a = 1.0 / a  # (t, R)
    prev = jnp.concatenate([jnp.zeros((1, r), a.dtype), (b * inv_a)[:-1]], axis=0)
    diag = jnp.where(valid, inv_a + prev, 1.0).T  # (R, t)
    off = jnp.where(valid, jnp.sqrt(jnp.maximum(b, 0.0)) * inv_a, 0.0).T  # (R, t)
    # off-diagonal j couples steps j and j+1: only valid when step j+1 valid
    nxt = jnp.concatenate([valid[1:], jnp.zeros((1, r), bool)], axis=0).T
    off = jnp.where(nxt, off, 0.0)[:, :-1]  # (R, t-1)
    T = jnp.zeros((r, t, t), a.dtype)
    ii = jnp.arange(t)
    T = T.at[:, ii, ii].set(diag)
    jj = jnp.arange(t - 1)
    T = T.at[:, jj, jj + 1].set(off)
    T = T.at[:, jj + 1, jj].set(off)
    return T


def _slq_logdet(alphas, betas, valid, znorm2):
    """Σ-free SLQ: mean_i (zᵢᵀP⁻¹zᵢ) · e₁ᵀ log(Tᵢ) e₁ (Gauss quadrature)."""
    T = _tridiag_from_cg(alphas, betas, valid)
    lam, Q = jnp.linalg.eigh(T)  # (R, t), (R, t, t)
    w = Q[:, 0, :] ** 2  # first-row components
    loglam = jnp.log(jnp.maximum(lam, 1e-30))
    quad = jnp.sum(w * loglam, axis=-1)  # (R,)
    return jnp.mean(znorm2 * quad)


# ------------------------------------------------------------------
# The Gaussian log-density with the surrogate custom VJP
# ------------------------------------------------------------------


def _iter_forward(spec, cfg, params, xc, xk, y, probe_n, probe_k, mask, noise_mult):
    n = xc.shape[0]
    d = _noise_vec(spec, params, xk, cfg.jitter, mask, noise_mult, y.dtype)
    matvec = _make_matvec(spec, cfg, params, xc, xk, d, mask)

    if cfg.precond_rank > 0:
        kdiag = gram_diag(spec, params, xc, xk)
        if mask is not None:
            kdiag = kdiag * mask

        def row_fn(i):
            xci = jax.lax.dynamic_slice_in_dim(xc, i, 1)
            xki = jax.lax.dynamic_slice_in_dim(xk, i, 1)
            row = gram(spec, params, xci, xki, xc, xk)[0]
            if mask is not None:
                row = row * mask[i] * mask
            return row

        L, dres = pivoted_cholesky(row_fn, kdiag, cfg.precond_rank, return_resid=True)
        psolve, logdet_p = _make_precond(L, d)
        # probes z ~ N(0, P): z = L a + √d b
        Z = jnp.dot(L, probe_k, precision=_HI) + jnp.sqrt(d)[:, None] * probe_n
        # EXHAUSTED-FACTORIZATION REGIME (smooth kernels): when the pivoted
        # Cholesky hits the working-precision floor within its rank budget,
        # K = L Lᵀ exactly to f32 and P = L Lᵀ + D IS A — Woodbury solves and
        # log|P| are the exact answer, while CG is structurally UNABLE to
        # certify convergence there: λ_max(K) ≈ N·⟨k⟩ is huge, so the f32
        # matvec noise floor ε·λ_max/λ_min sits ABOVE the relative-residual
        # tolerance and the solve "stalls" on noise (measured at the N=50k
        # campaign's true MAP basin, ls≈1.4: rel plateaus at 0.1-4 at any
        # iteration count or preconditioner truncation).
        n_eff_f = jnp.sum(mask) if mask is not None else jnp.asarray(n, y.dtype)
        exhausted = exhausted_factorization(dres, kdiag, d, mask, n_eff_f)
    else:
        psolve = lambda V: V  # noqa: E731
        logdet_p = jnp.zeros((), y.dtype)
        Z = probe_n
        exhausted = jnp.asarray(False)

    ym = y * mask if mask is not None else y
    B = jnp.concatenate([ym[:, None], Z], axis=1)
    X, al, be, va, iters, rel_res = pcg(
        matvec, psolve, B, cfg.maxiter, cfg.tol, track=cfg.quad_steps,
        skip=exhausted,
    )
    X = jnp.where(exhausted, psolve(B), X)
    alpha, S = X[:, 0], X[:, 1:]
    quad = jnp.sum(ym * alpha)
    W = psolve(Z)
    znorm2 = jnp.sum(Z * W, axis=0)  # zᵀP⁻¹z per probe
    # log|A| = log|P| exactly in the exhausted regime (the SLQ correction is
    # identically zero there — and CG ran no iterations to estimate it from)
    slq = _slq_logdet(al[:, 1:], be[:, 1:], va[:, 1:], znorm2)
    logdet = logdet_p + jnp.where(exhausted, 0.0, slq)
    n_eff = jnp.sum(mask) if mask is not None else jnp.asarray(n, y.dtype)
    logp = -0.5 * (quad + logdet + n_eff * jnp.log(2.0 * jnp.pi))
    # An unconverged solve (maxiter exit with residual above tolerance) makes
    # quad/logdet ARBITRARILY wrong — at degenerate hyperparameters (ls→0,
    # σ→0) the garbage value can be favorable by 1e8 nats and out-shout the
    # prior, walking the optimizer into the singularity (observed). Distrust
    # it outright: −inf here becomes +inf through the NaN→inf objective
    # guard, so line searches reject the step and restarts lose the argmin.
    # The 10× slack keeps borderline solves (SLQ tolerates them) alive; the
    # exhausted regime bypasses the guard — its answer is exact, not Krylov.
    trusted = jnp.logical_or(exhausted, rel_res <= 10.0 * cfg.tol)
    logp = jnp.where(trusted, logp, -jnp.inf)
    return logp, (alpha, S, W, iters)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def iter_gaussian_logp(spec, cfg, params, xc, xk, y, probe_n, probe_k, mask, noise_mult):
    """log N(y | 0, K + D) by preconditioned mBCG + SLQ (see module docstring).

    Deterministic given the probe arrays (draw once per fit with
    :func:`draw_probes`). Gradients w.r.t. ``params`` and ``y`` are the
    Hutchinson-exact surrogate — the Krylov loop is never differentiated.
    """
    logp, _ = _iter_forward(
        spec, cfg, params, xc, xk, y, probe_n, probe_k, mask, noise_mult
    )
    return logp


def _iter_fwd(spec, cfg, params, xc, xk, y, probe_n, probe_k, mask, noise_mult):
    logp, (alpha, S, W, _) = _iter_forward(
        spec, cfg, params, xc, xk, y, probe_n, probe_k, mask, noise_mult
    )
    return logp, (params, xc, xk, alpha, S, W, mask, noise_mult)


def _bilinear_sum(spec, cfg, params, xc, xk, U, V, wts, mask, noise_mult, dtype):
    """Σ_j wts_j · u_jᵀ A(params) v_j — the only θ-differentiated computation.

    Dense mode assembles A once; blocked mode streams Gram tiles under a
    rematerialized scan so the backward pass stays O(N·block) memory.
    """
    d = _noise_vec(spec, params, xk, cfg.jitter, mask, noise_mult, dtype)
    diag_term = jnp.sum(d * jnp.sum(U * (V * wts[None, :]), axis=1))
    if cfg.block <= 0:
        Kn = _masked_gram(spec, params, xc, xk, mask)
        return jnp.sum(U * jnp.dot(Kn, V * wts[None, :], precision=_HI)) + diag_term

    b = cfg.block
    nb = xc.shape[0] // b
    Vw = V * wts[None, :]

    @jax.checkpoint
    def body(acc, i):
        xcb = jax.lax.dynamic_slice_in_dim(xc, i * b, b)
        xkb = jax.lax.dynamic_slice_in_dim(xk, i * b, b)
        Kb = gram(spec, params, xcb, xkb, xc, xk)
        if mask is not None:
            mb = jax.lax.dynamic_slice_in_dim(mask, i * b, b)
            Kb = Kb * (mb[:, None] * mask[None, :])
        Ub = jax.lax.dynamic_slice_in_dim(U, i * b, b)
        return acc + jnp.sum(Ub * jnp.dot(Kb, Vw, precision=_HI)), None

    acc, _ = jax.lax.scan(body, jnp.zeros((), dtype), jnp.arange(nb))
    return acc + diag_term


def _iter_bwd(spec, cfg, res, g):
    params, xc, xk, alpha, S, W, mask, noise_mult = res
    r = S.shape[1]
    # d mll = ½ αᵀ(dA)α − 1/(2R) Σᵢ sᵢᵀ(dA)wᵢ
    U = jnp.concatenate([alpha[:, None], S], axis=1)
    V = jnp.concatenate([alpha[:, None], W], axis=1)
    wts = jnp.concatenate(
        [jnp.full((1,), 0.5, alpha.dtype), jnp.full((r,), -0.5 / r, alpha.dtype)]
    )

    def surrogate(p):
        return _bilinear_sum(spec, cfg, p, xc, xk, U, V, wts, mask, noise_mult, alpha.dtype)

    p_bar = jax.tree_util.tree_map(lambda t: g * t, jax.grad(surrogate)(params))
    y_bar = -g * alpha  # d mll / dy = −A⁻¹y (zero on masked rows already)
    return (
        p_bar,
        jnp.zeros_like(xc),
        jnp.zeros_like(xk),
        y_bar,
        jnp.zeros((xc.shape[0], r), alpha.dtype),
        jnp.zeros((cfg.precond_rank if cfg.precond_rank > 0 else 0, r), alpha.dtype),
        None if mask is None else jnp.zeros_like(mask),
        None if noise_mult is None else jnp.zeros_like(noise_mult),
    )


iter_gaussian_logp.defvjp(_iter_fwd, _iter_bwd)


def iter_map_neg_logp(
    spec, uparams, xc, xk, y, ls_alpha, ls_beta, probe_n, probe_k,
    cfg: IterConfig, mask=None, noise_mult=None,
):
    """−[log p(y|θ) + log p(θ)] with the iterative likelihood (MAP objective).

    Drop-in analogue of :func:`ops.mll.map_neg_logp` for the large-N regime;
    same priors, same NaN→+inf guard for line searches.
    """
    params = constrain(uparams)
    data_logp = iter_gaussian_logp(
        spec, cfg, params, xc, xk, y, probe_n, probe_k, mask, noise_mult
    )
    total = data_logp + log_prior(spec, uparams, ls_alpha, ls_beta)
    return jnp.where(jnp.isfinite(total), -total, jnp.inf)


@partial(jax.jit, static_argnums=(0, 1))
def iter_map_value_and_grad(spec, cfg, uparams, xc, xk, y, ls_alpha, ls_beta,
                            probe_n, probe_k, mask=None):
    """Module-level jitted value+grad of :func:`iter_map_neg_logp`.

    The staged polish dispatches through this (not a per-fit closure) so
    repeated fits at the same shapes — lab loops, cross-validation — reuse
    the traced executable (the `fit_kron_map` rationale; a fresh closure per
    fit retraces and, on the remote TPU service, re-loads the program).
    """

    def f(u):
        return iter_map_neg_logp(
            spec, u, xc, xk, y, ls_alpha, ls_beta, probe_n, probe_k, cfg,
            mask=mask,
        )

    return jax.value_and_grad(f)(uparams)


@partial(jax.jit, static_argnums=(0, 1))
def iter_map_value(spec, cfg, uparams, xc, xk, y, ls_alpha, ls_beta,
                   probe_n, probe_k, mask=None):
    """Module-level jitted value of :func:`iter_map_neg_logp` (see
    :func:`iter_map_value_and_grad`)."""
    return iter_map_neg_logp(
        spec, uparams, xc, xk, y, ls_alpha, ls_beta, probe_n, probe_k, cfg,
        mask=mask,
    )


@partial(jax.jit, static_argnums=(0, 1))
def iter_cache_build(spec, cfg, params, xc, xk, y, mask=None):
    """Module-level jitted :func:`iter_posterior_cache` (same reuse
    rationale as :func:`iter_map_value_and_grad`)."""
    return iter_posterior_cache(spec, cfg, params, xc, xk, y, mask=mask)


@partial(jax.jit, static_argnums=(0, 1), static_argnames=("with_noise", "chunk"))
def iter_predict_diag_jit(spec, cfg, params, cache, xc, xk, xc_star, xk_star,
                          with_noise=True, mask=None, chunk=2048):
    """Module-level jitted :func:`iter_predict_diag`.

    The eager form re-builds the fused Pallas cross-Gram per call (a fresh
    kernel callable defeats every cache level — measured: a repeat 10k-grid
    predict at N=50k paid the full ~29 s again); under one traced program
    the kernel is cached by shapes and repeat predictions are pure compute.
    """
    return iter_predict_diag(
        spec, cfg, params, cache, xc, xk, xc_star, xk_star,
        with_noise=with_noise, mask=mask, chunk=chunk,
    )


@partial(jax.jit, static_argnums=(0, 1), static_argnames=("maxiter", "tol"))
def fit_iter_map(spec, cfg, xc, xk, y, ls_alpha, ls_beta, probe_n, probe_k,
                 u0s, mask=None, maxiter=250, tol=1e-6):
    """Multi-restart MAP fit on the iterative objective, module-level jitted
    (the non-staged small-N path; same reuse rationale as
    :func:`iter_map_value_and_grad`)."""
    from .optimize import multi_restart_minimize

    def objective(u):
        return iter_map_neg_logp(
            spec, u, xc, xk, y, ls_alpha, ls_beta, probe_n, probe_k, cfg,
            mask=mask,
        )

    return multi_restart_minimize(objective, u0s, maxiter=maxiter, tol=tol)


def iter_posterior_cache(spec, cfg, params, xc, xk, y, mask=None, noise_mult=None):
    """Array-only posterior state for iterative prediction.

    One PCG solve for α = A⁻¹y, the preconditioner factor L, and (when
    ``cfg.love_rank > 0``) the rank-k LOVE factor W with W Wᵀ ≈ A⁻¹ for
    predictive variances. Returned as a dict of plain arrays
    (pytree-friendly, checkpointable): {alpha, L, d[, W]}. Requires
    ``cfg.precond_rank > 0`` — the low-rank factor accelerates the solve and
    is the variance fallback when LOVE is off (see :func:`iter_predict_diag`).
    """
    if cfg.precond_rank <= 0:
        raise ValueError("iter_posterior_cache needs precond_rank > 0")
    d = _noise_vec(spec, params, xk, cfg.jitter, mask, noise_mult, y.dtype)
    matvec = _make_matvec(spec, cfg, params, xc, xk, d, mask)
    kdiag = gram_diag(spec, params, xc, xk)
    if mask is not None:
        kdiag = kdiag * mask

    def row_fn(i):
        xci = jax.lax.dynamic_slice_in_dim(xc, i, 1)
        xki = jax.lax.dynamic_slice_in_dim(xk, i, 1)
        row = gram(spec, params, xci, xki, xc, xk)[0]
        if mask is not None:
            row = row * mask[i] * mask
        return row

    L, dres = pivoted_cholesky(row_fn, kdiag, cfg.precond_rank, return_resid=True)
    psolve, _ = _make_precond(L, d)
    ym = y * mask if mask is not None else y
    # exhausted factorization → exact Woodbury solve, CG skipped (the same
    # two-regime rule as _iter_forward; one shared criterion)
    n_eff_f = jnp.sum(mask) if mask is not None else jnp.asarray(xc.shape[0], y.dtype)
    exhausted = exhausted_factorization(dres, kdiag, d, mask, n_eff_f)
    X, *_ = pcg(matvec, psolve, ym[:, None], cfg.maxiter, cfg.tol, skip=exhausted)
    X = jnp.where(exhausted, psolve(ym[:, None]), X)
    alpha = X[:, 0]
    if mask is not None:
        alpha = alpha * mask
    cache = {"alpha": alpha, "L": L, "d": d}
    if cfg.love_rank > 0:
        # Krylov(A, y) — the data vector is a generic start whose Krylov
        # space tracks A's dominant eigenspace; masked rows of ym are zero
        # and A acts identically on them, so the space (and every Lanczos
        # vector) stays inside the unmasked subspace.
        k = min(int(cfg.love_rank), int(xc.shape[0]))
        cache["W"] = _love_factor(matvec, ym, k)
    return cache


def iter_predict_diag(
    spec, cfg, params, cache, xc, xk, xc_star, xk_star, with_noise=True,
    mask=None, chunk=2048,
):
    """(mean, var) at test points from an :func:`iter_posterior_cache`.

    mean = K(*,X) α is exact to the PCG tolerance. The variance is
    var = k** − ‖Wᵀ k*‖² with the rank-k LOVE factor W Wᵀ = Q T⁻¹ Qᵀ
    (Pleiss et al. 2018 — GPyTorch's `fast_pred_var`, which the reference's
    BoTorch backend runs under). The projection bound makes it
    CONSERVATIVE for every test point: k*ᵀ W Wᵀ k* ≤ k*ᵀ A⁻¹ k*, so the
    reported variance is never below the exact posterior variance, and it
    converges to exact as the rank approaches A's effective rank (tests pin
    it against the Cholesky posterior).

    Caches without a LOVE factor (``cfg.love_rank == 0``) fall back to the
    preconditioner surrogate var = k** − k*ᵀ P⁻¹ k*, P = LLᵀ + D — a
    Nyström-style variance whose pivots are the greedy pivoted-Cholesky
    choices. Near-exact when CG converges in a few iterations (P ≈ A, the
    regime `bench_iterative50k.py` reports via `cg_iters`), but
    ANTI-conservative for the truncated spectrum: A ⪰ P ⟹ P⁻¹ ⪰ A⁻¹, so it
    can under-report variance — which is why LOVE is the default.
    """
    alpha, L, d = cache["alpha"], cache["L"], cache["d"]
    W_love = cache.get("W")
    if W_love is None:
        psolve, _ = _make_precond(L, d)
    else:
        psolve = None

    from .pallas_kernels import fused_matvec_active, fused_stationary_matvec

    term = _fused_term(spec)
    if (
        term is not None
        and alpha.dtype == jnp.float32
        and fused_matvec_active()
        and W_love is not None
    ):
        # One fused cross-Gram matvec against [α | W_love]: K(*,X) never
        # materializes, the chunk loop disappears.
        ls, eta2 = _fused_matvec_args(spec, params, term)
        am = alpha * mask if mask is not None else alpha
        Wm = W_love * mask[:, None] if mask is not None else W_love
        V = jnp.concatenate([am[:, None], Wm], axis=1)
        out = eta2 * fused_stationary_matvec(xc_star, xc, V, ls, term.kernel)
        mean = out[:, 0]
        qform = jnp.sum(out[:, 1:] * out[:, 1:], axis=1)
        kd = gram_diag(spec, params, xc_star, xk_star)
        var = jnp.maximum(kd - qform, 0.0)
        if with_noise:
            var = var + noise_diag(spec, params, xk_star, n=xc_star.shape[0], dtype=alpha.dtype)
        return mean, var

    m = xc_star.shape[0]
    pad = (-m) % chunk
    xcp = jnp.concatenate([xc_star, jnp.zeros((pad,) + xc_star.shape[1:], xc_star.dtype)])
    xkp = jnp.concatenate([xk_star, jnp.zeros((pad,) + xk_star.shape[1:], xk_star.dtype)])
    nb = (m + pad) // chunk

    def body(i, out):
        mean_o, var_o = out
        xcb = jax.lax.dynamic_slice_in_dim(xcp, i * chunk, chunk)
        xkb = jax.lax.dynamic_slice_in_dim(xkp, i * chunk, chunk)
        Ks = gram(spec, params, xcb, xkb, xc, xk)  # (chunk, N)
        if mask is not None:
            Ks = Ks * mask[None, :]
        mu = jnp.dot(Ks, alpha, precision=_HI)
        kd = gram_diag(spec, params, xcb, xkb)
        if W_love is not None:
            proj = jnp.dot(Ks, W_love, precision=_HI)  # (chunk, k)
            qform = jnp.sum(proj * proj, axis=1)
        else:
            V = psolve(Ks.T)  # (N, chunk)
            qform = jnp.sum(Ks * V.T, axis=1)
        var = jnp.maximum(kd - qform, 0.0)
        mean_o = jax.lax.dynamic_update_slice_in_dim(mean_o, mu, i * chunk, axis=0)
        var_o = jax.lax.dynamic_update_slice_in_dim(var_o, var, i * chunk, axis=0)
        return mean_o, var_o

    zeros = jnp.zeros((m + pad,), alpha.dtype)
    mean, var = jax.lax.fori_loop(0, nb, body, (zeros, zeros))
    mean, var = mean[:m], var[:m]
    if with_noise:
        var = var + noise_diag(spec, params, xk_star, n=m, dtype=alpha.dtype)
    return mean, var


def iter_predict_mean(
    spec, cfg, params, xc, xk, y, xc_star, xk_star, mask=None, noise_mult=None,
    star_block=4096,
):
    """Posterior mean at test points: K(*,X) A⁻¹y with one PCG solve.

    The N-dim solve is the same PCG as the training objective; the cross-Gram
    is streamed in test-point blocks so memory stays O(max(N, M)·block).
    (Posterior variances at this scale need a Lanczos variance estimator —
    LOVE — which is out of scope; use the Cholesky/FITC paths for variance.)
    """
    d = _noise_vec(spec, params, xk, cfg.jitter, mask, noise_mult, y.dtype)
    matvec = _make_matvec(spec, cfg, params, xc, xk, d, mask)
    if cfg.precond_rank > 0:
        kdiag = gram_diag(spec, params, xc, xk)
        if mask is not None:
            kdiag = kdiag * mask

        def row_fn(i):
            xci = jax.lax.dynamic_slice_in_dim(xc, i, 1)
            xki = jax.lax.dynamic_slice_in_dim(xk, i, 1)
            row = gram(spec, params, xci, xki, xc, xk)[0]
            if mask is not None:
                row = row * mask[i] * mask
            return row

        L, dres = pivoted_cholesky(row_fn, kdiag, cfg.precond_rank, return_resid=True)
        psolve, _ = _make_precond(L, d)
        n_eff_f = jnp.sum(mask) if mask is not None else jnp.asarray(xc.shape[0], y.dtype)
        exhausted = exhausted_factorization(dres, kdiag, d, mask, n_eff_f)
    else:
        psolve = lambda V: V  # noqa: E731
        exhausted = jnp.asarray(False)
    ym = y * mask if mask is not None else y
    # same two-regime rule as _iter_forward: in the exhausted regime the
    # Woodbury solve IS the answer and CG would stall on matvec noise
    X, *_ = pcg(matvec, psolve, ym[:, None], cfg.maxiter, cfg.tol, skip=exhausted)
    X = jnp.where(exhausted, psolve(ym[:, None]), X)
    alpha = X[:, 0]
    if mask is not None:
        alpha = alpha * mask

    from .pallas_kernels import fused_matvec_active, fused_stationary_matvec

    term = _fused_term(spec)
    if term is not None and alpha.dtype == jnp.float32 and fused_matvec_active():
        ls, eta2 = _fused_matvec_args(spec, params, term)
        out = eta2 * fused_stationary_matvec(xc_star, xc, alpha[:, None], ls, term.kernel)
        return out[:, 0]

    m = xc_star.shape[0]
    if m <= star_block:
        Ks = gram(spec, params, xc_star, xk_star, xc, xk)
        if mask is not None:
            Ks = Ks * mask[None, :]
        return jnp.dot(Ks, alpha, precision=_HI)

    pad = (-m) % star_block
    xcp = jnp.concatenate([xc_star, jnp.zeros((pad,) + xc_star.shape[1:], xc_star.dtype)])
    xkp = jnp.concatenate([xk_star, jnp.zeros((pad,) + xk_star.shape[1:], xk_star.dtype)])
    nb = (m + pad) // star_block

    def body(i, out):
        xcb = jax.lax.dynamic_slice_in_dim(xcp, i * star_block, star_block)
        xkb = jax.lax.dynamic_slice_in_dim(xkp, i * star_block, star_block)
        Kb = gram(spec, params, xcb, xkb, xc, xk)
        if mask is not None:
            Kb = Kb * mask[None, :]
        mb = jnp.dot(Kb, alpha, precision=_HI)
        return jax.lax.dynamic_update_slice_in_dim(out, mb, i * star_block, axis=0)

    out = jax.lax.fori_loop(0, nb, body, jnp.zeros((m + pad,), y.dtype))
    return out[:m]
