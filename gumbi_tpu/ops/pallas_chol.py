"""Pallas TPU blocked Cholesky — the scoped hot-path kernel (SURVEY §7).

Right-looking blocked factorization of a batched SPD matrix (D, N, N) f32:

    per panel k:  factor the (b, b) diagonal block in VMEM (two-level:
                  128-wide micro-panels factored by a sequential column
                  sweep, MXU rank-128 updates between them), invert it,
                  then for each row strip i > k compute
                  L_ik = A_ik · L_kk⁻ᵀ (MXU) and apply the trailing update
                  A_i,(k+1..i) −= L_ik · panel(k+1..i)ᵀ as ONE GEMM per
                  strip against the in-VMEM panel cache.

Layout: the output ref doubles as the workspace (step k>0 reads the trailing
matrix its predecessor wrote), so HBM traffic is the O(N³/b) trailing-update
stream — panels stay resident in VMEM ((N, b) cache ≈ 5 MB at b=256,
N=5120). Only the lower triangle is written; callers that need a clean
upper triangle apply ``jnp.tril``.

The kernel exists because XLA's TPU `cholesky` runs at ~8 TFLOP/s vs the
61.5 TFLOP/s GEMM roofline (benchmarks/probe_chol.py), and JAX-level blocked
reformulations do not survive composition into larger programs
(benchmarks/probe_fwd_chol.py). Whether it *beats* XLA in context is a
measured decision — see benchmarks/probe_pallas_chol.py; use is opt-in via
:func:`cholesky` until it wins.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cholesky", "pallas_cholesky"]

BLOCK = 256  # panel width b
MICRO = 128  # micro-panel width inside the (b, b) diagonal factorization


def _micro_chol(a):
    """Unblocked lower Cholesky of a (MICRO, MICRO) value via a sequential
    column sweep (the irreducible recurrence). Mosaic cannot dynamic-slice
    register values, so all row/column selection is mask-based."""
    m = a.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)

    def step(j, acc):
        piv = jnp.sqrt(jnp.sum(jnp.where((rows == j) & (cols == j), acc, 0.0)))
        colj = jnp.sum(jnp.where(cols == j, acc, 0.0), axis=1)  # (m,)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
        col = jnp.where(ridx >= j, colj / piv, 0.0)
        acc = jnp.where(cols == j, col[:, None], acc)
        upd = col[:, None] * col[None, :]
        acc = jnp.where(cols > j, acc - upd, acc)
        return acc

    out = jax.lax.fori_loop(0, m, step, a)
    return jnp.where(rows >= cols, out, 0.0)


def _micro_tri_inv(L):
    """Inverse of a lower-triangular (MICRO, MICRO) value by forward
    substitution, mask-based row selection (no dynamic slicing)."""
    m = L.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    eye = jnp.where(rows == cols, 1.0, 0.0).astype(L.dtype)

    def step(j, acc):
        # row j of L, zeroed at cols ≥ j
        lrow = jnp.sum(jnp.where((rows == j) & (cols < j), L, 0.0), axis=0)  # (m,)
        prod = jax.lax.dot_general(
            lrow.reshape(1, m), acc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0]
        Ljj = jnp.sum(jnp.where((rows == j) & (cols == j), L, 0.0))
        cidx = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
        eye_j = jnp.where(cidx == j, 1.0, 0.0)
        new_row = (eye_j - prod) / Ljj
        return jnp.where(rows == j, new_row[None, :], acc)

    return jax.lax.fori_loop(0, m, step, jnp.zeros_like(L))


def _mmT(x, y):
    return jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _mm(x, y):
    return jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _factor_block(akk):
    """(BLOCK, BLOCK) lower Cholesky + inverse from two MICRO panels.

    Mosaic supports neither scatter nor dynamic_update_slice on register
    values, so the block is assembled by concatenation (BLOCK = 2·MICRO is
    hard-wired; static slices of values lower fine).
    """
    assert BLOCK == 2 * MICRO
    m = MICRO
    a11 = akk[:m, :m]
    a21 = akk[m:, :m]
    a22 = akk[m:, m:]
    L11 = _micro_chol(a11)
    W11 = _micro_tri_inv(L11)
    L21 = _mmT(a21, W11)  # a21 @ W11ᵀ
    L22 = _micro_chol(a22 - _mmT(L21, L21))
    W22 = _micro_tri_inv(L22)
    W21 = -_mm(W22, _mm(L21, W11))
    z = jnp.zeros((m, m), dtype=akk.dtype)
    L = jnp.concatenate(
        [jnp.concatenate([L11, z], axis=1), jnp.concatenate([L21, L22], axis=1)],
        axis=0,
    )
    W = jnp.concatenate(
        [jnp.concatenate([W11, z], axis=1), jnp.concatenate([W21, W22], axis=1)],
        axis=0,
    )
    return L, W


def _chol_kernel(nb, a_ref, l_ref, panel, strip, akk, sem):
    """One batch element; ``nb`` static panel count. a_ref/l_ref in ANY."""
    d = pl.program_id(0)
    b = BLOCK

    def copy(src, dst):
        dma = pltpu.make_async_copy(src, dst, sem)
        dma.start()
        dma.wait()

    for k in range(nb):
        src = a_ref if k == 0 else l_ref
        # --- diagonal block ---
        copy(src.at[d, pl.ds(k * b, b), pl.ds(k * b, b)], akk)
        Lkk, Wk = _factor_block(akk[:, :])
        akk[:, :] = Lkk
        copy(akk, l_ref.at[d, pl.ds(k * b, b), pl.ds(k * b, b)])
        # stash Wk in the panel cache rows of block k (reused immediately)
        panel[pl.ds(k * b, b), :] = Wk

        # --- row strips i > k: column block + one trailing GEMM each ---
        for i in range(k + 1, nb):
            width = (i - k) * b  # trailing cols (k+1..i)*b, static per (k, i)
            copy(src.at[d, pl.ds(i * b, b), pl.ds(k * b, width + b)], strip.at[:, pl.ds(0, width + b)])
            Aik = strip[:, :b]
            Wk_now = panel[pl.ds(k * b, b), :]
            Lik = jax.lax.dot_general(
                Aik, Wk_now, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            panel[pl.ds(i * b, b), :] = Lik
            strip[:, :b] = Lik
            if width > 0:
                # A_i,(k+1..i) −= Lik @ panel[(k+1..i)]ᵀ
                pan = panel[pl.ds((k + 1) * b, width), :]
                upd = jax.lax.dot_general(
                    Lik, pan, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                strip[:, pl.ds(b, width)] = strip[:, pl.ds(b, width)] - upd
            copy(strip.at[:, pl.ds(0, width + b)], l_ref.at[d, pl.ds(i * b, b), pl.ds(k * b, width + b)])


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_cholesky(A, interpret=False):
    """Lower Cholesky factor of batched SPD ``A`` (D, N, N) f32 via the
    Pallas blocked kernel. N must be a multiple of BLOCK. Only the lower
    triangle of the result is meaningful (apply ``jnp.tril`` if needed)."""
    D, n, _ = A.shape
    assert n % BLOCK == 0, f"N={n} must be a multiple of {BLOCK}"
    nb = n // BLOCK
    kernel = functools.partial(_chol_kernel, nb)
    return pl.pallas_call(
        kernel,
        grid=(D,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((D, n, n), A.dtype),
        scratch_shapes=[
            pltpu.VMEM((n, BLOCK), jnp.float32),        # panel cache (+Wk stash)
            pltpu.VMEM((BLOCK, n), jnp.float32),        # row strip
            pltpu.VMEM((BLOCK, BLOCK), jnp.float32),    # diagonal block
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(A)


def cholesky(A, interpret=False):
    """Batched lower Cholesky: Pallas kernel when eligible, XLA otherwise."""
    if A.ndim == 3 and A.dtype == jnp.float32 and A.shape[-1] % BLOCK == 0:
        return jnp.tril(pallas_cholesky(A, interpret=interpret))
    return jnp.linalg.cholesky(A)
