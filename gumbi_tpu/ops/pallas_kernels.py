"""Pallas TPU kernels for the GP hot paths.

``rbf_gram``: fused tiled RBF Gram assembly. One kernel computes
scaled squared distances and the exponential per (bm, bn) tile entirely in
VMEM, writing K to HBM exactly once — no N×N intermediate round-trips. The
distance cross-term runs on the MXU via a split-bfloat16 product
(hi/lo decomposition, 3 passes ≈ f32 accuracy at ~2× the rate of the 6-pass
f32 path). A custom VJP recomputes nothing: the saved output K and a handful
of XLA matmuls give exact cotangents for inputs, lengthscales, and amplitude.

Use is gated: the engine falls back to plain XLA (gumbi_tpu/ops/kernels.py)
on CPU, for non-RBF kernels, or when tile alignment does not pay off.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["rbf_gram", "pallas_available"]


def pallas_available() -> bool:
    """True when running on a TPU backend with Pallas support."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _ceil_to(x, m):
    return (x + m - 1) // m * m


def _rbf_kernel_body(a_ref, b_ref, eta2_ref, out_ref):
    """One (bm, bn) tile: K = η²·exp(-0.5·‖a_i − b_j‖²), inputs pre-scaled by ls.

    The cross term a·bᵀ uses a hi/lo bfloat16 split: a = hi(a) + lo(a) with
    hi = bf16(a); three bf16 MXU passes recover ~f32 accuracy.
    """
    a = a_ref[:]  # (bm, d)
    b = b_ref[:]  # (bn, d)

    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    b_lo = b - b_hi

    def mm(x, y):
        return jax.lax.dot_general(
            x,
            y,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    cross = mm(a_hi, b_hi) + mm(a_hi, b_lo) + mm(a_lo, b_hi)

    a2 = jnp.sum(a * a, axis=1, keepdims=True)  # (bm, 1)
    b2 = jnp.sum(b * b, axis=1, keepdims=True).T  # (1, bn)
    sq = jnp.maximum(a2 + b2 - 2.0 * cross, 0.0)
    out_ref[:] = eta2_ref[0, 0] * jnp.exp(-0.5 * sq)


@partial(jax.custom_vjp, nondiff_argnums=())
def rbf_gram(x1, x2, ls, eta):
    """η²·exp(−½ Σ_d ((x1−x2)/ls)²) as a fused Pallas kernel (f32)."""
    return _rbf_gram_fwd_impl(x1, x2, ls, eta)


def _rbf_gram_fwd_impl(x1, x2, ls, eta):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = x1.shape
    m = x2.shape[0]
    bm, bn = (512, 512) if max(n, m) >= 4096 else (256, 256)
    n_pad = _ceil_to(max(n, 8), bm)
    m_pad = _ceil_to(max(m, 8), bn)
    d_pad = _ceil_to(d, 128)

    ls_b = jnp.broadcast_to(ls, (d,)).astype(jnp.float32)
    # Pre-scale and pad with a sentinel far point so padded rows can't create
    # spurious correlations (they're sliced away anyway).
    a = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :d].set(x1.astype(jnp.float32) / ls_b)
    b = jnp.zeros((m_pad, d_pad), jnp.float32).at[:m, :d].set(x2.astype(jnp.float32) / ls_b)
    eta2 = jnp.asarray(eta, jnp.float32).reshape(1, 1) ** 2

    grid = (n_pad // bm, m_pad // bn)
    out = pl.pallas_call(
        _rbf_kernel_body,
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, d_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, d_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * d_pad + 4 * n_pad * m_pad,
            bytes_accessed=4 * (n_pad * d_pad + m_pad * d_pad + n_pad * m_pad),
            transcendentals=n_pad * m_pad,
        ),
    )(a, b, eta2)
    return out[:n, :m].astype(x1.dtype)


def _rbf_gram_fwd(x1, x2, ls, eta):
    K = _rbf_gram_fwd_impl(x1, x2, ls, eta)
    return K, (x1, x2, ls, eta, K)


def _rbf_gram_bwd(res, gbar):
    """Exact cotangents from the saved output.

    With G = ḡ ∘ K (elementwise):
      dη  = (2/η)·ΣG
      dls_d = (Σ_i x1²_id·rs_i + Σ_j x2²_jd·cs_j − 2·x1_dᵀ G x2_d) / ls_d³
      dx1 = −(x1 ∘ rs[:,None] − G @ x2) / ls²
      dx2 = −(x2 ∘ cs[:,None] − Gᵀ @ x1) / ls²
    where rs/cs are row/column sums of G.
    """
    x1, x2, ls, eta, K = res
    ls_b = jnp.broadcast_to(ls, (x1.shape[1],)).astype(K.dtype)
    G = gbar * K
    rs = jnp.sum(G, axis=1)
    cs = jnp.sum(G, axis=0)

    d_eta = 2.0 / eta * jnp.sum(G)

    x1l = x1 / ls_b
    x2l = x2 / ls_b
    Gx2 = G @ x2l  # (n, d)
    Gtx1 = G.T @ x1l  # (m, d)

    d_ls_full = (
        jnp.sum(x1l**2 * rs[:, None], axis=0)
        + jnp.sum(x2l**2 * cs[:, None], axis=0)
        - 2.0 * jnp.sum(x1l * Gx2, axis=0)
    ) / ls_b
    d_ls = d_ls_full if jnp.shape(ls) == d_ls_full.shape else jnp.sum(d_ls_full, keepdims=True)

    d_x1 = -(x1l * rs[:, None] - Gx2) / ls_b
    d_x2 = -(x2l * cs[:, None] - Gtx1) / ls_b
    return (
        d_x1.astype(x1.dtype),
        d_x2.astype(x2.dtype),
        jnp.asarray(d_ls, dtype=jnp.asarray(ls).dtype).reshape(jnp.shape(ls)),
        jnp.asarray(d_eta, dtype=jnp.asarray(eta).dtype),
    )


rbf_gram.defvjp(_rbf_gram_fwd, _rbf_gram_bwd)
