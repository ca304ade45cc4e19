"""Pallas TPU kernels for the GP hot paths.

``rbf_gram``: fused tiled RBF Gram assembly. One kernel computes EXACT f32
scaled squared distances (elementwise over the small coordinate dimension —
no matmul-identity cancellation, no bf16 quantization) and the exponential
per (bm, bn) tile entirely in VMEM, writing K to HBM exactly once — no N×N
intermediate round-trips. Default-ON under TPU since round 4: the r2/r3
split-bf16 variant shifted the composed MLL by 155 nats at N=5120 and
shipped opt-in; the exact form matches the XLA HIGHEST path. A custom VJP
recomputes nothing: the saved output K and a handful of XLA matmuls give
exact cotangents for inputs, lengthscales, and amplitude.

``fused_stationary_matvec``: the iterative (mBCG) engine's roofline unit —
K @ V without EVER materializing K to HBM. Each (bm, bn) Gram tile is built
in VMEM from EXACT f32 elementwise squared distances (no matmul-identity
cancellation, no bf16 quantization of coordinates), pushed through the
stationary kernel on the VPU, and immediately consumed by the MXU against
the co-resident V block via the same 3-pass hi/lo split; the (bm, R) output
block accumulates in VMEM across the inner grid axis. Tile time is flat in
R up to the 128-lane MXU width (probe: 17.5 ms at R=9 → 16.4 ms at R=65 for
N=50k on v5e), so wide probe blocks are free — 2.8× the materialize-then-GEMM
XLA path at equal accuracy (rel err 4.5e-6 vs an f64 oracle; XLA HIGHEST is
2.2e-6). Measurements: benchmarks/probe_fused_matvec.py.

Use is gated: the engine falls back to plain XLA (gumbi_tpu/ops/kernels.py)
on CPU, for non-stationary/composite kernels, or when tile alignment does
not pay off.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "rbf_gram",
    "pallas_available",
    "fused_stationary_matvec",
    "fused_stationary_matvec_sym",
    "fused_matvec_active",
    "FUSABLE_KERNELS",
]


def pallas_available() -> bool:
    """True when running on a TPU backend with Pallas support."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _ceil_to(x, m):
    return (x + m - 1) // m * m


def _rbf_kernel_body(a_ref, b_ref, eta2_ref, out_ref, *, d):
    """One (bm, bn) tile: K = η²·exp(-0.5·‖a_i − b_j‖²), inputs pre-scaled by ls.

    Distances are EXACT f32: an elementwise loop over the (static, small)
    coordinate dimension on the VPU — no a·bᵀ matmul-identity cancellation,
    no bf16 quantization. (The r2/r3 split-bf16 cross-term shifted the
    composed MLL by 155 nats at N=5120, which kept the kernel opt-in; the
    exact form matches the XLA HIGHEST path to f32 rounding and ships
    default-on. For the small d of a GP's continuous dims the elementwise
    loop is also *cheaper* than the tile matmul it replaced.)
    """
    a = a_ref[:]  # (bm, d_pad)
    b = b_ref[:]  # (bn, d_pad)
    sq = jnp.zeros((a.shape[0], b.shape[0]), jnp.float32)
    for k in range(d):
        diff = a[:, k : k + 1] - b[:, k : k + 1].T
        sq = sq + diff * diff
    out_ref[:] = eta2_ref[0, 0] * jnp.exp(-0.5 * sq)


@partial(jax.custom_vjp, nondiff_argnums=())
def rbf_gram(x1, x2, ls, eta):
    """η²·exp(−½ Σ_d ((x1−x2)/ls)²) as a fused Pallas kernel (f32, exact)."""
    return _rbf_gram_fwd_impl(x1, x2, ls, eta)


def _rbf_gram_fwd_impl(x1, x2, ls, eta, interpret=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n, d = x1.shape
    m = x2.shape[0]
    bm, bn = (512, 512) if max(n, m) >= 4096 else (256, 256)
    n_pad = _ceil_to(max(n, 8), bm)
    m_pad = _ceil_to(max(m, 8), bn)
    d_pad = _ceil_to(d, 128)

    ls_b = jnp.broadcast_to(ls, (d,)).astype(jnp.float32)
    a = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :d].set(x1.astype(jnp.float32) / ls_b)
    b = jnp.zeros((m_pad, d_pad), jnp.float32).at[:m, :d].set(x2.astype(jnp.float32) / ls_b)
    eta2 = jnp.asarray(eta, jnp.float32).reshape(1, 1) ** 2

    grid = (n_pad // bm, m_pad // bn)
    # Traced in a 32-bit scope: under the library's x64 default, Pallas index
    # maps emit i64 constants Mosaic cannot legalize (operands are all f32).
    with jax.enable_x64(False):
        out = pl.pallas_call(
            partial(_rbf_kernel_body, d=d),
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
                flops=3 * n_pad * m_pad * d + 2 * n_pad * m_pad,
                bytes_accessed=4 * (n_pad * d_pad + m_pad * d_pad + n_pad * m_pad),
                transcendentals=n_pad * m_pad,
            ),
            interpret=interpret,
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


# ------------------------------------------------------------------
# Fused Gram-matvec for the iterative engine
# ------------------------------------------------------------------

# Stationary kernels the fused matvec supports (everything ops.kernels
# evaluates from a scaled squared distance alone).
FUSABLE_KERNELS = (
    "ExpQuad",
    "RBF",
    "Matern12",
    "Matern32",
    "Matern52",
    "Exponential",
)


def fused_matvec_active() -> bool:
    """Whether the iterative engine routes matvecs through the Pallas kernel.

    Default: on exactly when running on a TPU backend (the kernel is exact —
    f32 elementwise distances — so unlike the bf16-distance ``rbf_gram`` of
    earlier rounds there is no precision trade to opt into). Env override
    ``GUMBI_TPU_FUSED_MATVEC``: ``0`` disables, ``1`` forces it on any
    backend (interpret mode off-TPU; used by the CPU test suite).
    """
    flag = os.environ.get("GUMBI_TPU_FUSED_MATVEC", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return pallas_available()


def _fused_matvec_body(a_ref, b_ref, v_ref, out_ref, *, d, kernel, passes):
    """One (bm, bn) tile of K(kernel) @ V, accumulated over the inner axis.

    Distances are exact f32: an elementwise loop over the (static, small)
    coordinate dimension — no a·bᵀ cancellation, no coordinate quantization.
    Only the tile@V product is split to bf16 for the MXU (3 passes ≈ f32).
    """
    from jax.experimental import pallas as pl

    from .kernels import _stationary

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    a = a_ref[:]  # (bm, d_pad), pre-scaled by 1/ls
    b = b_ref[:]  # (bn, d_pad)
    sq = jnp.zeros((a.shape[0], b.shape[0]), jnp.float32)
    for k in range(d):
        diff = a[:, k : k + 1] - b[:, k : k + 1].T
        sq = sq + diff * diff
    kt = _stationary(kernel, sq)

    v = v_ref[:]
    # precision is pinned to DEFAULT: the library globally defaults matmuls
    # to HIGHEST (__init__.py), which would silently turn each pass of the
    # hi/lo split into a multi-pass product (measured 4× slower at equal
    # accuracy — the split already recovers f32).
    mm = partial(
        jax.lax.dot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    if passes == 1:
        acc = mm(kt.astype(jnp.bfloat16), v.astype(jnp.bfloat16))
    elif passes == 3:
        k_hi = kt.astype(jnp.bfloat16).astype(jnp.float32)
        k_lo = kt - k_hi
        v_hi = v.astype(jnp.bfloat16).astype(jnp.float32)
        v_lo = v - v_hi
        acc = mm(k_hi, v_hi) + mm(k_hi, v_lo) + mm(k_lo, v_hi)
    else:
        acc = jax.lax.dot(
            kt, v, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    out_ref[:] += acc


def fused_stationary_matvec(
    x1, x2, v, ls, kernel="ExpQuad", *, bm=1024, bn=1024, passes=3, interpret=None
):
    """``K @ v`` for a unit-amplitude stationary kernel, K never leaving VMEM.

    K_ij = k(‖(x1_i − x2_j)/ls‖²) with ``k`` one of :data:`FUSABLE_KERNELS`
    (η² is the caller's to apply — it commutes with the product). ``x1``
    (n, d) and ``x2`` (m, d) are raw z-space coordinates; ``v`` is (m, r).
    Shapes need no alignment — inputs are zero-padded to tile multiples, and
    zero-padded ``x2`` rows are annihilated by their zero ``v`` rows (padded
    output rows are sliced away).

    Probe-selected defaults (benchmarks/probe_fused_matvec.py, v5e): 1024²
    tiles, 3-pass hi/lo bf16 MXU product. ``interpret=None`` auto-selects
    Pallas interpret mode off-TPU so the same function is testable on CPU.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n, d = x1.shape
    m = x2.shape[0]
    r = v.shape[1]
    ls_b = jnp.broadcast_to(ls, (d,)).astype(jnp.float32)
    a = x1.astype(jnp.float32) / ls_b
    b = x2.astype(jnp.float32) / ls_b

    bm = min(bm, _ceil_to(max(n, 8), 128))
    bn = min(bn, _ceil_to(max(m, 8), 128))
    n_pad = _ceil_to(max(n, 8), bm)
    m_pad = _ceil_to(max(m, 8), bn)
    d_pad = _ceil_to(d, 128)
    r_pad = _ceil_to(max(r, 1), 128)

    ap = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :d].set(a)
    bp = jnp.zeros((m_pad, d_pad), jnp.float32).at[:m, :d].set(b)
    vp = jnp.zeros((m_pad, r_pad), jnp.float32).at[:m, :r].set(v.astype(jnp.float32))

    grid = (n_pad // bm, m_pad // bn)
    # The library runs with x64 enabled by default (__init__.py); Pallas index
    # maps traced under x64 emit i64 constants Mosaic cannot legalize, so the
    # kernel (whose operands are all explicitly f32) is traced in a 32-bit
    # scope.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            partial(_fused_matvec_body, d=d, kernel=kernel, passes=passes),
            out_shape=jax.ShapeDtypeStruct((n_pad, r_pad), jnp.float32),
            grid_spec=pl.GridSpec(
                grid=grid,
                in_specs=[
                    pl.BlockSpec((bm, d_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((bn, d_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((bn, r_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (bm, r_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM
                ),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * n_pad * m_pad * (d + 3 * r_pad),
                bytes_accessed=4
                * (n_pad * d_pad + (m_pad * d_pad + m_pad * r_pad) * grid[0] + n_pad * r_pad),
                transcendentals=n_pad * m_pad,
            ),
            # The tile chain (sq, k, hi/lo splits, double-buffered operands)
            # peaks above Mosaic's conservative 16M default scoped budget at
            # 1024² tiles; v5e has 128M physical VMEM.
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(ap, bp, vp)
    return out[:n, :r].astype(v.dtype)


def _fused_matvec_sym_body(
    a_ref, b_ref, vi_ref, vj_ref, out_ref, *, d, kernel, nb, bm
):
    """One staggered band step of the SYMMETRIC K @ V.

    Grid is (n_bands, nb) with the band offset ``jj`` outer. Step (jj, i)
    builds the single tile T = K[i·bm:(i+1)·bm, j·bm:(j+1)·bm] for
    j = (i+jj) mod nb and accumulates BOTH of its contributions into the
    full-array VMEM accumulator: out[i] += T @ V[j] and (off-diagonal only)
    out[j] += Tᵀ @ V[i]. Each unordered tile pair is built exactly once —
    the VPU tile-build work (distances + kernel + hi/lo splits), which is
    ~half the kernel's wall-clock at production probe widths, is halved
    versus the general kernel. The MXU product count is unchanged.
    """
    from jax.experimental import pallas as pl

    from .kernels import _stationary

    jj = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when((jj == 0) & (i == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Wrap band for even nb double-covers its pairs; keep the first half.
    active = (jj * 2 < nb) | (nb % 2 == 1) | (i * 2 < nb)

    @pl.when(active)
    def _():
        a = a_ref[:]  # (bm, d_pad) rows i, pre-scaled by 1/ls
        b = b_ref[:]  # (bm, d_pad) rows j
        sq = jnp.zeros((a.shape[0], b.shape[0]), jnp.float32)
        for k in range(d):
            diff = a[:, k : k + 1] - b[:, k : k + 1].T
            sq = sq + diff * diff
        kt = _stationary(kernel, sq)
        # shared hi/lo split: both products reuse it (see _fused_matvec_body
        # for the precision pinning rationale)
        mm = partial(
            jax.lax.dot_general,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        nt = (((1,), (0,)), ((), ()))  # T @ v
        tt = (((0,), (0,)), ((), ()))  # Tᵀ @ v (contract T's row axis)
        k_hi = kt.astype(jnp.bfloat16).astype(jnp.float32)
        k_lo = kt - k_hi

        def prod(v, dims):
            v_hi = v.astype(jnp.bfloat16).astype(jnp.float32)
            v_lo = v - v_hi
            return (
                mm(k_hi, v_hi, dims)
                + mm(k_hi, v_lo, dims)
                + mm(k_lo, v_hi, dims)
            )

        out_i = prod(vj_ref[:], nt)
        sl_i = (pl.dslice(i * bm, bm), slice(None))
        out_ref[sl_i] += out_i

        @pl.when(jj > 0)
        def _():
            j = jax.lax.rem(i + jj, nb)
            out_j = prod(vi_ref[:], tt)
            sl_j = (pl.dslice(j * bm, bm), slice(None))
            out_ref[sl_j] += out_j


# The full-array VMEM accumulator must coexist with tile temporaries and
# double-buffered operand blocks; cap its footprint so the kernel stays
# inside the 128 MB physical VMEM of a v5e core with headroom.
_SYM_ACC_BYTES_MAX = 32 * 1024 * 1024


def sym_matvec_fits(n, r, bm=1024):
    """Whether :func:`fused_stationary_matvec_sym`'s VMEM accumulator fits
    for an (n, n) self-Gram against (n, r) columns — the single source of
    the padding arithmetic, so callers never re-derive it."""
    bm = min(bm, _ceil_to(max(int(n), 8), 128))
    n_pad = _ceil_to(max(int(n), 8), bm)
    r_pad = _ceil_to(max(int(r), 1), 128)
    return n_pad * r_pad * 4 <= _SYM_ACC_BYTES_MAX


def fused_stationary_matvec_sym(
    x, v, ls, kernel="ExpQuad", *, bm=1024, interpret=None
):
    """``K @ v`` for the SELF-Gram of a stationary kernel, exploiting symmetry.

    Same contract and numerics class as :func:`fused_stationary_matvec` with
    ``x1 = x2 = x`` — exact f32 elementwise distances, 3-pass hi/lo bf16 MXU
    products — but each off-diagonal Gram tile is built once and consumed
    twice (T @ V[j] into rows i, Tᵀ @ V[i] into rows j) via a staggered band
    grid over unordered tile pairs, halving the VPU tile-build work that
    bounds the general kernel at production probe widths. The output lives in
    a single full-array VMEM accumulator (legal: the out block never changes,
    so cross-step accumulation is the standard revisiting pattern), which
    bounds applicability to n_pad·r_pad·4 ≤ 32 MB — callers fall back to the
    general kernel beyond that.

    Summation order differs from the general kernel (band order vs row-major
    tiles), so results agree to f32 accumulation round-off, not bitwise.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n, d = x.shape
    r = v.shape[1]
    ls_b = jnp.broadcast_to(ls, (d,)).astype(jnp.float32)
    a = x.astype(jnp.float32) / ls_b

    bm = min(bm, _ceil_to(max(n, 8), 128))
    n_pad = _ceil_to(max(n, 8), bm)
    d_pad = _ceil_to(d, 128)
    r_pad = _ceil_to(max(r, 1), 128)
    if n_pad * r_pad * 4 > _SYM_ACC_BYTES_MAX:
        raise ValueError(
            f"fused_stationary_matvec_sym accumulator {n_pad}x{r_pad} exceeds "
            f"{_SYM_ACC_BYTES_MAX} bytes; use fused_stationary_matvec"
        )

    ap = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :d].set(a)
    vp = jnp.zeros((n_pad, r_pad), jnp.float32).at[:n, :r].set(v.astype(jnp.float32))

    nb = n_pad // bm
    n_bands = nb // 2 + 1
    grid = (n_bands, nb)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            partial(_fused_matvec_sym_body, d=d, kernel=kernel, nb=nb, bm=bm),
            out_shape=jax.ShapeDtypeStruct((n_pad, r_pad), jnp.float32),
            grid_spec=pl.GridSpec(
                grid=grid,
                in_specs=[
                    pl.BlockSpec((bm, d_pad), lambda jj, i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (bm, d_pad), lambda jj, i: ((i + jj) % nb, 0), memory_space=pltpu.VMEM
                    ),
                    pl.BlockSpec((bm, r_pad), lambda jj, i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (bm, r_pad), lambda jj, i: ((i + jj) % nb, 0), memory_space=pltpu.VMEM
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (n_pad, r_pad), lambda jj, i: (0, 0), memory_space=pltpu.VMEM
                ),
            ),
            cost_estimate=pl.CostEstimate(
                flops=n_pad * n_pad * (d + 3 * r_pad) + 2 * n_pad * n_pad * 3 * r_pad,
                bytes_accessed=4
                * (
                    2 * (n_pad * d_pad + n_pad * r_pad) * n_bands
                    + n_pad * r_pad
                ),
                transcendentals=n_pad * n_pad // 2,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(ap, ap, vp, vp)
    return out[:n, :r].astype(v.dtype)
