"""GP kernel library: pure functions over a static spec + parameter pytree.

The model structure mirrors the reference's marginal GP (reference
gumbi/regression/pymc/GP.py:61-94, :706-754):

    K_total = Σ_terms [ η²·K_cont(ls) (+ τ·K_lin(c)) ] · Π_coregs B[i, j]

with ``B = W Wᵀ + diag(κ)`` the ICM coregionalization matrix per categorical
dimension (including the output dimension). Everything here is jit-friendly:
``GPSpec`` is a frozen, hashable pytree-free description of the structure, and
all numerics flow through the ``params`` dict, so XLA traces once per spec.

Inputs are split by type — ``Xc`` (N, d_cont) float z-space coordinates and
``Xk`` (N, n_cat) int32 level indices — rather than the reference's mixed
float matrix, so coregion lookups are exact gathers instead of float casts.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp

# Pallas fast path for RBF Gram assembly (fused tiles, exact f32 elementwise
# distances — see ops/pallas_kernels.py). Since round 4 the kernel is exact,
# so it defaults ON whenever running on a TPU backend; GUMBI_TPU_PALLAS=0
# disables, =1 forces (interpret mode off-TPU), or use enable_pallas().
_PALLAS_ENABLED: "bool | None" = {"0": False, "1": True}.get(
    os.environ.get("GUMBI_TPU_PALLAS", "auto")
)


def enable_pallas(on: bool = True):
    """Toggle the Pallas RBF Gram fast path (default: auto — on under TPU).

    The flag is read at TRACE time, so already-compiled programs (module-
    level jits for mll/posterior/fit) would silently keep their old Gram
    path; clearing the jit caches on an actual flip makes the toggle take
    effect for subsequent calls at the cost of recompiles.
    """
    global _PALLAS_ENABLED
    was = _pallas_active()
    _PALLAS_ENABLED = on
    if was != _pallas_active():
        import jax

        jax.clear_caches()


def _pallas_active() -> bool:
    if _PALLAS_ENABLED is not None:
        return _PALLAS_ENABLED
    import jax

    return jax.default_backend() == "tpu"

__all__ = [
    "CoregTerm",
    "GPTerm",
    "GPSpec",
    "CONTINUOUS_KERNELS",
    "gram",
    "gram_diag",
    "noise_diag",
    "coreg_matrix",
    "output_correlation",
]

# Continuous kernels supported, matching the reference list
# (gumbi/regression/pymc/GP.py:664-673) plus '+Periodic' warped variants.
CONTINUOUS_KERNELS = [
    "ExpQuad",
    "RBF",
    "Matern12",
    "Matern32",
    "Matern52",
    "Exponential",
    "Periodic",
]
CONTINUOUS_KERNELS += [k + "+Periodic" for k in CONTINUOUS_KERNELS if "Periodic" not in k]


@dataclass(frozen=True)
class CoregTerm:
    """One coregionalization factor: B = W Wᵀ + diag(κ) indexed by a cat column."""

    name: str  # parameter suffix, e.g. "Parameter" or "Code"
    col: int  # column into Xk holding this dimension's level indices
    d_out: int  # number of levels
    rank: int = 2  # columns of W (reference uses rank 2, GP.py:460)


@dataclass(frozen=True)
class GPTerm:
    """One additive GP component: continuous (+linear) kernel × coregions."""

    suffix: str  # parameter suffix: "total" for the global term, dim name otherwise
    kernel: str  # continuous kernel name (may end in '+Periodic')
    linear_idx: Tuple[int, ...] = ()  # continuous-dim indices with a linear kernel
    coregs: Tuple[CoregTerm, ...] = ()  # all coregion factors multiplied into this term


@dataclass(frozen=True)
class GPSpec:
    """Static description of the full covariance structure."""

    terms: Tuple[GPTerm, ...]
    d_cont: int
    ard: bool = True
    noise_coreg: Optional[CoregTerm] = None  # heteroskedastic output noise factor
    period: Optional[Tuple[float, ...]] = None  # z-space period per continuous dim
    likelihood: str = "gaussian"  # 'bernoulli' (GPC) has no Gaussian noise σ

    @property
    def n_ls(self) -> int:
        return self.d_cont if self.ard else 1


# ------------------------------------------------------------------
# Distance helpers. Squared distances go through a matmul so the MXU
# carries the O(N²·d) work; diagonals are clamped at zero.
# ------------------------------------------------------------------


def _scaled_sqdist(x1, x2, ls):
    """Σ_d ((x1_d - x2_d)/ls_d)² as an (n, m) matrix via the matmul identity."""
    a = x1 / ls
    b = x2 / ls
    sq = (
        jnp.sum(a * a, axis=-1)[:, None]
        + jnp.sum(b * b, axis=-1)[None, :]
        - 2.0 * a @ b.T
    )
    return jnp.maximum(sq, 0.0)


def _stationary(kernel, r2):
    """Stationary kernel value from the scaled squared distance matrix.

    Conventions follow pm.gp.cov: ExpQuad = exp(-r²/2), Matern12 = exp(-r),
    Exponential = exp(-r/2), Matern32/52 standard.
    """
    if kernel in ("ExpQuad", "RBF"):
        return jnp.exp(-0.5 * r2)
    r = jnp.sqrt(r2 + 1e-36)
    if kernel == "Matern12":
        return jnp.exp(-r)
    if kernel == "Exponential":
        return jnp.exp(-0.5 * r)
    if kernel == "Matern32":
        c = jnp.sqrt(3.0) * r
        return (1.0 + c) * jnp.exp(-c)
    if kernel == "Matern52":
        c = jnp.sqrt(5.0) * r
        return (1.0 + c + c * c / 3.0) * jnp.exp(-c)
    raise ValueError(f"Unknown stationary kernel {kernel!r}")


def _periodic(x1, x2, ls, period):
    """pm.gp.cov.Periodic: exp(-0.5 Σ_d (2 sin(π Δ_d / T_d) / ls_d)²)."""
    diff = x1[:, None, :] - x2[None, :, :]  # (n, m, d)
    s = jnp.sin(jnp.pi * diff / jnp.asarray(period)) * (2.0 / ls)
    return jnp.exp(-0.5 * jnp.sum(s * s, axis=-1))


def _warp_periodic(x, period):
    """sin/cos feature map used by the '+Periodic' warped kernels
    (reference gumbi/regression/pymc/GP.py:434-437)."""
    c = 2.0 * jnp.pi / jnp.asarray(period)
    return jnp.concatenate([jnp.sin(c * x), jnp.cos(c * x)], axis=-1)


def _linear(x1, x2, c, idx):
    """pm.gp.cov.Linear over the selected dims: Σ_d (x_d - c_d)(x'_d - c_d)."""
    idx = jnp.asarray(idx)
    a = x1[:, idx] - c
    b = x2[:, idx] - c
    return a @ b.T


def coreg_matrix(W, κ):
    """ICM coregionalization matrix B = W Wᵀ + diag(κ)."""
    return W @ W.T + jnp.diag(κ)


def output_correlation(W, κ):
    """Correlation matrix implied by a coregion factor (for mvuparray packing).

    Parity with the base-class extraction in the reference
    (gumbi/regression/base.py:592-596), exposed as an engine function so the
    regression layer never reaches into backend internals.
    """
    B = coreg_matrix(W, κ)
    D = jnp.sqrt(jnp.diag(B))[None, :]
    return B / (D.T @ D)


# ------------------------------------------------------------------
# Gram assembly
# ------------------------------------------------------------------


def _ls_vector(spec: GPSpec, ls):
    """Broadcast a possibly-shared lengthscale to one entry per continuous dim."""
    return ls if spec.ard else jnp.broadcast_to(ls, (spec.d_cont,))


def _term_cont(spec: GPSpec, term: GPTerm, params, xc1, xc2):
    s = term.suffix
    ls = _ls_vector(spec, params[f"ls_{s}"])
    η = params[f"η_{s}"]
    kernel = term.kernel

    if kernel == "Periodic":
        K = η**2 * _periodic(xc1, xc2, ls, spec.period)
    elif kernel.endswith("+Periodic"):
        base = kernel[: -len("+Periodic")]
        u1 = _warp_periodic(xc1, spec.period)
        u2 = _warp_periodic(xc2, spec.period)
        ls2 = jnp.concatenate([ls, ls])
        K = η**2 * _stationary(base, _scaled_sqdist(u1, u2, ls2))
    elif kernel in ("ExpQuad", "RBF") and xc1.dtype == jnp.float32 and _pallas_active():
        # f32-only: f64 runs (x64 parity paths) keep the XLA Gram, whose
        # dtype-generic arithmetic is what f64 exactness is measured against.
        from .pallas_kernels import rbf_gram

        K = rbf_gram(xc1, xc2, ls, η)  # η² folded into the fused kernel
    else:
        K = η**2 * _stationary(kernel, _scaled_sqdist(xc1, xc2, ls))

    if term.linear_idx:
        c = params[f"c_{s}"]
        τ = params[f"τ_{s}"]
        K = K + τ * _linear(xc1, xc2, c, term.linear_idx)
    return K


def _term_gram(spec: GPSpec, term: GPTerm, params, xc1, xk1, xc2, xk2):
    K = _term_cont(spec, term, params, xc1, xc2)
    for cg in term.coregs:
        B = coreg_matrix(params[f"W_{cg.name}"], params[f"κ_{cg.name}"])
        K = K * B[xk1[:, cg.col], :][:, xk2[:, cg.col]]
    return K


def gram(spec: GPSpec, params, xc1, xk1, xc2, xk2):
    """Full cross-covariance matrix between two point sets."""
    K = _term_gram(spec, spec.terms[0], params, xc1, xk1, xc2, xk2)
    for term in spec.terms[1:]:
        K = K + _term_gram(spec, term, params, xc1, xk1, xc2, xk2)
    return K


def _term_diag(spec: GPSpec, term: GPTerm, params, xc, xk):
    s = term.suffix
    η = params[f"η_{s}"]
    d = jnp.full(xc.shape[0], η**2, dtype=xc.dtype)
    if term.linear_idx:
        c = params[f"c_{s}"]
        τ = params[f"τ_{s}"]
        idx = jnp.asarray(term.linear_idx)
        d = d + τ * jnp.sum((xc[:, idx] - c) ** 2, axis=-1)
    for cg in term.coregs:
        B = coreg_matrix(params[f"W_{cg.name}"], params[f"κ_{cg.name}"])
        d = d * B[xk[:, cg.col], xk[:, cg.col]]
    return d


def gram_diag(spec: GPSpec, params, xc, xk):
    """Diagonal of the prior covariance at the given points (no noise)."""
    d = _term_diag(spec, spec.terms[0], params, xc, xk)
    for term in spec.terms[1:]:
        d = d + _term_diag(spec, term, params, xc, xk)
    return d


def noise_diag(spec: GPSpec, params, xk, n=None, dtype=None):
    """Observation-noise variance at each point.

    σ ~ WhiteNoise std; with heteroskedastic outputs the white noise is
    multiplied by an output coregion's diagonal (reference GP.py:560-569).
    """
    σ2 = params["σ"] ** 2
    n = xk.shape[0] if n is None else n
    d = jnp.full(n, σ2, dtype=dtype)
    if spec.noise_coreg is not None:
        cg = spec.noise_coreg
        B = coreg_matrix(params[f"W_{cg.name}"], params[f"κ_{cg.name}"])
        d = d * B[xk[:, cg.col], xk[:, cg.col]]
    return d
