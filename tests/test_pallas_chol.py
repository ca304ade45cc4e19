"""Correctness tests for the Pallas blocked Cholesky (interpret mode on CPU).

The kernel is opt-in (it measured 15.4 ms vs XLA's 11.4 ms at the bench
shape — see benchmarks/probe_pallas_chol.py and docs/perf.md), but its
correctness is pinned here so the measured comparison stays reproducible.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gumbi_tpu.ops.pallas_chol import BLOCK, cholesky, pallas_cholesky


def _spd(n, d=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(d, n, 32)).astype(np.float32)
    return jnp.asarray(X @ np.swapaxes(X, 1, 2) / 32 + 2.0 * np.eye(n, dtype=np.float32))


@pytest.mark.parametrize("n", [BLOCK, 2 * BLOCK, 3 * BLOCK])
def test_pallas_cholesky_matches_xla(n):
    A = _spd(n)
    L = jnp.tril(pallas_cholesky(A, interpret=True))
    Lref = jnp.linalg.cholesky(A)
    scale = float(jnp.max(jnp.abs(Lref)))
    np.testing.assert_allclose(
        np.asarray(L), np.asarray(Lref), atol=5e-5 * max(scale, 1.0), rtol=0
    )


def test_dispatch_falls_back_for_ineligible_shapes():
    # non-multiple-of-BLOCK N and f64 dtype both take the XLA path
    A = _spd(100)
    np.testing.assert_allclose(
        np.asarray(cholesky(A)), np.asarray(jnp.linalg.cholesky(A)), rtol=1e-6
    )
