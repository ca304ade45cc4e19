"""Probe: Pallas blocked Cholesky vs XLA on the real chip.

Correctness + wall-clock at the bench shape (D=2, N=5120, f32), isolated and
inside the Kronecker MLL (value / value+grad) with
gumbi_tpu.ops.linalg._chol_and_alpha monkeypatched.

Run: python benchmarks/probe_pallas_chol.py [N]
"""

import os
import sys
import time

os.environ.setdefault("GUMBI_TPU_X64", "0")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import jax.scipy.linalg as jsl  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

import gumbi_tpu.ops.linalg as linalg  # noqa: E402
from gumbi_tpu.ops import initial_params  # noqa: E402
from gumbi_tpu.ops.kronecker import kron_neg_logp  # noqa: E402
from gumbi_tpu.ops.pallas_chol import pallas_cholesky  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5120
D = 2


def timeit(f, *args, reps=10):
    sync = jax.jit(lambda o: jnp.sum(jax.tree_util.tree_leaves(o)[0]))
    float(sync(f(*args)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    float(sync(out))
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(D, N, 64)).astype(np.float32)
    A = jnp.asarray(X @ np.swapaxes(X, 1, 2) / 64 + 2.0 * np.eye(N, dtype=np.float32))

    print(f"device={jax.devices()[0]}, N={N}, D={D}", file=sys.stderr)
    xla = jax.jit(jnp.linalg.cholesky)
    t = timeit(xla, A)
    Lref = xla(A)
    flops = D * N**3 / 3
    print(f"XLA cholesky:     {t*1e3:6.2f} ms = {flops/t/1e12:5.2f} TFLOP/s")

    pk = jax.jit(lambda A: jnp.tril(pallas_cholesky(A)))
    Lp = pk(A)
    err = float(jnp.max(jnp.abs(Lp - jnp.tril(Lref))))
    t = timeit(pk, A)
    print(f"pallas cholesky:  {t*1e3:6.2f} ms = {flops/t/1e12:5.2f} TFLOP/s (max|Δ|={err:.1e})")

    # in-context: MLL value / value+grad
    bench.N_LOCS = N
    spec, xc, Y, la, lb = bench.make_problem()
    la = jnp.asarray(la, jnp.float32)
    lb = jnp.asarray(lb, jnp.float32)
    u0s = initial_params(spec, la, lb, n_restarts=1, seed=0, dtype=jnp.float32)
    u0 = jax.tree_util.tree_map(lambda leaf: leaf[0], u0s)

    def obj(u):
        return kron_neg_logp(spec, u, xc, Y, la, lb)

    orig = linalg._chol_and_alpha

    def pallas_chol_alpha(A, z):
        L = jax.lax.optimization_barrier(jnp.tril(pallas_cholesky(A)))
        return L, jsl.cho_solve((L, True), z[..., :, None])[..., 0]

    for name, fn in [("stock", orig), ("pallas", pallas_chol_alpha)]:
        linalg._chol_and_alpha = fn
        val = jax.jit(obj)
        vg = jax.jit(jax.value_and_grad(obj))
        tv = timeit(val, u0)
        tg = timeit(vg, u0)
        print(f"{name:7s}: value {tv*1e3:6.2f} ms | value+grad {tg*1e3:6.2f} ms | f={float(val(u0)):.3f}")
    linalg._chol_and_alpha = orig


if __name__ == "__main__":
    main()
