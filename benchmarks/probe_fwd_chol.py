"""Probe: blocked Cholesky (+ optimization barrier) in the MLL forward pass.

probe_qld_bwd.py showed the recursive triangular inverse only wins behind an
optimization barrier. This tests whether the same trick lands for the
iterative blocked Cholesky (probe_chol.py: 8.45 ms vs XLA's 11.0 ms isolated
at N=5120 b=1024) inside the real objective: kron_neg_logp value and
value+grad with gumbi_tpu.ops.linalg._chol_and_alpha monkeypatched.

Run: python benchmarks/probe_fwd_chol.py [N]
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5120


def blocked_cholesky(A, b=1024, barrier_panels=False):
    n = A.shape[-1]
    if n % b or n <= b:
        return jnp.linalg.cholesky(A)
    nb = n // b
    L = jnp.zeros_like(A)
    for k in range(nb):
        sl = slice(k * b, (k + 1) * b)
        tr = slice((k + 1) * b, n)
        Lkk = jnp.linalg.cholesky(A[..., sl, sl])
        eye = jnp.broadcast_to(jnp.eye(b, dtype=A.dtype), Lkk.shape)
        Lkk_inv = jsl.solve_triangular(Lkk, eye, lower=True)
        L = L.at[..., sl, sl].set(Lkk)
        if (k + 1) * b < n:
            Lik = A[..., tr, sl] @ jnp.swapaxes(Lkk_inv, -1, -2)
            L = L.at[..., tr, sl].set(Lik)
            A = A.at[..., tr, tr].add(-(Lik @ jnp.swapaxes(Lik, -1, -2)))
            if barrier_panels:
                A = jax.lax.optimization_barrier(A)
                L = jax.lax.optimization_barrier(L)
    return L


def timeit(f, *args, reps=10):
    sync = jax.jit(lambda o: jnp.sum(jax.tree_util.tree_leaves(o)[0]))
    float(sync(f(*args)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    float(sync(out))
    return (time.perf_counter() - t0) / reps


def main():
    bench.N_LOCS = N
    spec, xc, Y, la, lb = bench.make_problem()
    la = jnp.asarray(la, jnp.float32)
    lb = jnp.asarray(lb, jnp.float32)
    u0s = initial_params(spec, la, lb, n_restarts=1, seed=0, dtype=jnp.float32)
    u0 = jax.tree_util.tree_map(lambda leaf: leaf[0], u0s)

    def obj(u):
        return kron_neg_logp(spec, u, xc, Y, la, lb)

    print(f"device={jax.devices()[0]}, N={N}", file=sys.stderr)
    orig = linalg._chol_and_alpha
    variants = {
        "stock": orig,
        "blocked+barrier": lambda A, z: (
            lambda L: (L, jsl.cho_solve((L, True), z[..., :, None])[..., 0])
        )(jax.lax.optimization_barrier(blocked_cholesky(A))),
        "blocked": lambda A, z: (
            lambda L: (L, jsl.cho_solve((L, True), z[..., :, None])[..., 0])
        )(blocked_cholesky(A)),
        "blocked+panelbar": lambda A, z: (
            lambda L: (L, jsl.cho_solve((L, True), z[..., :, None])[..., 0])
        )(jax.lax.optimization_barrier(blocked_cholesky(A, barrier_panels=True))),
        "blocked512+panelbar": lambda A, z: (
            lambda L: (L, jsl.cho_solve((L, True), z[..., :, None])[..., 0])
        )(jax.lax.optimization_barrier(blocked_cholesky(A, b=512, barrier_panels=True))),
    }
    for name, fn in variants.items():
        linalg._chol_and_alpha = fn
        val = jax.jit(obj)
        vg = jax.jit(jax.value_and_grad(obj))
        tv = timeit(val, u0)
        tg = timeit(vg, u0)
        v = float(val(u0))
        print(f"{name:18s}: value {tv*1e3:6.2f} ms | value+grad {tg*1e3:6.2f} ms | f={v:.3f}")
    linalg._chol_and_alpha = orig


if __name__ == "__main__":
    main()
