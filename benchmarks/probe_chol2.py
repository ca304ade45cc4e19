"""Probe 2: recursive GEMM-based Cholesky + triangular inverse formulations.

Compares against XLA's cholesky / solve_triangular and the iterative blocked
forms (probe_chol.py) on the real chip. The recursive split

    chol([[A11, ·], [A21, A22]]):
        (L11, V11) = rec(A11)            # V = L^-1
        L21  = A21 @ V11ᵀ
        (L22, V22) = rec(A22 - L21 L21ᵀ)
        V21  = -V22 @ (L21 @ V11)

is log-depth, all large GEMMs, and assembles by concatenation (no O(N²)
scatter copies), producing the factor AND its inverse — exactly the pair the
quad_and_logdet VJP needs.

Run: python benchmarks/probe_chol2.py [N]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5120
D = 2
BASE = 640  # base-case size (N=5120 → 640 after 3 splits)


def timeit(f, *args, reps=10):
    sync = jax.jit(lambda o: jnp.sum(jax.tree_util.tree_leaves(o)[0]))
    float(sync(f(*args)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    float(sync(out))
    return (time.perf_counter() - t0) / reps


def _base_chol_inv(A):
    L = jnp.linalg.cholesky(A)
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    V = jsl.solve_triangular(L, eye, lower=True)
    return L, V


def chol_and_inv(A, base=BASE):
    """(L, L^-1) of SPD A by divide-and-conquer; all heavy work is GEMMs."""
    n = A.shape[-1]
    if n <= base:
        return _base_chol_inv(A)
    h = n // 2
    A11 = A[..., :h, :h]
    A21 = A[..., h:, :h]
    A22 = A[..., h:, h:]
    L11, V11 = chol_and_inv(A11, base)
    L21 = A21 @ jnp.swapaxes(V11, -1, -2)
    L22, V22 = chol_and_inv(A22 - L21 @ jnp.swapaxes(L21, -1, -2), base)
    V21 = -(V22 @ (L21 @ V11))
    z12 = jnp.zeros(A.shape[:-2] + (h, n - h), dtype=A.dtype)
    L = jnp.concatenate(
        [
            jnp.concatenate([L11, z12], axis=-1),
            jnp.concatenate([L21, L22], axis=-1),
        ],
        axis=-2,
    )
    V = jnp.concatenate(
        [
            jnp.concatenate([V11, z12], axis=-1),
            jnp.concatenate([V21, V22], axis=-1),
        ],
        axis=-2,
    )
    return L, V


def chol_only(A, base=BASE):
    """L alone (for value-only paths): same recursion, V kept per-level only."""
    n = A.shape[-1]
    if n <= base:
        return jnp.linalg.cholesky(A)
    h = n // 2
    A11 = A[..., :h, :h]
    A21 = A[..., h:, :h]
    A22 = A[..., h:, h:]
    L11, V11 = chol_and_inv(A11, base)  # inverse needed to form L21 as a GEMM
    L21 = A21 @ jnp.swapaxes(V11, -1, -2)
    L22 = chol_only(A22 - L21 @ jnp.swapaxes(L21, -1, -2), base)
    z12 = jnp.zeros(A.shape[:-2] + (h, n - h), dtype=A.dtype)
    return jnp.concatenate(
        [
            jnp.concatenate([L11, z12], axis=-1),
            jnp.concatenate([L21, L22], axis=-1),
        ],
        axis=-2,
    )


def tri_inv(L, base=BASE):
    """L^-1 for lower-triangular L by divide-and-conquer."""
    n = L.shape[-1]
    if n <= base:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=L.dtype), L.shape)
        return jsl.solve_triangular(L, eye, lower=True)
    h = n // 2
    V11 = tri_inv(L[..., :h, :h], base)
    V22 = tri_inv(L[..., h:, h:], base)
    V21 = -(V22 @ (L[..., h:, :h] @ V11))
    z12 = jnp.zeros(L.shape[:-2] + (h, n - h), dtype=L.dtype)
    return jnp.concatenate(
        [
            jnp.concatenate([V11, z12], axis=-1),
            jnp.concatenate([V21, V22], axis=-1),
        ],
        axis=-2,
    )


def main():
    rng = np.random.default_rng(0)
    Xb = rng.normal(size=(N, 64)).astype(np.float32)
    K = Xb @ Xb.T / 64 + np.eye(N, dtype=np.float32) * 2.0
    A = jnp.asarray(np.broadcast_to(K, (D, N, N)).copy())
    print(f"device={jax.devices()[0]}, N={N}, D={D}, base={BASE}", file=sys.stderr)

    flops = D * N**3 / 3
    xla_chol = jax.jit(jnp.linalg.cholesky)
    t = timeit(xla_chol, A)
    print(f"XLA cholesky:            {t*1e3:6.2f} ms = {flops/t/1e12:5.2f} TFLOP/s")
    L_ref = xla_chol(A)

    f = jax.jit(lambda A: chol_only(A))
    t = timeit(f, A)
    err = float(jnp.max(jnp.abs(jnp.tril(f(A)) - jnp.tril(L_ref))))
    print(f"recursive chol_only:     {t*1e3:6.2f} ms = {flops/t/1e12:5.2f} TFLOP/s (|Δ|={err:.1e})")

    f2 = jax.jit(lambda A: chol_and_inv(A))
    t = timeit(f2, A)
    L2, V2 = f2(A)
    errL = float(jnp.max(jnp.abs(jnp.tril(L2) - jnp.tril(L_ref))))
    resid = float(jnp.max(jnp.abs(jnp.tril(V2 @ L_ref) - jnp.broadcast_to(jnp.eye(N), (D, N, N)))))
    print(f"recursive chol_and_inv:  {t*1e3:6.2f} ms (|ΔL|={errL:.1e}, |VL-I|={resid:.1e})")

    eyeN = jnp.broadcast_to(jnp.eye(N, dtype=jnp.float32), (D, N, N))
    g = jax.jit(lambda L: jsl.solve_triangular(L, eyeN, lower=True))
    t = timeit(g, L_ref)
    print(f"XLA solve_tri(L, I):     {t*1e3:6.2f} ms = {flops/t/1e12:5.2f} TFLOP/s")

    g2 = jax.jit(lambda L: tri_inv(L))
    t = timeit(g2, L_ref)
    resid = float(jnp.max(jnp.abs(jnp.tril(g2(L_ref) @ L_ref) - eyeN)))
    print(f"recursive tri_inv:       {t*1e3:6.2f} ms = {flops/t/1e12:5.2f} TFLOP/s (|VL-I|={resid:.1e})")

    # end-to-end: value+grad shaped like the MLL backward
    z = jnp.asarray(rng.normal(size=(D, N)).astype(np.float32))

    def vjp_now(A, z):
        L = jnp.linalg.cholesky(A)
        al = jsl.cho_solve((L, True), z[..., :, None])[..., 0]
        eye = jnp.broadcast_to(jnp.eye(N, dtype=A.dtype), A.shape)
        Linv = jsl.solve_triangular(L, eye, lower=True)
        Ainv = jnp.swapaxes(Linv, -1, -2) @ Linv
        return Ainv - al[..., :, None] * al[..., None, :]

    def vjp_new(A, z):
        L, Linv = chol_and_inv(A)
        al = jnp.swapaxes(Linv, -1, -2) @ (Linv @ z[..., :, None])
        Ainv = jnp.swapaxes(Linv, -1, -2) @ Linv
        return Ainv - al[..., 0][..., :, None] * al[..., 0][..., None, :]

    t = timeit(jax.jit(vjp_now), A, z)
    print(f"current fwd+bwd core:    {t*1e3:6.2f} ms")
    t = timeit(jax.jit(vjp_new), A, z)
    print(f"recursive fwd+bwd core:  {t*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
