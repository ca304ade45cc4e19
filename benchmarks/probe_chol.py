"""Probe: XLA Cholesky vs GEMM-dominated blocked Cholesky on one TPU chip.

The hot MLL (bench.py) is dominated by a batched (D, N, N) Cholesky and the
VJP's triangular inverse. XLA's TPU cholesky measured ~2.2 TFLOP/s f32 at
N=5120 — a few percent of the chip's GEMM rate. This probe measures, on the
real chip:

  1. raw f32 + bf16 GEMM rate at the bench size (the roofline),
  2. jnp.linalg.cholesky (XLA's QDWH-free blocked impl),
  3. a right-looking blocked Cholesky where the (b,b) panel factor is
     explicitly inverted so every off-diagonal op is a GEMM,
  4. solve_triangular(L, I) (XLA) vs blocked triangular inverse via GEMMs.

Run: python benchmarks/probe_chol.py [N] [BLOCK]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5120
B = int(sys.argv[2]) if len(sys.argv) > 2 else 512
D = 2


def timeit(f, *args, reps=10):
    # block_until_ready under-reports on the tunneled backend (returns before
    # execution finishes). Queue all reps on the in-order device stream, then
    # force ONE device→host transfer: the roundtrip waits for everything
    # queued before it, and its latency amortizes over the reps.
    sync = jax.jit(lambda o: jnp.sum(jax.tree_util.tree_leaves(o)[0][..., -1]))
    float(sync(f(*args)))  # compile both programs
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = f(*args)
    float(sync(out))
    return (time.perf_counter() - t0) / reps


def blocked_cholesky(A, b):
    """Right-looking blocked Cholesky; off-panel work is all GEMMs.

    The (b,b) panel is factorized by XLA's cholesky, then explicitly
    inverted (another small triangular op) so the column update
    L[i,k] = A[i,k] L[k,k]^-T is a GEMM instead of a large triangular solve.
    """
    n = A.shape[-1]
    nb = n // b
    L = jnp.zeros_like(A)
    for k in range(nb):
        sl = slice(k * b, (k + 1) * b)
        tr = slice((k + 1) * b, n)
        Akk = A[..., sl, sl]
        Lkk = jnp.linalg.cholesky(Akk)
        eye = jnp.broadcast_to(jnp.eye(b, dtype=A.dtype), Lkk.shape)
        Lkk_inv = jsl.solve_triangular(Lkk, eye, lower=True)
        L = L.at[..., sl, sl].set(Lkk)
        if (k + 1) * b < n:
            Lik = A[..., tr, sl] @ jnp.swapaxes(Lkk_inv, -1, -2)
            L = L.at[..., tr, sl].set(Lik)
            A = A.at[..., tr, tr].add(-(Lik @ jnp.swapaxes(Lik, -1, -2)))
    return L


def blocked_tri_inverse(L, b):
    """L^-1 for lower-triangular L via blocked forward substitution (GEMMs)."""
    n = L.shape[-1]
    nb = n // b
    eye = jnp.eye(b, dtype=L.dtype)
    # X[i,k] blocks of L^-1, column-block k at a time
    X = jnp.zeros_like(L)
    invs = []
    for k in range(nb):
        sl = slice(k * b, (k + 1) * b)
        blk = L[..., sl, sl]
        invs.append(
            jsl.solve_triangular(blk, jnp.broadcast_to(eye, blk.shape), lower=True)
        )
    for k in range(nb):
        slk = slice(k * b, (k + 1) * b)
        X = X.at[..., slk, slk].set(invs[k])
        for i in range(k + 1, nb):
            sli = slice(i * b, (i + 1) * b)
            # X[i,k] = -Linv[i,i] @ (sum_{j=k}^{i-1} L[i,j] X[j,k])
            acc = L[..., sli, k * b : i * b] @ X[..., k * b : i * b, slk]
            X = X.at[..., sli, slk].set(-(invs[i] @ acc))
    return X


def main():
    rng = np.random.default_rng(0)
    Xb = rng.normal(size=(N, 64)).astype(np.float32)
    K = Xb @ Xb.T / 64 + np.eye(N, dtype=np.float32) * 2.0
    A = jnp.asarray(np.broadcast_to(K, (D, N, N)).copy())

    dev = jax.devices()[0]
    print(f"device={dev}, N={N}, D={D}, block={B}", file=sys.stderr)

    # 1. GEMM roofline
    M = jnp.asarray(rng.normal(size=(N, N)).astype(np.float32))
    gemm = jax.jit(lambda a: a @ a)
    t = timeit(gemm, M)
    print(f"f32 GEMM {N}x{N}: {t*1e3:.2f} ms = {2*N**3/t/1e12:.1f} TFLOP/s")
    Mb = M.astype(jnp.bfloat16)
    t = timeit(jax.jit(lambda a: a @ a), Mb)
    print(f"bf16 GEMM {N}x{N}: {t*1e3:.2f} ms = {2*N**3/t/1e12:.1f} TFLOP/s")

    flops = D * N**3 / 3

    # 2. XLA cholesky
    xla_chol = jax.jit(jnp.linalg.cholesky)
    t = timeit(xla_chol, A)
    print(f"XLA cholesky (D,{N},{N}): {t*1e3:.2f} ms = {flops/t/1e12:.2f} TFLOP/s")
    L_ref = xla_chol(A)

    # 3. blocked cholesky
    for b in (256, 512, 1024):
        if N % b:
            continue
        blk = jax.jit(lambda A, b=b: blocked_cholesky(A, b))
        t = timeit(blk, A)
        Lb = blk(A)
        err = float(jnp.max(jnp.abs(jnp.tril(Lb) - jnp.tril(L_ref))))
        print(f"blocked cholesky b={b}: {t*1e3:.2f} ms = {flops/t/1e12:.2f} TFLOP/s (max|Δ|={err:.2e})")

    # 4. triangular inverse
    eyeN = jnp.broadcast_to(jnp.eye(N, dtype=jnp.float32), (D, N, N))
    xla_inv = jax.jit(lambda L: jsl.solve_triangular(L, eyeN, lower=True))
    t = timeit(xla_inv, L_ref)
    iflops = D * N**3 / 3
    print(f"XLA solve_triangular(L, I): {t*1e3:.2f} ms = {iflops/t/1e12:.2f} TFLOP/s")
    Xref = xla_inv(L_ref)
    for b in (256, 512, 1024):
        if N % b:
            continue
        binv = jax.jit(lambda L, b=b: blocked_tri_inverse(L, b))
        t = timeit(binv, L_ref)
        Xb_ = binv(L_ref)
        err = float(jnp.max(jnp.abs(Xb_ - Xref)))
        print(f"blocked tri-inverse b={b}: {t*1e3:.2f} ms = {iflops/t/1e12:.2f} TFLOP/s (max|Δ|={err:.2e})")


if __name__ == "__main__":
    main()
