"""Probe: quad_and_logdet BACKWARD variants in consumption context.

probe_chol2.py showed the recursive triangular inverse is 3.4× faster than
XLA's solve in isolation but SLOWER once its output is transposed and fed to
a GEMM (layout/fusion artifact). This times the full backward computation

    A_bar = g_logdet · A⁻¹ − g_quad · ααᵀ

under different A⁻¹ strategies, as one jitted program each.

Run: python benchmarks/probe_qld_bwd.py [N]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")


def tri_inverse(L, base=640):
    """Recursive GEMM-based lower-triangular inverse (see probe_chol2.py)."""
    n = L.shape[-1]
    if n <= base:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=L.dtype), L.shape)
        return jsl.solve_triangular(L, eye, lower=True)
    h = n // 2
    V11 = tri_inverse(L[..., :h, :h], base)
    V22 = tri_inverse(L[..., h:, h:], base)
    V21 = -(V22 @ (L[..., h:, :h] @ V11))
    z12 = jnp.zeros(L.shape[:-2] + (h, n - h), dtype=L.dtype)
    top = jnp.concatenate([V11, z12], axis=-1)
    bot = jnp.concatenate([V21, V22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


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


def gram_t_gemm(X):
    """XᵀX without an explicit transpose copy: contract the -2 axes."""
    b = tuple(range(X.ndim - 2))
    return lax.dot_general(X, X, (((X.ndim - 2,), (X.ndim - 2,)), (b, b)))


def assemble(Ainv, al, gq, gl):
    return gl * Ainv - gq * (al[..., :, None] * al[..., None, :])


def v0_xla_solve(L, al, gq, gl):
    eye = jnp.broadcast_to(jnp.eye(N, dtype=L.dtype), L.shape)
    Linv = jsl.solve_triangular(L, eye, lower=True)
    return assemble(jnp.swapaxes(Linv, -1, -2) @ Linv, al, gq, gl)


def v1_rec_swap(L, al, gq, gl):
    Linv = tri_inverse(L)
    return assemble(jnp.swapaxes(Linv, -1, -2) @ Linv, al, gq, gl)


def v2_rec_dotgen(L, al, gq, gl):
    Linv = tri_inverse(L)
    return assemble(gram_t_gemm(Linv), al, gq, gl)


def v3_xla_dotgen(L, al, gq, gl):
    eye = jnp.broadcast_to(jnp.eye(N, dtype=L.dtype), L.shape)
    Linv = jsl.solve_triangular(L, eye, lower=True)
    return assemble(gram_t_gemm(Linv), al, gq, gl)


def v4_cho_solve_eye(L, al, gq, gl):
    eye = jnp.broadcast_to(jnp.eye(N, dtype=L.dtype), L.shape)
    return assemble(jsl.cho_solve((L, True), eye), al, gq, gl)


def main():
    rng = np.random.default_rng(0)
    Xb = rng.normal(size=(N, 64)).astype(np.float32)
    K = Xb @ Xb.T / 64 + np.eye(N, dtype=np.float32) * 2.0
    A = jnp.asarray(np.broadcast_to(K, (D, N, N)).copy())
    L = jax.jit(jnp.linalg.cholesky)(A)
    al = jnp.asarray(rng.normal(size=(D, N)).astype(np.float32))
    gq = jnp.float32(1.3)
    gl = jnp.float32(0.7)

    print(f"device={jax.devices()[0]}, N={N}, D={D}", file=sys.stderr)
    ref = None
    for name, f in [
        ("v0 xla solve + swapaxes GEMM", v0_xla_solve),
        ("v1 recursive + swapaxes GEMM", v1_rec_swap),
        ("v2 recursive + dot_general  ", v2_rec_dotgen),
        ("v3 xla solve + dot_general  ", v3_xla_dotgen),
        ("v4 cho_solve(L, I)          ", v4_cho_solve_eye),
        ("v5 recursive + opt barrier  ", v5_rec_barrier),
    ]:
        jf = jax.jit(f)
        t = timeit(jf, L, al, gq, gl)
        out = jf(L, al, gq, gl)
        if ref is None:
            ref = out
            err = 0.0
        else:
            err = float(jnp.max(jnp.abs(out - ref)))
        print(f"{name}: {t*1e3:6.2f} ms (|Δ|={err:.1e})")


# Recursive inverse behind an optimization barrier — tests whether the
# composed slowdown (v1/v2 vs isolated tri_inverse) is XLA fusing or
# rematerializing the concat-built inverse into its consumers.
def v5_rec_barrier(L, al, gq, gl):
    Linv = jax.lax.optimization_barrier(tri_inverse(L))
    return assemble(gram_t_gemm(Linv), al, gq, gl)


if __name__ == "__main__":
    main()
