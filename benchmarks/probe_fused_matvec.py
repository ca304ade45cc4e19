"""Probe: fused Pallas RBF Gram-matvec for the iterative (mBCG) engine.

The r3 blocked matvec (`ops/iterative.py:_make_matvec`) materializes each
(B, N) Gram tile to HBM and immediately re-reads it for the (B, N) @ (N, R)
GEMM — at N = 50k that is ~1 GB of HBM round-trip per block and the measured
43.7 ms / 1.26 TFLOP/s matvec (BENCH_r03, VERDICT weak #1). This probe fuses
tile construction and tile@V in one Pallas kernel:

  * scaled squared distances computed ELEMENTWISE per (bm, bn) tile in VMEM
    (exact f32 — no matmul-identity cancellation, no bf16 split); coordinates
    are pre-scaled by ls·√2 so the kernel is parameter-free;
  * K tile = exp(−sq) never leaves VMEM; it feeds the MXU immediately via a
    hi/lo bfloat16 3-pass split (~f32 accuracy) against the V block;
  * the (bm, R) output block accumulates in VMEM across the inner grid axis.

Measured variants: tile sizes, R widths (9 = r3 default, 33, 65), matmul
precision (1-pass bf16 / 3-pass hi-lo / 6-pass HIGHEST), vs the XLA blocked
matvec. Accuracy vs an f64 CPU oracle at N=4096.
"""

import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("GUMBI_TPU_CACHE_DIR", os.path.expanduser("~/.cache/jax")),
)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(os.environ.get("PROBE_N", 50_000))
D = int(os.environ.get("PROBE_D", 2))
R_LIST = [int(r) for r in os.environ.get("PROBE_R", "9,33,65").split(",")]
BM = int(os.environ.get("PROBE_BM", 1024))
BN = int(os.environ.get("PROBE_BN", 1024))


def _ceil_to(x, m):
    return (x + m - 1) // m * m


def _matvec_kernel(a_ref, b_ref, v_ref, out_ref, *, d, passes):
    """out[i] += exp(-||a_i - b_j||^2) @ v[j] for one (bm, bn) tile."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    a = a_ref[:]  # (bm, d_pad)
    b = b_ref[:]  # (bn, d_pad)
    sq = jnp.zeros((a.shape[0], b.shape[0]), jnp.float32)
    for k in range(d):
        diff = a[:, k : k + 1] - b[:, k : k + 1].T  # (bm, bn)
        sq = sq + diff * diff
    kt = jnp.exp(-sq)
    v = v_ref[:]
    if passes == 1:
        acc = jax.lax.dot(kt.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    elif passes == 3:
        k_hi = kt.astype(jnp.bfloat16).astype(jnp.float32)
        k_lo = kt - k_hi
        v_hi = v.astype(jnp.bfloat16).astype(jnp.float32)
        v_lo = v - v_hi
        mm = functools.partial(jax.lax.dot, preferred_element_type=jnp.float32)
        acc = mm(k_hi, v_hi) + mm(k_hi, v_lo) + mm(k_lo, v_hi)
    else:
        acc = jax.lax.dot(kt, v, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    out_ref[:] += acc


def fused_matvec(a, v, bm, bn, passes):
    """a: (N, d) pre-scaled by ls*sqrt(2); v: (N, R). Returns exp-Gram @ v."""
    n, d = a.shape
    r = v.shape[1]
    n_pad_i = _ceil_to(n, bm)
    n_pad_j = _ceil_to(n, bn)
    n_pad = max(n_pad_i, n_pad_j)
    r_pad = _ceil_to(r, 128)
    ap = jnp.zeros((n_pad, max(d, 1)), jnp.float32).at[:n, :].set(a)
    vp = jnp.zeros((n_pad, r_pad), jnp.float32).at[:n, :r].set(v)
    grid = (n_pad // bm, n_pad // bn)
    out = pl.pallas_call(
        functools.partial(_matvec_kernel, d=d, passes=passes),
        out_shape=jax.ShapeDtypeStruct((n_pad, r_pad), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, max(d, 1)), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, max(d, 1)), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, r_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, r_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * n_pad * (d + r_pad),
            bytes_accessed=4 * (2 * n_pad * d + 2 * n_pad * r_pad) * (n_pad // bm),
            transcendentals=n_pad * n_pad,
        ),
    )(ap, ap, vp)
    return out[:n, :r]


def xla_blocked_matvec(a, v, block):
    """The r3 path: materialize (block, N) tiles, then GEMM."""
    n = a.shape[0]
    nb = n // block

    def body(i, out):
        ab = jax.lax.dynamic_slice_in_dim(a, i * block, block)
        sq = (
            jnp.sum(ab * ab, axis=1)[:, None]
            + jnp.sum(a * a, axis=1)[None, :]
            - 2.0 * jnp.dot(ab, a.T, precision=jax.lax.Precision.HIGHEST)
        )
        kb = jnp.exp(-jnp.maximum(sq, 0.0))
        yb = jnp.dot(kb, v, precision=jax.lax.Precision.HIGHEST)
        return jax.lax.dynamic_update_slice_in_dim(out, yb, i * block, axis=0)

    return jax.lax.fori_loop(0, nb, body, jnp.zeros_like(v))


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device={dev}", file=sys.stderr)

    # ---- accuracy check at N=4096 vs f64 CPU oracle ----
    n_s = 4096
    x_s = rng.uniform(-2, 2, size=(n_s, D))
    ls = np.array([0.3, 0.35][:D])
    a_s = (x_s / (ls * np.sqrt(2.0))).astype(np.float32)
    v_s = rng.standard_normal((n_s, 9)).astype(np.float32)
    a64 = x_s / (ls * np.sqrt(2.0))
    K64 = np.exp(-((a64[:, None, :] - a64[None, :, :]) ** 2).sum(-1))
    ref = K64 @ v_s.astype(np.float64)
    refn = np.linalg.norm(ref)
    for passes in (1, 3, 6):
        got = np.asarray(jax.jit(
            lambda a, v: fused_matvec(a, v, 512, 512, passes)
        )(jnp.asarray(a_s), jnp.asarray(v_s)))
        err = np.linalg.norm(got - ref) / refn
        print(f"[acc] passes={passes}: rel_err={err:.3e}", file=sys.stderr)
    got_x = np.asarray(jax.jit(lambda a, v: xla_blocked_matvec(a, v, 512))(
        jnp.asarray(a_s), jnp.asarray(v_s)))
    print(f"[acc] xla HIGHEST blocked: rel_err={np.linalg.norm(got_x - ref) / refn:.3e}",
          file=sys.stderr)

    # ---- throughput at N ----
    x = rng.uniform(-2, 2, size=(N, D))
    a = jnp.asarray((x / (ls * np.sqrt(2.0))).astype(np.float32))
    for r in R_LIST:
        v = jnp.asarray(rng.standard_normal((N, r)).astype(np.float32))
        for bm, bn in [(BM, BN), (512, 2048), (2048, 512), (512, 512)]:
            for passes in (3,):
                f = jax.jit(lambda a, v: fused_matvec(a, v, bm, bn, passes))
                out = f(a, v)
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                for _ in range(10):
                    out = f(a, v)
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) / 10
                fl = 2 * N * N * (D + r)
                print(f"[fused] R={r} bm={bm} bn={bn} passes={passes}: "
                      f"{dt*1e3:.2f} ms  {fl/dt/1e12:.2f} TFLOP/s counted",
                      file=sys.stderr)
        # XLA baseline once per R
        fb = jax.jit(lambda a, v: xla_blocked_matvec(a, v, 2500))
        out = fb(a, v)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = fb(a, v)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 5
        fl = 2 * N * N * (D + r)
        print(f"[xla  ] R={r} block=2500: {dt*1e3:.2f} ms  "
              f"{fl/dt/1e12:.2f} TFLOP/s counted", file=sys.stderr)


if __name__ == "__main__":
    main()
