"""Probe 2: bisect the 4× gap between probe_fused_matvec (16.4 ms @ 50k) and
the productionized fused_stationary_matvec (67 ms): d_pad (128 vs native d),
cost_estimate, vmem_limit_bytes, and ambient x64 are toggled one at a time.
"""

import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

if os.environ.get("PROBE_X64", "1") != "0":
    jax.config.update("jax_enable_x64", True)  # match library default

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(os.environ.get("PROBE_N", 50_000))
D = 2
R = 9
BM = BN = 1024


def _ceil_to(x, m):
    return (x + m - 1) // m * m


def _body(a_ref, b_ref, v_ref, out_ref, *, d, passes):
    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    a = a_ref[:]
    b = b_ref[:]
    sq = jnp.zeros((a.shape[0], b.shape[0]), jnp.float32)
    for k in range(d):
        diff = a[:, k : k + 1] - b[:, k : k + 1].T
        sq = sq + diff * diff
    kt = jnp.exp(-0.5 * sq)
    v = v_ref[:]
    mm = functools.partial(jax.lax.dot, preferred_element_type=jnp.float32)
    k_hi = kt.astype(jnp.bfloat16).astype(jnp.float32)
    k_lo = kt - k_hi
    v_hi = v.astype(jnp.bfloat16).astype(jnp.float32)
    v_lo = v - v_hi
    acc = mm(k_hi, v_hi) + mm(k_hi, v_lo) + mm(k_lo, v_hi)
    out_ref[:] += acc


def matvec(a, v, *, d_pad_mode, cost_mode, vmem_mode):
    n, d = a.shape
    r = v.shape[1]
    n_pad = _ceil_to(n, BM)
    d_pad = 128 if d_pad_mode == "128" else max(d, 1)
    r_pad = _ceil_to(r, 128)
    ap = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :d].set(a)
    vp = jnp.zeros((n_pad, r_pad), jnp.float32).at[:n, :r].set(v)
    grid = (n_pad // BM, n_pad // BN)
    if cost_mode == "probe":
        cost = pl.CostEstimate(
            flops=2 * n_pad * n_pad * (d + r_pad),
            bytes_accessed=4 * (2 * n_pad * d + 2 * n_pad * r_pad) * (n_pad // BM),
            transcendentals=n_pad * n_pad,
        )
    else:
        cost = pl.CostEstimate(
            flops=2 * n_pad * n_pad * (d + 3 * r_pad),
            bytes_accessed=4
            * (n_pad * d_pad + (n_pad * d_pad + n_pad * r_pad) * grid[0] + n_pad * r_pad),
            transcendentals=n_pad * n_pad,
        )
    kwargs = {}
    if vmem_mode == "64m":
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_body, d=d, passes=3),
            out_shape=jax.ShapeDtypeStruct((n_pad, r_pad), jnp.float32),
            grid_spec=pl.GridSpec(
                grid=grid,
                in_specs=[
                    pl.BlockSpec((BM, d_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BN, d_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BN, r_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BM, r_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            ),
            cost_estimate=cost,
            **kwargs,
        )(ap, ap, vp)
    return out[:n, :r]


def main():
    rng = np.random.default_rng(0)
    x = rng.uniform(-2, 2, size=(N, D)).astype(np.float32)
    ls = np.array([0.3, 0.35], np.float32)
    a = jax.device_put(jnp.asarray(x / ls))
    v = jax.device_put(jnp.asarray(rng.standard_normal((N, R)).astype(np.float32)))

    combos = [
        ("prod: d128+cost_prod+vmem64", dict(d_pad_mode="128", cost_mode="prod", vmem_mode="64m")),
        ("d_nat+cost_prod+vmem64", dict(d_pad_mode="nat", cost_mode="prod", vmem_mode="64m")),
        ("d128+cost_probe+vmem64", dict(d_pad_mode="128", cost_mode="probe", vmem_mode="64m")),
        ("d128+cost_prod+vmem_def", dict(d_pad_mode="128", cost_mode="prod", vmem_mode="def")),
        ("probe: d_nat+cost_probe+vmem_def", dict(d_pad_mode="nat", cost_mode="probe", vmem_mode="def")),
    ]
    for name, kw in combos:
        try:
            f = jax.jit(lambda a, v: matvec(a, v, **kw))
            out = f(a, v)
            # Materialize a checksum to the host: block_until_ready alone can
            # return early/cheaply through the axon tunnel (first version of
            # this probe reported a physically impossible 0.02-0.4 ms for a
            # 1.9 TFLOP kernel) and hides async kernel faults.
            chk = float(jnp.sum(out))
            t0 = time.perf_counter()
            for _ in range(10):
                out = f(a, v)
            chk = float(jnp.sum(out))
            dt = (time.perf_counter() - t0) / 10
            print(f"[{name}] {dt*1e3:.2f} ms  (checksum {chk:.1f})", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"[{name}] FAILED: {str(e)[:200]}", file=sys.stderr)


if __name__ == "__main__":
    main()
