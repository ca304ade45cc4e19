"""Probe: SYMMETRIC fused Gram-matvec (staggered bands) vs the general kernel.

At production probe widths the general fused matvec is ~half MXU (the 3-pass
hi/lo bf16 products are irreducible at f32 accuracy) and ~half VPU tile
build (distances + stationary kernel + hi/lo splits). The self-Gram K is
symmetric, so `fused_stationary_matvec_sym` builds each unordered tile once
and consumes it twice (T @ V[j] into rows i, Tᵀ @ V[i] into rows j) through
a staggered band grid with a full-array VMEM accumulator — halving the VPU
side. This probe measures both kernels at N=50k across probe widths and
checks agreement.

Run on the TPU: python benchmarks/probe_fused_matvec_sym.py
"""

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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gumbi_tpu.ops.pallas_kernels import (  # noqa: E402
    fused_stationary_matvec,
    fused_stationary_matvec_sym,
)

N = int(os.environ.get("PROBE_N", 50_000))
D = int(os.environ.get("PROBE_D", 2))
R_LIST = [int(r) for r in os.environ.get("PROBE_R", "9,65").split(",")]
ROOFLINE_GFLOPS = 61_500.0


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-2, 2, (N, D)), jnp.float32)
    ls = jnp.asarray(rng.uniform(0.3, 0.4, D), jnp.float32)
    print(f"[sym] N={N} D={D} device={jax.devices()[0]}", file=sys.stderr)

    for r in R_LIST:
        v = jnp.asarray(rng.normal(size=(N, r)), jnp.float32)

        gen = jax.jit(lambda vv: fused_stationary_matvec(x, x, vv, ls))
        sym = jax.jit(lambda vv: fused_stationary_matvec_sym(x, vv, ls))

        def timeit(fn, reps=5):
            out = fn(v)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(v)
            jax.block_until_ready(out)
            return (time.perf_counter() - t0) / reps, out

        t_gen, o_gen = timeit(gen)
        t_sym, o_sym = timeit(sym)
        err = float(
            jnp.max(jnp.abs(o_gen - o_sym)) / jnp.max(jnp.abs(o_gen))
        )
        flops = 2 * N * N * (D + r)
        print(
            f"[sym] R={r}: general {t_gen*1e3:.1f} ms "
            f"({flops/t_gen/1e12:.1f} TFLOP/s, {100*flops/t_gen/1e9/ROOFLINE_GFLOPS:.0f}%) | "
            f"sym {t_sym*1e3:.1f} ms ({flops/t_sym/1e12:.1f} TFLOP/s, "
            f"{100*flops/t_sym/1e9/ROOFLINE_GFLOPS:.0f}%) | "
            f"speedup {t_gen/t_sym:.2f}x | rel err {err:.1e}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
