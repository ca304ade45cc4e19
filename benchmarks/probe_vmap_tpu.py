"""Probe: vmapped multi-restart L-BFGS on TPU with the custom-VJP MLL.

Measures compile time and steady-state wall-clock of the batched (vmap)
restart path vs the round-1 sequential (lax.map) path on the Kronecker LMC
objective, at the bench's coarse and full sizes. Evidence for the round-2
switch of ``optimize._default_mode`` to 'vmap' (see VERDICT.md item 2).

Usage: python benchmarks/probe_vmap_tpu.py [N] [R]
"""

import os
import sys
import time

os.environ.setdefault("GUMBI_TPU_X64", "0")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gumbi_tpu.ops import CoregTerm, GPSpec, GPTerm, initial_params, ls_prior_params  # noqa: E402
from gumbi_tpu.ops.kronecker import kron_neg_logp  # noqa: E402
from gumbi_tpu.ops.optimize import lbfgs_backtracking_minimize  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 640
R = int(sys.argv[2]) if len(sys.argv) > 2 else 8
MAXITER = int(os.environ.get("PROBE_MAXITER", 60))
DTYPE = jnp.float32


def main():
    rng = np.random.default_rng(0)
    Xb = rng.uniform(-2, 2, size=(N, 2)).astype(np.float32)
    f1 = np.sin(1.3 * Xb[:, 0]) * np.cos(0.9 * Xb[:, 1])
    Y = np.stack([f1 + rng.normal(0, 0.1, N), 0.7 * f1 + rng.normal(0, 0.15, N)], axis=1).astype(
        np.float32
    )
    out_cg = CoregTerm(name="Parameter", col=0, d_out=2)
    spec = GPSpec(
        terms=(GPTerm(suffix="total", kernel="ExpQuad", coregs=(out_cg,)),),
        d_cont=2,
        ard=True,
        noise_coreg=CoregTerm(name="Output_noise", col=0, d_out=2),
    )
    la, lb = ls_prior_params([0.05, 0.05], [4.0, 4.0])
    la = jnp.asarray(la, DTYPE)
    lb = jnp.asarray(lb, DTYPE)
    u0s = initial_params(spec, la, lb, n_restarts=R, seed=0, dtype=DTYPE)
    xc = jnp.asarray(Xb)
    Yj = jnp.asarray(Y)

    def objective(u):
        return kron_neg_logp(spec, u, xc, Yj, la, lb)

    def runner(u0):
        return lbfgs_backtracking_minimize(objective, u0, maxiter=MAXITER)

    print(f"device={jax.devices()[0]}, N={N}, R={R}, maxiter={MAXITER}", file=sys.stderr)

    for name, fit in [
        ("vmap", jax.jit(lambda u0s: jax.vmap(runner)(u0s))),
        ("sequential", jax.jit(lambda u0s: jax.lax.map(runner, u0s))),
    ]:
        t0 = time.time()
        xs, fs, its = fit(u0s)
        jax.block_until_ready(fs)
        t_compile = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            xs, fs, its = fit(u0s)
            jax.block_until_ready(fs)
            times.append(time.time() - t0)
        print(
            f"{name:10s}: compile+first {t_compile:7.1f}s | steady {min(times):7.3f}s | "
            f"best f {float(jnp.min(fs)):.2f} | iters {np.asarray(its).tolist()}"
        )


if __name__ == "__main__":
    main()
