"""Probe: lax.map vs vmap for the bench's coarse restart stage on TPU.

Round-1 measured vmap 3-4x slower than lax.map for multi-restart L-BFGS on
one chip (with store_grad=True trial-wise linearization). The optimizer now
uses value-only backtracking trials, which changes the balance: batched
small-N Cholesky amortizes fixed per-op overheads across restarts, and all
lanes share each iteration's dispatch. Re-measure both modes at the bench's
coarse stage shape (N=640, R=8, 32 iters).

Run: python benchmarks/probe_coarse_vmap.py
"""

import os
import sys
import time

os.environ.setdefault("GUMBI_TPU_X64", "0")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

from gumbi_tpu.ops import initial_params  # noqa: E402
from gumbi_tpu.ops.kronecker import kron_neg_logp  # noqa: E402
from gumbi_tpu.ops.optimize import lbfgs_backtracking_minimize  # noqa: E402

COARSE_N = 640
R = 8
ITERS = 32


def main():
    spec, xc, Y, la, lb = bench.make_problem()
    la = jnp.asarray(la, jnp.float32)
    lb = jnp.asarray(lb, jnp.float32)
    rng = np.random.default_rng(1)
    sub = np.sort(rng.choice(bench.N_LOCS, COARSE_N, replace=False))
    xc_c, Y_c = xc[jnp.asarray(sub)], Y[jnp.asarray(sub)]
    u0s = initial_params(spec, la, lb, n_restarts=R, seed=0, dtype=jnp.float32)

    def obj(u):
        return kron_neg_logp(spec, u, xc_c, Y_c, la, lb)

    runner = lambda u0: lbfgs_backtracking_minimize(obj, u0, maxiter=ITERS)

    seq = jax.jit(lambda u0s: jax.lax.map(runner, u0s))
    vm = jax.jit(lambda u0s: jax.vmap(runner)(u0s))

    print(f"device={jax.devices()[0]}, N={COARSE_N}, R={R}, iters={ITERS}", file=sys.stderr)
    for name, f in [("lax.map", seq), ("vmap", vm)]:
        t0 = time.time()
        out = f(u0s)
        jax.block_until_ready(out[1])
        fs = np.asarray(out[1])
        compile_t = time.time() - t0
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(u0s)
        float(np.asarray(out[1])[0])
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt*1e3:6.1f} ms steady (compile {compile_t:.1f}s), best={fs.min():.2f}")


if __name__ == "__main__":
    main()
