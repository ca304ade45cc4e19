"""Probe: value / value+grad cost of the bench MLL at full N on the chip.

Times the exact objective bench.py polishes (kron_neg_logp at N=5120, D=2)
— value-only and value-and-grad — to attribute the per-L-BFGS-iteration cost
and validate linear-algebra changes in context (composite programs do not
time like their parts; see probe_chol2.py's fwd+bwd anomaly).

Run: python benchmarks/probe_mll_grad.py [N]
"""

import os
import sys
import time

os.environ.setdefault("GUMBI_TPU_X64", "0")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gumbi_tpu.ops import initial_params  # noqa: E402
from gumbi_tpu.ops.kronecker import kron_neg_logp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402  (reuses the bench problem definition)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5120


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

    val = jax.jit(obj)
    vg = jax.jit(jax.value_and_grad(obj))
    print(f"device={jax.devices()[0]}, N={N}", file=sys.stderr)
    t = timeit(val, u0)
    print(f"value only:      {t*1e3:7.2f} ms")
    t = timeit(vg, u0)
    print(f"value and grad:  {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
