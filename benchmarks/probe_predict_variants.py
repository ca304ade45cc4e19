"""Where do bench.py's predict-phase milliseconds go?

bench.py measures ~105 ms for the combined kron_cache + 10k-grid predict
program while probe_predict_grid.py measured 16.5 + 41 ms for the pieces.
Variants timed here (all N=5120, D=2, M=10000, f32):

  combined+host   one program, mean/var copied to host (what bench does)
  combined        one program, device-resident outputs
  single-dispatch combined+host but timed per single dispatch (no queue
                  amortization) — exposes tunnel dispatch/transfer latency

Run: python benchmarks/probe_predict_variants.py
"""

import os
import sys
import time

os.environ.setdefault("GUMBI_TPU_X64", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from gumbi_tpu.ops import CoregTerm, GPSpec, GPTerm
from gumbi_tpu.ops.kronecker import kron_cache, kron_predict_diag

N = int(os.environ.get("PROBE_N", 5120))
GRID = int(os.environ.get("PROBE_GRID", 100))
D = 2
DTYPE = jnp.float32


def main():
    rng = np.random.default_rng(0)
    xc = jnp.asarray(rng.uniform(-2, 2, size=(N, 2)).astype(np.float32))
    Y = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    g = np.linspace(-2, 2, GRID).astype(np.float32)
    G1, G2 = np.meshgrid(g, g, indexing="ij")
    xc_grid = jnp.asarray(np.column_stack([G1.ravel(), G2.ravel()]))

    out_cg = CoregTerm(name="Parameter", col=0, d_out=D)
    spec = GPSpec(
        terms=(GPTerm(suffix="total", kernel="ExpQuad", coregs=(out_cg,)),),
        d_cont=2,
        ard=True,
        noise_coreg=CoregTerm(name="Output_noise", col=0, d_out=D),
    )
    params = {
        "ls_total": jnp.asarray([0.8, 0.9], DTYPE),
        "η_total": jnp.asarray(1.2, DTYPE),
        "σ": jnp.asarray(0.15, DTYPE),
        "W_Parameter": jnp.asarray(rng.normal(size=(D, 2)).astype(np.float32) * 0.5),
        "κ_Parameter": jnp.asarray([0.5, 0.5], DTYPE),
        "W_Output_noise": jnp.asarray(rng.normal(size=(D, 2)).astype(np.float32) * 0.1),
        "κ_Output_noise": jnp.asarray([0.9, 0.9], DTYPE),
    }

    @jax.jit
    def predict(params):
        kc = kron_cache(spec, params, xc, Y)
        return kron_predict_diag(spec, params, kc, xc_grid, with_noise=True)

    # warm
    m, v = predict(params)
    jax.block_until_ready((m, v))

    # combined, device-resident, queue-amortized
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        m, v = predict(params)
    jax.block_until_ready((m, v))
    t_dev = (time.perf_counter() - t0) / reps * 1e3

    # combined + host copy, queue-amortized
    t0 = time.perf_counter()
    for _ in range(reps):
        m, v = predict(params)
        mh, vh = np.asarray(m), np.asarray(v)
    t_host = (time.perf_counter() - t0) / reps * 1e3

    # single dispatch + host copy (what one bench chain run pays)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        m, v = predict(params)
        mh, vh = np.asarray(m), np.asarray(v)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"device={jax.devices()[0]}, N={N}, M={xc_grid.shape[0]}")
    print(f"combined, device-resident, amortized: {t_dev:7.1f} ms")
    print(f"combined + host copy,     amortized: {t_host:7.1f} ms")
    print(f"combined + host copy, single dispatch: {np.round(ts, 1).tolist()} ms")


if __name__ == "__main__":
    main()
