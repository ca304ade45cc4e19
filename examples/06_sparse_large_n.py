"""Sparse (FITC) regression for large N + chunked grid prediction.

The reference scales past a few thousand points only via the FITC
approximation with k-means inducing points (`sparse=True, n_u`, reference
gumbi/regression/pymc/GP.py:571-578); this is the same knob on the JAX
engine (ops/fitc.py — Woodbury identity, never materializing the N×N Gram),
plus the chunked posterior used automatically for big grids.

N defaults to 4000 so the example runs anywhere in seconds; on a TPU chip
the same script at N=50000 fits in under a second steady-state
(benchmarks/bench_fitc50k.py). Run: python examples/06_sparse_large_n.py [N]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

import gumbi_tpu as gmb

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
rng = np.random.default_rng(0)
x = rng.uniform(-3, 3, N)
y = np.sin(1.4 * x) + 0.3 * x + rng.normal(0, 0.25, N)

ds = gmb.DataSet(pd.DataFrame({"x": x, "y": y}), outputs=["y"])

gp = gmb.GP(ds).fit(
    outputs=["y"],
    continuous_dims=["x"],
    sparse=True,
    n_u=64,  # k-means inducing points
    MAP_kwargs=dict(n_restarts=2, maxiter=100),
)

X = gp.prepare_grid(resolution=200)
yp = gp.predict_grid()

ax = gmb.ParrayPlotter(X, yp).plot()
ax.scatter(x, y, s=2, alpha=0.15, color="k", rasterized=True)
ax.set_title(f"FITC GP, N={N}, 64 inducing points")
out = os.path.join(os.path.dirname(__file__), "06_sparse_large_n.png")
plt.savefig(out, dpi=110, bbox_inches="tight")
print(f"saved {out}")

resid = np.asarray(yp.μ) - np.interp(
    np.asarray(X.values()), np.sort(x), (np.sin(1.4 * np.sort(x)) + 0.3 * np.sort(x))
)
print(f"grid RMSE vs true function: {np.sqrt(np.mean(resid**2)):.4f}")
