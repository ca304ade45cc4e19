"""Lab-loop Bayesian optimization (reference docs' BO example).

fit → propose → observe → refit with on-device qLogNEI, visualizing the
posterior and proposals each round. Run: python examples/04_bayesian_optimization.py
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


def experiment(x, rng):
    """Ground-truth lab response: peak yield at x*=63."""
    return np.exp(-0.5 * ((x - 63.0) / 18.0) ** 2) * 30.0 + 8.0 + rng.normal(0, 0.3)


rng = np.random.default_rng(0)
X = list(rng.uniform(20, 200, 5))
Y = [experiment(x, rng) for x in X]

rounds = 6
for r in range(rounds):
    ds = gmb.DataSet(pd.DataFrame({"x": X, "yield": Y}), outputs=["yield"], log_vars=["yield", "x"])
    gp = gmb.GP(ds).fit(
        outputs=["yield"], continuous_dims=["x"], bucket=64,
        MAP_kwargs=dict(n_restarts=2, maxiter=100),
    )
    cands, acq = gp.propose(q=1, raw_samples=128, num_restarts=4, mc_samples=64)
    x_new = float(np.atleast_1d(cands.values())[0])
    X.append(x_new)
    Y.append(experiment(x_new, rng))
    print(f"round {r + 1}: proposed x={x_new:7.2f} observed yield={Y[-1]:6.2f} best={max(Y):6.2f}")

gp.prepare_grid(resolution=120)
pred = gp.predict_grid()
fig, ax = plt.subplots(figsize=(7, 4))
gmb.ParrayPlotter(gp.grid_parray, pred).plot(ax=ax)
ax.scatter(X[:5], Y[:5], color="k", s=25, label="initial")
ax.scatter(X[5:], Y[5:], color="C1", s=35, label="proposed")
ax.axvline(63.0, color="k", ls="--", lw=1)
ax.legend()
out = os.path.join(os.path.dirname(__file__), "04_bayesian_optimization.png")
plt.savefig(out, dpi=110, bbox_inches="tight")
print(f"saved {out}, best yield {max(Y):.2f} (true optimum ≈ 38.0)")
