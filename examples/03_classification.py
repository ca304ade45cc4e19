"""GP classification (reference docs' Classification example).

Latent GP + Bernoulli likelihood via Laplace approximation; plots the
posterior class probability with draws, plus the full-Bayes probability
surface from elliptical-slice sampling over the joint (latent field,
hyperparameter) posterior (GPC.sample(latent=True)).
Run: python examples/03_classification.py
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

rng = np.random.default_rng(0)
x = rng.uniform(-3, 3, 150)
p_true = 1 / (1 + np.exp(-2.5 * np.sin(1.2 * x)))
labels = (rng.uniform(size=150) < p_true).astype(float)
ds = gmb.DataSet(pd.DataFrame({"x": x, "hit": labels}), outputs=["hit"])

gpc = gmb.GPC(ds).fit(
    outputs=["hit"], continuous_dims=["x"], heteroskedastic_outputs=False,
    MAP_kwargs=dict(n_restarts=2, maxiter=150),
)

gpc.prepare_grid(resolution=120)
proba = gpc.predict_grid_proba()
draws = gpc.draw_grid_samples(n_samples=30)
grid_x = gpc.grid_parray["x"].values().squeeze()

# Full-Bayes: ESS over whitened latents + adaptive MH over hyperparameters,
# class probabilities integrated over the joint posterior draws.
trace = gpc.sample(latent=True, draws=300, tune=300, chains=2, seed=0)
pts = gpc.grid_points
proba_fb = gpc.predict_proba(pts, source=trace, max_draws=64)

fig, ax = plt.subplots(figsize=(7, 4))
for d in draws.values():
    ax.plot(grid_x, d, color="C0", alpha=0.08)
ax.plot(grid_x, proba, color="C1", lw=2, label="P(hit=1), Laplace")
ax.plot(grid_x, proba_fb, color="C3", lw=2, ls=":", label="P(hit=1), full-Bayes (ESS)")
ax.plot(grid_x, 1 / (1 + np.exp(-2.5 * np.sin(1.2 * grid_x))), "k--", lw=1, label="truth")
ax.scatter(x, labels, s=8, alpha=0.4, color="k")
ax.legend()
out = os.path.join(os.path.dirname(__file__), "03_classification.png")
plt.savefig(out, dpi=110, bbox_inches="tight")
print(f"saved {out}")
