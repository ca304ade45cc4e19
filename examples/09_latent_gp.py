"""Latent GP tutorial (reference docs' Latent_GP example).

Mirrors /root/reference/docs/source/notebooks/examples/Latent_GP.pct.py with
the TPU-native engine:

1. Draw a ground-truth function from a known Matern52 GP and observe it
   noisily.
2. MAP fit + joint posterior *function draws* over the grid — the analog of
   the reference's `gp.conditional` + `pm.sample_posterior_predictive`.
3. Full-Bayes regression: HMC over the hyperparameter posterior
   (`GP.sample`, the analog of `build_latent` + `pm.sample` — with a
   Gaussian likelihood the latent field is analytic, so sampling the
   hyperparameters is the whole posterior), then function draws integrated
   over the trace (`draw_grid_samples(source=trace)`).
4. Summarize draws as an uparray (μ, σ²) like the notebook's closing cell.

Run: python examples/09_latent_gp.py
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

# --- 1. Ground truth drawn from a known GP (ref notebook cells 1-3) -------
rng = np.random.default_rng(2022)
n = 120
X = np.sort(rng.uniform(0, 10, n))
ls_true, eta_true, sigma_true = 1.2, 2.0, 0.4

r = np.abs(X[:, None] - X[None, :]) / ls_true
K = eta_true**2 * (1 + np.sqrt(5) * r + 5 * r**2 / 3) * np.exp(-np.sqrt(5) * r)
f_true = np.linalg.cholesky(K + 1e-9 * np.eye(n)) @ rng.normal(size=n)
y = f_true + sigma_true * rng.normal(size=n)

ds = gmb.DataSet(pd.DataFrame({"X": X, "y": y}), outputs=["y"])

# --- 2. MAP fit + conditional posterior draws (ref cells 4-6) -------------
gp = gmb.GP(ds)
gp.specify_model(continuous_dims=["X"])
gp.build_model(continuous_kernel="Matern52")
gp.find_MAP(n_restarts=4, maxiter=200)

gp.prepare_grid(resolution=150)
draws_map = gp.draw_grid_samples(n_samples=40, seed=0)
grid_x = gp.grid_parray["X"].values().squeeze()

# --- 3. Full-Bayes: HMC over hyperparameters + trace-integrated draws -----
trace = gp.sample(draws=300, tune=300, chains=2, seed=0)
draws_fb = gp.draw_grid_samples(n_samples=40, source=trace, seed=1)

# --- 4. uparray summary of the full-Bayes draws (ref closing cell) --------
vals_t = draws_fb.t.values()  # draws in transformed space
y_summary = gp.uparray("y", μ=vals_t.mean(0), σ2=vals_t.var(0), stdzd=False)

fig, axs = plt.subplots(1, 2, figsize=(12, 4), sharey=True)
for ax, draws, title in [
    (axs[0], draws_map, "MAP hyperparameters"),
    (axs[1], draws_fb, "full-Bayes (HMC over hyperparameters)"),
]:
    for d in draws.values():
        ax.plot(grid_x, d, color="C0", alpha=0.07)
    ax.plot(grid_x, draws.values().mean(0), color="C1", lw=2, label="draw mean")
    ax.plot(X, f_true, "k--", lw=1, label="latent truth")
    ax.scatter(X, y, s=10, alpha=0.5, color="k", label="observations")
    ax.set_title(title)
    ax.set_xlabel("X")
axs[0].set_ylabel("y")
axs[0].legend(loc="lower left", fontsize=8)

pp = gmb.ParrayPlotter(gp.grid_parray["X"], y_summary)
pp.plot(ax=axs[1].inset_axes([0.65, 0.72, 0.33, 0.26]))

out = os.path.join(os.path.dirname(__file__), "09_latent_gp.png")
plt.savefig(out, dpi=110, bbox_inches="tight")
# The MAP lengthscale lives in standardized space; scale by σ_X for natural units.
ls_nat = float(np.asarray(gp.MAP["ls_total"]).squeeze()) * np.sqrt(gp.stdzr["X"]["σ2"])
print(
    f"saved {out} | MAP ls={ls_nat:.2f} (true {ls_true}) | "
    f"trace keys {sorted(k for k in trace if not k.startswith('_'))}"
)
