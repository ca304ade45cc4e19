"""Cars dataset tour: categorical coregions, conditional slices, CV.

Mirrors the reference's Cars_Dataset / Cars_Dataset_Botorch notebooks
(reference docs/source/notebooks/examples/Cars_Dataset*.pct.py): a product
kernel over a string categorical dim ('origin'), per-level surfaces,
a conditional-prediction slice, and a unit-grouped cross-validation split.
Also contrasts the Hadamard (learned cross-output coregion) and Independent
(model-list) multitask structures on the same data.

Run: python examples/05_cars_categorical.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

import gumbi_tpu as gmb

cars = gmb.data.cars(n=150, seed=3)
ds = gmb.DataSet(
    cars, outputs=["mpg", "acceleration"], log_vars=["mpg", "acceleration", "horsepower"]
)

# --- Categorical coregion: one GP whose kernel is K_cont(horsepower) × B[origin]
gp = gmb.GP(ds).fit(
    outputs=["mpg"],
    continuous_dims=["horsepower"],
    categorical_dims=["origin"],
    MAP_kwargs=dict(n_restarts=2, maxiter=150),
)
X = gp.prepare_grid(resolution=60)

fig, axs = plt.subplots(1, 3, figsize=(12, 3.2), sharey=True)
for ax, origin in zip(axs, ["usa", "japan", "europe"]):
    y = gp.predict_grid(categorical_levels={"origin": origin})
    gmb.ParrayPlotter(X, y).plot(ax=ax)
    sub = cars[cars.origin == origin]
    ax.scatter(sub.horsepower, sub.mpg, s=6, alpha=0.4, color="k")
    ax.set_title(origin)

out = os.path.join(os.path.dirname(__file__), "05_cars_categorical.png")
plt.savefig(out, dpi=110, bbox_inches="tight")
print(f"saved {out}")

# --- Learned between-level correlation from the coregion B = W Wᵀ + diag(κ)
W, κ = gp.MAP["W_origin"], gp.MAP["κ_origin"]
B = W @ W.T + np.diag(κ)
cor = B / np.sqrt(np.outer(np.diag(B), np.diag(B)))
print("origin coregion correlation:\n", np.round(cor, 2))

# --- Additive decomposition: K = K_global(horsepower) + K_origin
# Sublevel prediction splits the fitted surface into its components — a path
# the reference declares NotImplemented (ref GP.py:841).
gp_add = gmb.GP(ds).fit(
    outputs=["mpg"],
    continuous_dims=["horsepower"],
    categorical_dims=["origin"],
    additive=True,
    MAP_kwargs=dict(n_restarts=2, maxiter=150),
)
Xa = gp_add.prepare_grid(resolution=60)
fig, axs = plt.subplots(1, 3, figsize=(12, 3.2))
for ax, (label, level) in zip(
    axs, [("total", "total"), ("shared trend (global)", "global"), ("origin offset", "origin")]
):
    y = gp_add.predict_grid(
        categorical_levels={"origin": "japan"}, additive_level=level, with_noise=False
    )
    mu = np.asarray(y.z.μ, dtype=float)
    sd = np.sqrt(np.asarray(y.z.σ2, dtype=float))
    xs = np.asarray(Xa.z.values(), dtype=float)
    ax.plot(xs, mu)
    ax.fill_between(xs, mu - 2 * sd, mu + 2 * sd, alpha=0.25)
    ax.set_title(f"{label} (z-space)")
out2 = os.path.join(os.path.dirname(__file__), "05b_additive_decomposition.png")
plt.savefig(out2, dpi=110, bbox_inches="tight")
print(f"saved {out2}")

# --- Multitask structures on both outputs
gp_h = gmb.GP(ds).fit(
    outputs=["mpg", "acceleration"],
    continuous_dims=["horsepower"],
    multitask_kernel="Hadamard",
    MAP_kwargs=dict(n_restarts=2, maxiter=150),
)
gp_i = gmb.GP(ds).fit(
    outputs=["mpg", "acceleration"],
    continuous_dims=["horsepower"],
    multitask_kernel="Independent",
    MAP_kwargs=dict(n_restarts=2, maxiter=150),
)
gp_h.prepare_grid(resolution=20)
gp_i.prepare_grid(resolution=20)
y_h = gp_h.predict_grid()
y_i = gp_i.predict_grid()
print("Hadamard learned output correlation:", np.round(np.asarray(y_h.cor)[0, 1], 3))
print("Independent output correlation (identity by construction):",
      np.round(np.asarray(y_i.cor)[0, 1], 3))

# --- Cross-validation (unit-grouped split, reference base.py:844)
cv = gp.cross_validate(n_train=100, seed=0)
print("CV test NLPD (mean):", float(np.mean(cv["test"]["NLPDs"])))
