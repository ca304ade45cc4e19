"""Correlated multi-output regression (reference docs' Multioutput example).

Two outputs share a coregionalized GP; the joint prediction carries a learned
cross-output correlation, and single points expose a joint distribution for
correlated sampling. Run: python examples/02_multioutput.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

import gumbi_tpu as gmb

cars = gmb.data.cars()
ds = gmb.DataSet(
    cars, outputs=["mpg", "acceleration"], log_vars=["mpg", "acceleration", "horsepower"]
)

gp = gmb.GP(ds).fit(
    outputs=["mpg", "acceleration"], continuous_dims=["horsepower"],
    MAP_kwargs=dict(n_restarts=4, maxiter=150),
)
print("structure:", gp._structure)  # Kronecker fast path auto-selected

X = gp.prepare_grid()
Y = gp.predict_grid()
print("learned output correlation:\n", np.round(Y.cor, 3))

fig, axs = plt.subplots(2, 1, figsize=(6, 7), sharex=True)
for ax, output in zip(axs, gp.outputs):
    gmb.ParrayPlotter(X, Y.get(output)).plot(ax=ax)
    ax.scatter(cars.horsepower, cars[output], s=6, alpha=0.3, color="k")
out = os.path.join(os.path.dirname(__file__), "02_multioutput.png")
plt.savefig(out, dpi=110, bbox_inches="tight")
print(f"saved {out}")

# Correlated joint samples at one point
point = Y[40]
draws = point.dist.rvs(500, random_state=0)
print("sampled joint corr:", np.round(np.corrcoef(draws["mpg"].values(), draws["acceleration"].values())[0, 1], 2))
