"""Simple regression: the mpg quickstart (reference docs' Simple_Regression).

Fits a 1-D log-normal GP and plots the posterior with a 95% CI band in
natural units. Run: python examples/01_simple_regression.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

import gumbi_tpu as gmb

cars = gmb.data.cars()
ds = gmb.DataSet(
    cars, outputs=["mpg", "acceleration"], log_vars=["mpg", "acceleration", "horsepower"]
)

gp = gmb.GP(ds).fit(
    outputs=["mpg"], continuous_dims=["horsepower"],
    MAP_kwargs=dict(n_restarts=4, maxiter=200),
)

X = gp.prepare_grid()
y = gp.predict_grid()

ax = gmb.ParrayPlotter(X, y).plot()
ax.scatter(cars.horsepower, cars.mpg, s=6, alpha=0.35, color="k")
out = os.path.join(os.path.dirname(__file__), "01_simple_regression.png")
plt.savefig(out, dpi=110, bbox_inches="tight")
print(f"saved {out}")

# Posterior quantiles in natural units
print("95% interval at grid start:", y[0].dist.ppf(0.025), "→", y[0].dist.ppf(0.975))
