"""Tour of the structured-array layer (reference getting_started notebook).

The unit-aware currency of the framework (reference
docs/source/notebooks/getting_started/introduction.pct.py): a Standardizer
holding transform + moment metadata, parrays carrying values through
natural/transformed/standardized spaces, uparrays propagating uncertainty
with log-normal semantics, and mvuparrays holding correlated multi-output
predictions. No GP fitting — pure array mechanics.

Run: python examples/07_arrays_tour.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

import gumbi_tpu as gmb

# --- Standardizer: transform registry + population moments per variable
stdzr = gmb.Standardizer(
    c={"μ": 0.0, "σ2": 1.0},
    d={"μ": -0.3, "σ2": 0.1},
    log_vars=["d"],
)
print("d in natural space 0.5 → z:", stdzr.stdz("d", 0.5))
print("... and back:", stdzr.unstdz("d", stdzr.stdz("d", 0.5)))

# --- parray: named layers + .z / .t views
pa = gmb.parray(d=np.linspace(0.1, 2.0, 5), stdzr=stdzr)
print("parray natural:", pa.values())
print("parray z-space:", pa.z.values())

# --- uarray arithmetic: first-order uncertainty propagation
ua = gmb.uarray("y", μ=np.array([1.0, 2.0]), σ2=np.array([0.1, 0.2]))
ub = gmb.uarray("y", μ=np.array([0.5, 0.5]), σ2=np.array([0.05, 0.05]))
print("ua+ub:", (ua + ub).μ, (ua + ub).σ2)  # variances add

# --- uparray: log-normal semantics (μ, σ2 in natural space, math in t-space)
up = gmb.uparray("d", μ=np.array([0.4, 0.6, 0.9]), σ2=np.array([0.05, 0.05, 0.1]), stdzr=stdzr)
print("uparray mean (t-space weighting):", up.mean().μ)
print("95% natural-space interval:", up.dist.ppf(0.025), up.dist.ppf(0.975))

# --- mvuparray: joint outputs with correlation; Mahalanobis outlier test
cor = np.array([[1.0, 0.6], [0.6, 1.0]])
mvup = gmb.mvuparray(
    gmb.uparray("c", μ=np.array(0.1), σ2=np.array(0.04), stdzr=stdzr),
    gmb.uparray("d", μ=np.array(0.5), σ2=np.array(0.01), stdzr=stdzr),
    cor=cor,
)
obs = mvup.parray(c=0.2, d=0.6)
print("joint cdf at (0.2, 0.6):", mvup.dist.cdf(obs))
print("outlier p-value:", mvup.outlier_pval(obs))
draws = mvup.dist.rvs(2000, random_state=1)  # correlated parray draws
c_z = draws.get("c").z.values()
d_z = draws.get("d").z.values()
print("empirical corr of draws:", np.round(np.corrcoef(c_z, d_z)[0, 1], 2))

# --- ParrayPlotter: same data, three spaces, ticks relabeled
fig, axs = plt.subplots(1, 3, figsize=(11, 3))
x = gmb.parray(d=np.linspace(0.1, 2.0, 50), stdzr=stdzr)
yu = gmb.uparray(
    "d", μ=np.linspace(0.2, 1.5, 50), σ2=np.full(50, 0.02), stdzr=stdzr
)
for ax, (x_scale, y_scale) in zip(
    axs, [("natural", "natural"), ("standardized", "natural"), ("standardized", "standardized")]
):
    gmb.ParrayPlotter(x, yu, x_scale=x_scale, y_scale=y_scale).plot(ax=ax)
    ax.set_title(f"x:{x_scale[:5]} y:{y_scale[:5]}")
out = os.path.join(os.path.dirname(__file__), "07_arrays_tour.png")
plt.savefig(out, dpi=110, bbox_inches="tight")
print(f"saved {out}")
