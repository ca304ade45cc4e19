"""Heteroskedastic inputs: input-dependent observation noise.

A capability the reference declares NotImplemented in BOTH backends
(ref gumbi/regression/pymc/GP.py:518-519, botorch/GP.py:142-143):
``GP.fit(heteroskedastic_inputs=True)`` runs the most-likely heteroskedastic
GP (Kersting et al. 2007) — a second GP over log expected squared residuals
learns where the data is noisy, and the predictive band follows.

Run: python examples/08_heteroskedastic_inputs.py
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

# A smooth signal whose noise grows smoothly with x
rng = np.random.default_rng(3)
x = np.sort(rng.uniform(-2, 2, 300))
f = np.sin(1.3 * x) + 0.3 * x
sd = 0.05 + 0.35 / (1 + np.exp(-3 * x))  # quiet left → loud right
df = pd.DataFrame({"x": x, "y": f + rng.normal(0, sd)})
ds = gmb.DataSet(df, outputs=["y"])

fits = {
    "homoskedastic": gmb.GP(ds).fit(
        outputs=["y"], continuous_dims=["x"],
        MAP_kwargs=dict(n_restarts=4, maxiter=200),
    ),
    "heteroskedastic_inputs=True": gmb.GP(ds).fit(
        outputs=["y"], continuous_dims=["x"],
        heteroskedastic_inputs=True,
        MAP_kwargs=dict(n_restarts=4, maxiter=200, het_iters=2),
    ),
}

fig, axes = plt.subplots(1, 2, figsize=(11, 4), sharey=True)
for ax, (title, gp) in zip(axes, fits.items()):
    X = gp.prepare_grid()
    y = gp.predict_grid()  # with observation noise: the band tracks σ(x)
    gmb.ParrayPlotter(X, y).plot(ax=ax)
    ax.scatter(df["x"], df["y"], s=6, alpha=0.35, color="k")
    ax.plot(x, f, lw=1, ls="--", color="C1", label="truth")
    ax.set_title(title)
    ax.legend(loc="upper left")

out = os.path.join(os.path.dirname(__file__), "08_heteroskedastic_inputs.png")
plt.savefig(out, dpi=110, bbox_inches="tight")
print(f"saved {out}")

# The recovered noise profile vs the generating one
gp = fits["heteroskedastic_inputs=True"]
pts = gmb.parray(x=np.linspace(-1.8, 1.8, 9), stdzr=ds.stdzr)
noisy = gp.predict_points(pts, with_noise=True)
latent = gp.predict_points(pts, with_noise=False)
noise_sd = np.sqrt(np.asarray(noisy.σ2) - np.asarray(latent.σ2))
true_sd = 0.05 + 0.35 / (1 + np.exp(-3 * np.linspace(-1.8, 1.8, 9)))
for xi, rec, tru in zip(np.linspace(-1.8, 1.8, 9), noise_sd, true_sd):
    print(f"x={xi:+.1f}  recovered noise sd {rec:.3f}  true {tru:.3f}")
