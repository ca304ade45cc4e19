"""Multi-chip fitting and prediction through the model API.

The framework scales over a ``jax.sharding.Mesh`` with named ('restart',
'data') axes: restarts of the hyperparameter optimization run on different
chips, and for large N the Gram/Cholesky/solve chain is sharded row-block
by row-block over the 'data' axis (distributed blocked Cholesky,
O(N²/P) per-device memory — see gumbi_tpu/parallel/).

This example runs on EIGHT VIRTUAL CPU DEVICES so it works anywhere; on a
real v5e-8 slice, drop the two env lines and the same code runs over ICI.

Run: python examples/11_multichip_mesh.py
"""

import os
import sys

# Virtual 8-device CPU mesh — the flag must be set before importing jax,
# and the platform forced through the config API (some TPU plugins ignore
# the JAX_PLATFORMS env var).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

import gumbi_tpu as gmb
from gumbi_tpu.parallel import make_mesh

print("devices:", jax.devices())

cars = gmb.data.cars()
ds = gmb.DataSet(
    cars, outputs=["mpg", "acceleration"], log_vars=["mpg", "acceleration", "horsepower"]
)

# ── Restart-sharded fit: 8 L-BFGS restarts, one per device ────────────────
mesh = make_mesh(8, restart_axis=8)
gp = gmb.GP(ds)
gp.fit(
    outputs=["mpg", "acceleration"],
    continuous_dims=["horsepower"],
    MAP_kwargs=dict(n_restarts=8, maxiter=150, mesh=mesh),
)
print("restart-sharded Kronecker fit done; MAP keys:", sorted(gp.MAP)[:4], "...")

# Same fit on one device: the sharded result must match.
gp1 = gmb.GP(ds)
gp1.fit(
    outputs=["mpg", "acceleration"],
    continuous_dims=["horsepower"],
    MAP_kwargs=dict(n_restarts=8, maxiter=150),
)
# Compare the identified quantities: the optimum value and the posterior.
# (Raw coregion factors W are only identified up to rotation/sign.)
np.testing.assert_allclose(gp._neg_logp, gp1._neg_logp, rtol=1e-6)
print("sharded fit objective == single-device objective ✓")

# ── Data-sharded prediction: grid points split over the 'data' axis ───────
mesh_d = make_mesh(8, restart_axis=1)  # all 8 devices on 'data'
X = gp.prepare_grid(resolution=400)
pts = gp.grid_points
points_array, _, _ = gp._prepare_points_for_prediction(pts, output=["mpg"])
mu_sh, var_sh = gp.predict(points_array, mesh=mesh_d)
mu_1, var_1 = gp1.predict(points_array)
print(
    "sharded predict max|Δμ| vs single device:",
    float(np.max(np.abs(mu_sh - mu_1))),
)

# ── Data-sharded exact-dense fit (the large-N path) ───────────────────────
# find_MAP(mesh=..., shard_data=True) routes the Gram assembly, the blocked
# Cholesky, and the analytic gradient through psum/all_gather collectives;
# each device holds only its row block. Demonstrated here at small N — the
# same program scales to 50k+ rows on a real slice.
rng = np.random.default_rng(0)
n = 512
xs = np.sort(rng.uniform(40, 230, n))
ys = 35 * np.exp(-xs / 90) + rng.normal(0, 1.0, n) + 8
import pandas as pd

big = pd.DataFrame({"horsepower": xs, "mpg": np.maximum(ys, 1.0)})
ds_big = gmb.DataSet(big, outputs=["mpg"], log_vars=["mpg", "horsepower"])
gp_big = gmb.GP(ds_big)
gp_big.fit(
    outputs=["mpg"],
    continuous_dims=["horsepower"],
    MAP_kwargs=dict(n_restarts=4, maxiter=100, mesh=mesh_d, shard_data=True),
)
gp_ref = gmb.GP(ds_big)
gp_ref.fit(
    outputs=["mpg"],
    continuous_dims=["horsepower"],
    MAP_kwargs=dict(n_restarts=4, maxiter=100),
)
np.testing.assert_allclose(gp_big._neg_logp, gp_ref._neg_logp, rtol=1e-5)
print("data-sharded dense fit (distributed blocked Cholesky) == single-device ✓")
