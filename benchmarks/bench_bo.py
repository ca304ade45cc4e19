"""BASELINE config 5: 20-round sequential lab-style BO campaign.

Maximize a smooth 1-D objective with qLogNEI: fit → propose(q=1) → observe →
refit, 20 rounds, all acquisition math on device. Prints one JSON line with
total campaign wall-clock and the achieved best vs the true optimum.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GUMBI_TPU_X64", "0")  # f32 on accelerators, like bench.py

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

import gumbi_tpu as gmb  # noqa: E402

ROUNDS = int(os.environ.get("BENCH_BO_ROUNDS", 20))


def objective(x):
    return np.exp(-0.5 * ((x - 63.0) / 18.0) ** 2) * 30.0 + 8.0  # peak at x*=63


def main():
    rng = np.random.default_rng(0)
    X = list(rng.uniform(20, 200, 5))
    Y = [objective(x) + rng.normal(0, 0.3) for x in X]

    t0 = time.time()
    best_hist = []
    for _ in range(ROUNDS):
        df = pd.DataFrame({"x": X, "y": Y})
        ds = gmb.DataSet(df, outputs=["y"], log_vars=["y", "x"])
        gp = gmb.GP(ds)
        # bucket padding: rounds 1..20 grow the dataset 5→25 points, and the
        # bucket keeps the fit program's shapes static so the WHOLE campaign
        # compiles the fit exactly once (the lab-loop feature, GP.fit docs);
        # the padded proposal baseline does the same for the acquisition.
        gp.fit(
            outputs=["y"],
            continuous_dims=["x"],
            bucket=32,
            MAP_kwargs=dict(n_restarts=2, maxiter=100),
        )
        cands, _ = gp.propose(q=1, raw_samples=128, num_restarts=4, mc_samples=64)
        x_new = float(np.atleast_1d(cands.values())[0])
        X.append(x_new)
        Y.append(objective(x_new) + rng.normal(0, 0.3))
        best_hist.append(max(Y))
    total = time.time() - t0

    true_best = objective(63.0)
    regret = float(true_best - max(Y))
    print(
        f"[bench_bo] best found {max(Y):.2f} (true {true_best:.2f}, regret {regret:.3f})",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"{ROUNDS}-round qLogNEI BO campaign (fit+propose per round)",
                "value": round(total, 2),
                "unit": "s",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
