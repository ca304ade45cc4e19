"""BASELINE config 1: mpg-style quickstart — 1-D single-output RBF GP.

Full user path (DataSet → GP.fit → prepare_grid → predict_grid) on the
bundled cars dataset. Prints one JSON line with steady-state wall-clock.
Runs on any backend (CPU included).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import gumbi_tpu as gmb  # noqa: E402


def run():
    df = gmb.data.cars()
    ds = gmb.DataSet(
        df, outputs=["mpg", "acceleration"], log_vars=["mpg", "acceleration", "horsepower"]
    )
    gp = gmb.GP(ds)
    gp.fit(
        outputs=["mpg"],
        continuous_dims=["horsepower"],
        MAP_kwargs=dict(n_restarts=4, maxiter=200),
    )
    gp.prepare_grid()
    y = gp.predict_grid()
    return y


def main():
    t0 = time.time()
    run()
    print(f"[bench_quickstart] compile+first {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    run()
    steady = time.time() - t0
    print(
        json.dumps(
            {
                "metric": "mpg quickstart fit+predict_grid (392 pts, 1-D RBF)",
                "value": round(steady, 3),
                "unit": "s",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
