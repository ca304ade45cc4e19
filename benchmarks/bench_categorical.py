"""BASELINE config 2: multi-input GP with a categorical product kernel.

mpg ~ horsepower + weight + displacement with `origin` as a coregion
dimension, through the full user path. One JSON line.
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
        df,
        outputs=["mpg", "acceleration"],
        log_vars=["mpg", "acceleration", "horsepower", "weight", "displacement"],
    )
    gp = gmb.GP(ds)
    gp.fit(
        outputs=["mpg"],
        continuous_dims=["horsepower", "weight", "displacement"],
        categorical_dims=["origin"],
        MAP_kwargs=dict(n_restarts=4, maxiter=200),
    )
    gp.prepare_grid(resolution=25)
    return gp.predict_grid(categorical_levels={"origin": "usa"})


def main():
    t0 = time.time()
    run()
    print(f"[bench_categorical] compile+first {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    run()
    steady = time.time() - t0
    print(
        json.dumps(
            {
                "metric": "multi-input + categorical product-kernel GP fit+predict",
                "value": round(steady, 3),
                "unit": "s",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
