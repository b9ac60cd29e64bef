"""North-star benchmark: N=16k exact-GP logML + hyperparameter gradient.

BASELINE.md: target < 50 ms/eval on one TPU v5p chip (this environment runs
a single v5e/lite chip — weaker MXU; the number is reported as measured).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` = target_ms / measured_ms (>1.0 beats the target).
"""

import json
import os
import time

N = int(os.environ.get("GPX_BENCH_N", 16384))
TARGET_MS = 50.0
REPS = int(os.environ.get("GPX_BENCH_REPS", 5))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import gpx
    from gpx.models import gp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-10.0, 10.0, size=(N, 1)), jnp.float32)
    params = gpx.Parameters(
        mean=gpx.zero(), kernel=gpx.se(3.0, 5.5) + gpx.white(0.5)
    )
    y = jnp.asarray(rng.normal(size=N), jnp.float32)

    f = jax.jit(lambda p: gp.logml_value_and_grad(p, x, y))
    out = f(params)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(params)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / REPS * 1e3

    value, grads = out
    assert bool(jnp.isfinite(value)), "non-finite logml"
    assert all(
        bool(jnp.isfinite(g).all()) for g in jax.tree_util.tree_leaves(grads)
    ), "non-finite grads"

    print(json.dumps({
        "metric": f"exact_gp_logml_grad_n{N}",
        "value": round(ms, 2),
        "unit": "ms/eval",
        "vs_baseline": round(TARGET_MS / ms, 4),
    }))


if __name__ == "__main__":
    main()
