"""In-situ A/B of the chol_inv value layouts inside the fused N=16k
logML+grad program (round 4).

Standalone, the flat panel sweep beats the binary recursion by ~14 ms
(benchmarks/panel_lookahead_ab.py: 83.9 vs 98.1 ms/call at N=16384). The
round-3 leaf A/Bs taught that standalone wins can invert in situ (XLA
overlaps the factorization with the Gram/gradient stages differently), so
the default-layout decision is made HERE: the full
``gp.logml_value_and_grad`` program with ``DEFAULT_LAYOUT`` flipped
between compiles.

Usage: python -u benchmarks/panel_insitu_ab.py [N]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import gpx
from gpx.models import gp
from gpx.ops import pallas_chol


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        np.sort(rng.uniform(-10, 10, size=n)).astype(np.float32)
    ).reshape(-1, 1)
    y = jnp.asarray(3.0 * np.sin(0.7 * np.asarray(x[:, 0])) +
                    0.5 * rng.standard_normal(n).astype(np.float32))
    params = gpx.Parameters(
        mean=gpx.zero(), kernel=gpx.se(3.0, 5.5) + gpx.white(0.5)
    )

    results = {}
    for layout in ("recursion", "panel"):
        pallas_chol.DEFAULT_LAYOUT = layout
        fn = jax.jit(lambda p: gp.logml_value_and_grad(p, x, y))
        t0 = time.time()
        v, g = fn(params)
        jax.block_until_ready(v)
        compile_s = time.time() - t0
        v, g = fn(params)
        float(v)  # consumed warm call
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            v, g = fn(params)
        leaves = jax.tree_util.tree_leaves(g)
        float(v + sum(jnp.sum(le) for le in leaves))
        ms = (time.time() - t0) / reps * 1e3
        results[layout] = (ms, float(v), [float(le) for le in leaves])
        print(f"{layout}: {ms:.1f} ms/eval (compile {compile_s:.0f}s) "
              f"logML={float(v):.3f}")

    (ms_r, v_r, g_r), (ms_p, v_p, g_p) = (results["recursion"],
                                          results["panel"])
    gerr = max(abs(a - b) / max(abs(a), 1e-30) for a, b in zip(g_r, g_p))
    print(f"delta: {ms_r - ms_p:+.1f} ms  |dlogML|={abs(v_r - v_p):.3g}  "
          f"max grad rel diff={gerr:.3g}")


if __name__ == "__main__":
    main()
