"""Any-N fused-path scaling check (round 4, VERDICT Next-1).

Measures logml_value_and_grad at non-power-of-2 N on the real chip and
compares against the (N/16384)^3-scaled 16k headline: the uneven-Schur
generalization must stay within ~1.15x of cubic scaling, and the values/
gradients must match a HIGHEST/f64-grade oracle at an off-grid N.

Usage: python benchmarks/anyn_scale.py [N ...]   (default 12800 20480)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import gpx
from gpx.models import gp


def time_calls(fn, arg, reps=5):
    out = fn(arg)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(arg)
    # forced consumer: block_until_ready on Pallas outputs has returned
    # early on this platform (CLAUDE.md)
    float(jnp.sum(out[0]))
    return (time.time() - t0) / reps


def main():
    ns = [int(a) for a in sys.argv[1:]] or [12800, 20480]
    rng = np.random.default_rng(0)
    params = gpx.Parameters(
        mean=gpx.zero(), kernel=gpx.se(3.0, 5.5) + gpx.white(0.5)
    )
    base_ms = 109.5  # BENCH_r03 exact headline at N=16384
    for n in ns:
        x = jnp.asarray(
            np.sort(rng.uniform(-10, 10, size=(n, 1)), axis=0), jnp.float32
        )
        y = jnp.asarray(rng.normal(size=n), jnp.float32)
        assert gp._fused_gate(params.kernel, n)[0], n

        fn = jax.jit(lambda p: gp.logml_value_and_grad(p, x, y))
        t0 = time.time()
        v, g = fn(params)
        jax.block_until_ready(v)
        compile_s = time.time() - t0
        per = time_calls(lambda p: fn(p), params) * 1e3
        budget = base_ms * (n / 16384.0) ** 3
        print(f"N={n}: {per:.1f} ms/eval (compile {compile_s:.0f}s); "
              f"cubic-scaled budget {budget:.1f} ms -> ratio "
              f"{per / budget:.3f} (target <= ~1.15)")
        print(f"  logml={float(v):.2f}  grads=" + " ".join(
            f"{float(l):+.4g}" for l in jax.tree_util.tree_leaves(g.kernel)
        ))


if __name__ == "__main__":
    main()
