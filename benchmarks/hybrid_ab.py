"""Stochastic-exact hybrid vs exact logML+grad A/B on chip (round 4,
VERDICT Next-3; GPyTorch-mBCG analogue, PAPERS.md).

Times gp.logml_value_and_grad(method="hybrid") against the exact fused
path at N=16384 and reports per-component gradient error vs the exact
gradients, closing the <50 ms north-star question either way.

Usage: python benchmarks/hybrid_ab.py [N] [probes ...]
       (defaults: N=16384, probes 32 64 128)
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
    # two consumed warm calls before timing (ROADMAP-24 dispatch pathology)
    float(jnp.sum(out[0]))
    out = fn(arg)
    float(jnp.sum(out[0]))
    t0 = time.time()
    for _ in range(reps):
        out = fn(arg)
    float(jnp.sum(out[0]))  # forced consumer (CLAUDE.md)
    return (time.time() - t0) / reps


def main():
    args = [int(a) for a in sys.argv[1:]]
    n = args[0] if args else 16384
    probe_counts = args[1:] or [32, 64, 128]

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        np.sort(rng.uniform(-10, 10, size=(n, 1)), axis=0), jnp.float32
    )
    y = jnp.asarray(rng.normal(size=n), jnp.float32)
    params = gpx.Parameters(
        mean=gpx.zero(), kernel=gpx.se(3.0, 5.5) + gpx.white(0.5)
    )

    exact_fn = jax.jit(lambda p: gp.logml_value_and_grad(p, x, y))
    t0 = time.time()
    v_e, g_e = exact_fn(params)
    jax.block_until_ready(v_e)
    print(f"exact: compile {time.time() - t0:.0f}s")
    exact_ms = time_calls(exact_fn, params) * 1e3
    ge = np.asarray(
        [float(l) for l in jax.tree_util.tree_leaves(g_e.kernel)]
    )
    print(f"exact: {exact_ms:.1f} ms/eval  logml={float(v_e):.3f}")
    print("exact grads: " + " ".join(f"{g:+.6g}" for g in ge))

    for s in probe_counts:
        hyb_fn = jax.jit(
            lambda p: gp.logml_value_and_grad(p, x, y, method="hybrid",
                                              probes=s)
        )
        t0 = time.time()
        v_h, g_h = hyb_fn(params)
        jax.block_until_ready(v_h)
        compile_s = time.time() - t0
        hyb_ms = time_calls(hyb_fn, params) * 1e3
        gh = np.asarray(
            [float(l) for l in jax.tree_util.tree_leaves(g_h.kernel)]
        )
        rel = np.abs(gh - ge) / np.maximum(np.abs(ge), 1e-12)
        print(
            f"hybrid s={s}: {hyb_ms:.1f} ms/eval (compile {compile_s:.0f}s) "
            f"logml={float(v_h):.3f} (|dv|={abs(float(v_h - v_e)):.3g})"
        )
        print(
            f"  grads: " + " ".join(f"{g:+.6g}" for g in gh)
            + f"  max-rel-err {rel.max():.3g}"
        )


if __name__ == "__main__":
    main()
