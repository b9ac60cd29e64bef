"""Chip A/B: deflated (Hutch++/pivoted-Cholesky control-variate) hybrid
logML gradient vs plain hybrid vs exact (round 5, VERDICT Next-1).

The round-4 hybrid's blocker was probe noise on the SMOOTH hyperparameter
gradients (10-30% relative at usable probe counts — PERF.md). The deflated
estimator computes the K^{-1} contraction exactly on a rank-k basis of the
smooth range (pivoted Cholesky of the White-free kernel part + QR) and
probes only the doubly-deflated remainder (gp._hybrid_deflation).

Measures, at N (default 16384), on the real chip:
* exact fused path: ms/eval (5-rep loop) + reference grads/value;
* hybrid plain (s=64, deflate=0) and deflated variants: ms/eval + per-
  component gradient errors vs exact + value error.

Usage: python benchmarks/hybrid_deflate_ab.py [N]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import gpx
from gpx.models import gp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
REPS = 5


def timeit(f, *args):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS * 1e3, out


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-10.0, 10.0, size=(N, 1)), jnp.float32)
    params = gpx.Parameters(
        mean=gpx.zero(), kernel=gpx.se(3.0, 5.5) + gpx.white(0.5)
    )
    y = jnp.asarray(rng.normal(size=N), jnp.float32)

    ref_env = os.environ.get("GPX_AB_REF")  # "[value, g0, g1, ...]" skips
    if ref_env:                             # the ~6-min exact compile
        import json as _json

        ref = _json.loads(ref_env)
        v_e, ge = ref[0], ref[1:]
        print(f"exact (cached ref): value={v_e:.4f} grads={ge}")
    else:
        t0 = time.time()
        f_exact = jax.jit(lambda p: gp.logml_value_and_grad(p, x, y))
        ms_e, (v_e, g_e) = timeit(f_exact, params)
        print(f"exact: {ms_e:.1f} ms/eval (compile {time.time()-t0:.0f}s) "
              f"value={float(v_e):.4f}")
        ge = [float(l) for l in jax.tree_util.tree_leaves(g_e.kernel)]
        print("  grads (h, sigma, white):", ge)
    v_e = jnp.float32(v_e)

    # (probes, deflate, basis, refine_y)
    import json as _json
    cfg_env = os.environ.get("GPX_AB_CONFIGS")
    if cfg_env:
        configs = [tuple(c) for c in _json.loads(cfg_env)]
    else:
        configs = [
            (64, 0, "pivoted", True),
            (32, 128, "pivoted", True),
            (32, 128, "landmarks", True),
            (32, 128, "pivoted", False),
            (32, 64, "landmarks", True),
            (32, 64, "pivoted", True),
        ]
    for s, k, basis, refine in configs:
        os.environ["GPX_DEFLATE_BASIS"] = basis
        os.environ["GPX_DEFLATE_REFINE"] = "1" if refine else "0"
        t0 = time.time()
        f_h = jax.jit(lambda p, kb, s=s, k=k: gp.logml_value_and_grad(
            p, x, y, method="hybrid", probes=s,
            probe_key=kb, deflate=k))
        ms_h, (v_h, g_h) = timeit(f_h, params, jax.random.PRNGKey(0))
        print(f"hybrid s={s:3d} k={k:3d} {basis:9s} refine={int(refine)}: "
              f"{ms_h:.1f} ms/eval (compile {time.time()-t0:.0f}s) "
              f"value_err={float(v_h)-float(v_e):+.4f}")
        # error over 3 probe draws (same compiled program: the key is an
        # input) — single-draw errors scatter within the probe envelope
        errs = []
        for seed in range(3):
            _, g_h = f_h(params, jax.random.PRNGKey(seed))
            gh = [float(l) for l in jax.tree_util.tree_leaves(g_h.kernel)]
            errs.append([abs(a - b) for a, b in zip(ge, gh)])
        worst = [max(e[i] for e in errs) for i in range(len(ge))]
        rel = [w / max(abs(a), 1e-12) for w, a in zip(worst, ge)]
        print(f"  worst-of-3 abs_err={['%.3e' % e for e in worst]} "
              f"rel_err={['%.3e' % r for r in rel]}")


if __name__ == "__main__":
    main()
