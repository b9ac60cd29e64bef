"""Grid-GP-at-scale benchmark: EXACT logML + gradient on huge lattices.

The separable-kernel Kronecker identity (gpx.models.gridgp) makes exact
GP inference at N = prod n_i run on per-axis eigh + MXU tensor
contractions. A 4096 x 64 lattice is N = 262,144 points — far beyond any
dense path (the dense Gram alone would be 275 GB) — and the dominant
costs are one 4096-eigh and a few (4096, 4096) x (4096, 64·…) matmuls.

Method follows benchmarks/sampler_scale.py: two consumed warm calls
before the timed call (axon dispatch pathology — see CLAUDE.md).

Usage (chip; first compile is minutes):
    python benchmarks/grid_scale.py --n1 4096 --n2 64
    python benchmarks/grid_scale.py --n1 4096 --n2 64 --grad
    python benchmarks/grid_scale.py --cpu --n1 256 --n2 8   # smoke

Prints one JSON line: logML wall ms, optional logML+grad wall ms.
"""

import argparse
import json
import sys
import time

import jax

if "--cpu" in sys.argv:
    # config route, NOT the JAX_PLATFORMS env var (see CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import gpx
from gpx.models import gridgp


def make_problem(n1: int, n2: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    axes = [
        jnp.asarray(np.sort(rng.uniform(-10, 10, n1))[:, None], jnp.float32),
        jnp.asarray(rng.uniform(-2, 2, size=(n2, 2)), jnp.float32),
    ]
    p = gridgp.grid([gpx.se(2.0, 2.0), gpx.matern(1.0, 1.5, 1.0)],
                    noise=0.5)
    y = jnp.asarray(
        3.0 * np.sin(0.7 * np.asarray(axes[0]))
        + 0.5 * rng.normal(size=(n1, n2)),
        jnp.float32,
    )
    return p, axes, y


def timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    float(sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(out)))
    return time.perf_counter() - t0, out


def run(args):
    p, axes, y = make_problem(args.n1, args.n2, args.seed)
    n = args.n1 * args.n2

    val_fn = jax.jit(
        lambda pp, yy: gridgp.log_marginal_likelihood(pp, axes, yy)
    )
    wall_compile, _ = timed(val_fn, p, y)
    timed(val_fn, p, y)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        v = val_fn(p, y)
    float(v)
    ms_logml = (time.perf_counter() - t0) / reps * 1e3

    out = {
        "n1": args.n1,
        "n2": args.n2,
        "n": n,
        "logml": float(v),
        "ms_logml": round(ms_logml, 2),
        "wall_compile_s": round(wall_compile, 1),
    }

    if args.grad:
        vg_fn = jax.jit(jax.value_and_grad(
            lambda pp: gridgp.log_marginal_likelihood(pp, axes, y)
        ))
        wall_gc, _ = timed(vg_fn, p)
        timed(vg_fn, p)
        t0 = time.perf_counter()
        for _ in range(reps):
            gv, grads = vg_fn(p)
        float(gv)
        float(sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads)))
        out["ms_logml_grad"] = round(
            (time.perf_counter() - t0) / reps * 1e3, 2
        )
        out["grad_compile_s"] = round(wall_gc, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n1", type=int, default=4096)
    ap.add_argument("--n2", type=int, default=64)
    ap.add_argument("--grad", action="store_true",
                    help="also time logML + full hyperparameter gradient "
                    "(autodiff through the per-axis eigh)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke-test off-chip)")
    run(ap.parse_args())
