"""Multi-output-at-scale benchmark: matrix-free ICM logML + gradients.

Measures the streamed-Kronecker-matvec estimator
(gpx.models.multioutput_iterative.logml_value_and_grad_iterative) on the
real chip at N·T sizes where every dense multi-output path is impossible
(an NT Cholesky at N=16384, T=8 would be a 131k² matrix, 69 GB in f32).
The reference has no multi-output GP at all (its multi-sensor story is
the 8-sensor shared DLM, TemperatureDlm.scala:83-118); this benchmarks
the scalable leg gpx adds on top.

Method follows benchmarks/sampler_scale.py: two consumed warm calls
before the timed call (axon dispatch pathology — see CLAUDE.md), results
force-consumed with ``float(jnp.sum(...))``. Operands are drawn at
workload-like hyperparameters (operand VALUES change kernel timing on
this chip).

Usage (run in background on chip; compiles are minutes at N=16k):
    python benchmarks/multioutput_scale.py --n 4096  --t 4 --dense-check
    python benchmarks/multioutput_scale.py --n 16384 --t 8

Prints one JSON line: matvec ms, logML+grad wall s, CG iterations.
"""

import argparse
import json
import sys
import time

import jax

if "--cpu" in sys.argv:
    # config route, NOT the JAX_PLATFORMS env var: with the axon plugin
    # registered by sitecustomize, the env-var route still probes the
    # tunnel on device discovery and blocks ~25 min when it is down.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import gpx
from gpx.models import multioutput as mo
from gpx.models.multioutput_iterative import (
    kron_matvec,
    logml_value_and_grad_iterative,
)


def make_problem(n: int, t: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(-10.0, 10.0, n))[:, None],
                    jnp.float32)
    w = jnp.asarray(rng.normal(size=(t, 2)) * 0.6, jnp.float32)
    params = mo.IcmParams(
        kernel=gpx.se(2.0, 2.0),
        w=w,
        kappa=jnp.asarray(np.full(t, 0.3), jnp.float32),
        noise=jnp.asarray(0.5, jnp.float32),
    )
    # workload-like Y: per-output smooth signal + noise (cheap; avoids the
    # dense draw, which is exactly what this regime cannot afford)
    phase = rng.uniform(0.0, 2.0, t)
    y = (3.0 * np.sin(0.7 * np.asarray(x) + phase[None, :])
         + 0.5 * rng.normal(size=(n, t)))
    return params, x, jnp.asarray(y, jnp.float32)


def timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    float(sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(out)
              if jnp.issubdtype(v.dtype, jnp.floating)))
    return time.perf_counter() - t0, out


def run(args):
    params, x, y = make_problem(args.n, args.t, args.seed)
    nt = args.n * args.t

    # --- raw streamed Kronecker matvec on the CG right-hand-side batch ---
    mv = kron_matvec(params, x, nugget=1e-5)
    vb = jnp.asarray(
        np.random.default_rng(1).normal(size=(nt, args.n_probes + 1)),
        jnp.float32,
    )
    mv_j = jax.jit(mv)
    wall_mv_compile, _ = timed(mv_j, vb)
    timed(mv_j, vb)                       # second consumed warm call
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = mv_j(vb)
    float(jnp.sum(out))
    ms_matvec = (time.perf_counter() - t0) / reps * 1e3

    # --- full logML value + every-hyperparameter gradient ---
    def estimator(p, key):
        return logml_value_and_grad_iterative(
            p, x, y, key,
            n_probes=args.n_probes,
            lanczos_iters=args.lanczos_iters,
            cg_tol=args.cg_tol,
            cg_max_iters=args.cg_max_iters,
            precond_rank=args.precond_rank,
        )

    est_j = jax.jit(estimator)
    keys = jax.random.split(jax.random.PRNGKey(args.seed), 3)
    wall_compile, _ = timed(est_j, params, keys[0])
    wall_warm, _ = timed(est_j, params, keys[1])
    wall, res = timed(est_j, params, keys[2])

    out = {
        "n": args.n,
        "t": args.t,
        "nt": nt,
        "n_probes": args.n_probes,
        "precond_rank": args.precond_rank,
        "cg_iters": int(res.cg_iters),
        "cg_converged": bool(res.cg_converged),
        "logml": float(res.value),
        "ms_matvec_batch": round(ms_matvec, 2),
        "logml_grad_wall_s": round(wall, 3),
        "wall_compile_s": round(wall_compile, 1),
        "wall_warm_s": round(wall_warm, 3),
        "matvec_compile_s": round(wall_mv_compile, 1),
    }
    if args.dense_check:
        dense = float(mo.log_marginal_likelihood(params, x, y))
        out["logml_dense"] = round(dense, 3)
        out["logml_abs_err"] = round(abs(dense - out["logml"]), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--t", type=int, default=4)
    ap.add_argument("--n-probes", type=int, default=16)
    ap.add_argument("--lanczos-iters", type=int, default=32)
    ap.add_argument("--cg-tol", type=float, default=1e-5)
    ap.add_argument("--cg-max-iters", type=int, default=600)
    ap.add_argument("--precond-rank", type=int, default=0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--dense-check", action="store_true",
        help="also run the dense Kronecker logML (O(N^3) eigh — small N "
        "only) and print the absolute error",
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (smoke-testing the harness off-chip)",
    )
    run(ap.parse_args())
