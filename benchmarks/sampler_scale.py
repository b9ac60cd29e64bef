"""Sampler-at-scale benchmark: analytic-gradient HMC/NUTS on the real chip.

Reproduces the "Sampler at scale" table in PERF.md — the production
composition ``jit(scan(kernel))`` over the custom-vjp fused analytic
gradient (the path the reference cannot reach: its samplers rebuild the
Gram and refactor with Breeze/LAPACK per proposal on one JVM core,
KernelParameters.scala:121-154 / Mcmc.scala:63-76).

Method: ``eps`` is FIXED so the dual-averaging warmup is skipped and the
timed call is pure sampling. Two consumed warm calls precede the timed
call (axon dispatch pathology otherwise dominates — see CLAUDE.md), and
the result is force-consumed with ``float(jnp.sum(...))``.

Usage (run in background on chip; compiles are minutes at N=16k):
    python benchmarks/sampler_scale.py --sampler hmc  --n 4096  --l 5
    python benchmarks/sampler_scale.py --sampler hmc  --n 16384 --l 3
    python benchmarks/sampler_scale.py --sampler nuts --n 4096
    python benchmarks/sampler_scale.py --sampler nuts --n 16384

Prints one JSON line: ms/sample, ms/leapfrog-grad, samples/s, mean depth.

``--ess`` (round 4, VERDICT Next-5) runs the accuracy-qualified variant:
data simulated FROM the model at known hyperparameters, MAP init + full
adaptive warmup on the EXACT gradient program (fast_warmup collapses the
adaptation — PERF.md round 4) + exact kept draws, then ESS/R-hat
via gpx.diagnostics and a posterior-recovery assertion (every true
hyperparameter inside the pooled central 98% interval) — ESS/sec with the
accuracy leg attached, tying the >=100x north star into one artifact:
    python benchmarks/sampler_scale.py --ess --sampler hmc --n 4096 \
        --n-samples 128 --warmup 64 --l 5
"""

import argparse
import json
import os
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
from gpx.distributions import Gamma
from gpx.infer.mcmc import sample_hmc, sample_nuts


def log_prior(p: gpx.Parameters):
    pr = Gamma(concentration=jnp.asarray(2.0), rate=jnp.asarray(0.5))
    k0, k1 = p.kernel.kernels
    return pr.logpdf(k0.h) + pr.logpdf(k0.sigma) + pr.logpdf(k1.sigma)


def make_data(n: int):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jnp.sort(jax.random.uniform(k1, (n,), minval=-10.0, maxval=10.0))
    # cheap synthetic signal — sampler throughput depends on N, not on y
    y = (
        3.0 * jnp.sin(0.7 * x)
        + 0.5 * jax.random.normal(k2, (n,))
    )
    return x.reshape(-1, 1), y


TRUE_H, TRUE_SIGMA, TRUE_NOISE = 3.0, 5.5, 0.5


def run_ess(args):
    """Accuracy-qualified ESS/sec (VERDICT Next-5): simulate y from the
    model at known hyperparameters, sample with adaptive warmup + exact
    kept draws, report min-ESS/sec and assert recovery.

    The ADAPTIVE warmup runs on the exact gradient program: fast_warmup's
    2-pass value loosening collapses dual averaging at this N (measured,
    PERF.md round 4 — accept 1.0, eps -> 0, frozen chains). Opt back into
    the known-broken config only to reproduce that measurement
    (--fast-warmup)."""
    import gpx.diagnostics as diag
    from gpx.models import gp

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jnp.sort(
        jax.random.uniform(k1, (args.n,), minval=-10.0, maxval=10.0)
    ).reshape(-1, 1)
    truth = gpx.Parameters(
        mean=gpx.zero(),
        kernel=gpx.se(TRUE_H, TRUE_SIGMA) + gpx.white(TRUE_NOISE),
    )
    y = gp.draw(k2, truth, x)

    template = gpx.Parameters(
        mean=gpx.zero(), kernel=gpx.se(2.0, 2.0) + gpx.white(1.0)
    )
    # production workflow (docs/parameter_inference.md): MAP-init the
    # chains via type-II optimization, then HMC with mass adaptation.
    # At N=4096 the posterior is so tight that template-initialized
    # chains with a unit mass matrix crawl (measured: accept 1.0,
    # R-hat > 60 after 256 adaptive warmup iters) — that is a bad
    # WORKFLOW, not a throughput number worth reporting.
    from gpx.models.optimize import optimize

    t0 = time.perf_counter()
    if args.map == "hybrid-adam":
        # Adam on the deflated hybrid objective: one value_and_grad per
        # step (no zoom-linesearch multi-eval programs — at N=16k the
        # L-BFGS MAP program crashed the TPU worker once; this route is
        # also the documented warm-start workflow, docs/large_n.md)
        map_res = optimize(template, x, y, log_prior=log_prior, steps=80,
                           optimizer="adam", method="hybrid",
                           learning_rate=0.05)
    else:
        # chunk_steps bounds single-device-execution time: the unchunked
        # 60-step program was killed by the TPU worker on heavy-
        # backtracking data at N=16k (ROADMAP round 5)
        map_res = optimize(template, x, y, log_prior=log_prior, steps=60,
                           chunk_steps=10)
    init = jax.block_until_ready(map_res.params)
    map_s = time.perf_counter() - t0
    print(f"MAP init ({map_s:.1f}s incl. compile):",
          jax.tree_util.tree_leaves(init))

    # gradients="hybrid" (round 5): deflated hybrid leapfrog forces +
    # exact accepts — same exact posterior, cheaper trajectories.
    # program_cache: the timed SECOND call reuses the first call's jitted
    # chunk programs (same x/y/init/prior/config; only the key differs) —
    # without it the timed wall would include a full N=16k recompile
    prog_cache = {}
    sample = lambda key: sample_hmc(  # noqa: E731
        key, x, y, init, log_prior,
        n_samples=args.n_samples, l=args.l, eps=None,
        warmup_iters=args.warmup, n_chains=args.n_chains,
        adapt_mass=True, init_jitter=0.02,
        analytic_gradients=True,
        fast_warmup=args.fast_warmup and not args.cpu,
        gradients=args.gradients if not args.cpu else "exact",
        # bounded device launches: the unchunked 16k program (4 chains x
        # 512 iters x l=8 under one lax.map) is a ~20-minute single
        # launch, which the TPU worker kills (ROADMAP round 5)
        chunk_iters=args.chunk_iters,
        program_cache=prog_cache,
    )
    if args.fast_warmup and not args.cpu:
        # reproduce the measured-broken adaptive+fast_warmup config that the
        # library now refuses by default (PERF.md round 4)
        os.environ["GPX_UNSAFE_FAST_ADAPT"] = "1"

    key = jax.random.PRNGKey(args.seed)
    t0 = time.perf_counter()
    post = sample(key)
    float(jnp.sum(post.flat))
    wall_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    post = sample(jax.random.fold_in(key, 1))
    float(jnp.sum(post.flat))
    wall = time.perf_counter() - t0

    rows = diag.summary(post.flat, post.names)
    table = diag.format_summary(rows)
    print(table)
    min_ess = min(r["ess"] for r in rows.values())
    max_rhat = max(r["rhat"] for r in rows.values())
    # recovery: every true hyperparameter inside the pooled central 98%
    # interval (wider than summary's 90% table; recomputed here)
    pooled = np.asarray(post.flat).reshape(-1, post.flat.shape[-1])
    q1, q99 = np.percentile(pooled, [1.0, 99.0], axis=0)
    true_vals = dict(zip(
        post.names, [TRUE_H, TRUE_SIGMA, TRUE_NOISE], strict=False
    ))
    recovered = {
        name: bool(q1[j] <= true_vals[name] <= q99[j])
        for j, name in enumerate(post.names)
    }
    out = {
        "mode": "ess",
        "sampler": "hmc",
        "gradients": args.gradients,
        "n": args.n,
        "n_chains": args.n_chains,
        "warmup": args.warmup,
        "n_samples": args.n_samples,
        "l": args.l,
        "accept_rate": float(np.asarray(post.accept_rate).mean()),
        "min_ess": round(min_ess, 1),
        "max_rhat": round(max_rhat, 4),
        "wall_s": round(wall, 2),
        "wall_compile_s": round(wall_compile, 1),
        "min_ess_per_s": round(min_ess / wall, 2),
        "recovered": recovered,
        "recovery_ok": all(recovered.values()),
    }
    print(json.dumps(out))
    if not out["recovery_ok"]:
        sys.exit(1)


def run(args):
    x, y = make_data(args.n)
    template = gpx.Parameters(
        mean=gpx.zero(), kernel=gpx.se(2.0, 2.0) + gpx.white(1.0)
    )
    common = dict(
        n_samples=args.n_samples,
        eps=args.eps,
        n_chains=1,
        analytic_gradients=True,
    )
    if args.sampler == "hmc":
        sample = lambda key: sample_hmc(  # noqa: E731
            key, x, y, template, log_prior, l=args.l, **common
        )
    else:
        sample = lambda key: sample_nuts(  # noqa: E731
            key, x, y, template, log_prior, max_depth=args.max_depth,
            **common
        )

    def consumed(key):
        t0 = time.perf_counter()
        post = sample(key)
        float(jnp.sum(post.flat))  # force full materialization
        return time.perf_counter() - t0, post

    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(args.seed), 3)
    wall_compile, _ = consumed(k0)
    wall_warm, _ = consumed(k1)          # second consumed warm call
    wall, post = consumed(k2)

    ms_per_sample = wall / args.n_samples * 1e3
    if args.sampler == "hmc":
        grads_per_sample = float(args.l)
        mean_depth = None
    else:
        depth = np.asarray(post.extras["depth"], dtype=np.float64)
        mean_depth = float(depth.mean())
        # a depth-d multinomial tree evaluates 2^d - 1 new leapfrog states
        grads_per_sample = float(np.mean(2.0 ** depth - 1.0))
    out = {
        "sampler": args.sampler,
        "n": args.n,
        "n_samples": args.n_samples,
        "eps": args.eps,
        "accept_rate": float(np.asarray(post.accept_rate).mean()),
        "mean_depth": mean_depth,
        "grads_per_sample": grads_per_sample,
        "ms_per_sample": round(ms_per_sample, 2),
        "ms_per_leapfrog_grad": round(ms_per_sample / grads_per_sample, 2),
        "samples_per_s": round(1e3 / ms_per_sample, 3),
        "wall_compile_s": round(wall_compile, 1),
        "wall_warm_s": round(wall_warm, 1),
        "wall_timed_s": round(wall, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sampler", choices=["hmc", "nuts"], required=True)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--n-samples", type=int, default=8)
    ap.add_argument("--l", type=int, default=5, help="HMC leapfrog steps")
    ap.add_argument("--max-depth", type=int, default=6)
    ap.add_argument(
        "--eps", type=float, default=0.02,
        help="fixed step size (skips warmup; pick from a short adaptive "
        "run at the same N for realistic NUTS depths)",
    )
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (smoke-testing the harness off-chip)",
    )
    ap.add_argument(
        "--fast-warmup", action="store_true",
        help="ess mode: run the ADAPTIVE warmup on the 2-pass fast_warmup "
        "program — the measured-to-collapse config (PERF.md round 4); "
        "default is the exact program. Sets GPX_UNSAFE_FAST_ADAPT=1 (the "
        "library itself refuses this configuration since round 5)",
    )
    ap.add_argument(
        "--map", choices=["lbfgs", "hybrid-adam"], default="lbfgs",
        help="ess mode: MAP-init route (hybrid-adam avoids the zoom "
        "linesearch's multi-eval memory at N=16k)",
    )
    ap.add_argument(
        "--gradients", choices=["exact", "hybrid"], default="exact",
        help="ess mode: leapfrog-force source — 'hybrid' runs the "
        "deflated fixed-probe-key hybrid force with exact accepts "
        "(exact posterior either way; round 5)",
    )
    ap.add_argument(
        "--ess", action="store_true",
        help="accuracy-qualified mode: simulate-from-model data, adaptive "
        "warmup + exact kept draws, ESS/sec + recovery assertion",
    )
    ap.add_argument("--warmup", type=int, default=64)
    ap.add_argument("--n-chains", type=int, default=2)
    ap.add_argument(
        "--chunk-iters", type=int, default=None,
        help="ess mode: host-chunked HMC (sample_hmc chunk_iters=) — "
        "bounds single-device-launch time; use ~32-64 at N=16k",
    )
    cli = ap.parse_args()
    if cli.ess:
        run_ess(cli)
    else:
        run(cli)
