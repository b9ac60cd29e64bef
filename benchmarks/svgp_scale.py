"""SVGP training throughput at scale (round 5, VERDICT Next-9).

The SVGP/SVGP-LMC trainers are CPU-tested and documented but had no
measured chip number. This benchmark trains the uncollapsed minibatch
SVGP (gpx.models.svgp.train — Hensman et al. 2013; beyond the dense-only
reference) at N=262,144 with M=1024 inducing points on the real chip and
reports points/sec and the ELBO trajectory.

Usage:
    python benchmarks/svgp_scale.py [--n 262144] [--m 1024] [--steps 500]
    python benchmarks/svgp_scale.py --cpu-mesh   # 8-virtual-device
        data-parallel dryrun on the CPU backend (mesh= leg)
"""
import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--m", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--cpu-mesh", action="store_true",
        help="force the CPU backend with 8 virtual devices and run the "
        "data-parallel (mesh=) trainer at smoke scale",
    )
    args = ap.parse_args()

    if args.cpu_mesh:
        # config route, NOT the env var (CLAUDE.md: the env-var route
        # probes the axon tunnel and can block ~25 min)
        import os

        os.environ["XLA_FLAGS"] = (
            "--xla_force_host_platform_device_count=8 "
            + os.environ.get("XLA_FLAGS", "")
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.n, args.m, args.steps, args.batch = 4096, 64, 20, 256

    import jax
    import jax.numpy as jnp
    import numpy as np

    import gpx
    from gpx.models import svgp

    rng = np.random.default_rng(args.seed)
    x = jnp.asarray(
        np.sort(rng.uniform(-10.0, 10.0, size=args.n)).reshape(-1, 1),
        jnp.float32,
    )
    y = (3.0 * jnp.sin(0.7 * x[:, 0])
         + 0.5 * jnp.asarray(rng.normal(size=args.n), jnp.float32))
    # quantile landmarks as the inducing init
    z = x[:: args.n // args.m][: args.m]
    params = gpx.Parameters(mean=gpx.zero(), kernel=gpx.se(2.0, 2.0))

    mesh = None
    if args.cpu_mesh:
        from jax.sharding import AxisType

        mesh = jax.make_mesh((8,), ("data",),
                             axis_types=(AxisType.Auto,))

    def run(key):
        return svgp.train(
            key, params, z, x, y, noise=0.25, batch_size=args.batch,
            steps=args.steps, learning_rate=args.lr, train_noise=True,
            mesh=mesh,
        )

    k0, k1 = jax.random.split(jax.random.PRNGKey(args.seed))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(k0))
    wall_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    p2, z2, state, noise2, trace = jax.block_until_ready(run(k1))
    wall = time.perf_counter() - t0

    trace = np.asarray(trace)
    assert np.isfinite(trace).all(), "non-finite ELBO trace"
    assert trace[-1] > trace[0], "ELBO did not improve"
    result = {
        "mode": "cpu_mesh_dryrun" if args.cpu_mesh else "chip",
        "n": args.n,
        "m": args.m,
        "steps": args.steps,
        "batch": args.batch,
        "wall_s": round(wall, 2),
        "wall_compile_s": round(wall_compile, 1),
        "ms_per_step": round(wall / args.steps * 1e3, 2),
        "points_per_s": round(args.steps * args.batch / wall, 0),
        "elbo_first": round(float(trace[0]), 1),
        "elbo_last": round(float(trace[-1]), 1),
        "trained_noise": round(float(noise2), 4) if hasattr(
            noise2, "dtype") else noise2,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
