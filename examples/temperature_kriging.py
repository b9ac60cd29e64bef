"""Kriging on a spatial grid — examples/src/main/scala/TemperatureKriging.scala.

The reference's full workflow (TemperatureKriging.scala:37-107): the GP
residual-kernel hyperparameters are *inferred by MCMC*, the chain streams to
CSV, the posterior-mean parameters are re-read from that CSV (:37-50 reads
``temperature_gp_residuals_0.csv``), and the grid is krigged with them
(:84-107). The grid prediction routes through the test-point-sharded
``sharded_predict`` so it scales across a device mesh.

``make krig_temperature``.
"""

import argparse
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

import gpx
from gpx import io, plots
from gpx.distributions import Gamma
from gpx.infer import sample_mh
from gpx.models import dlmgp, gp
from gpx.parallel import make_mesh, sharded_predict

OUT = pathlib.Path(__file__).parent / "output"


def log_prior(p):
    pr = Gamma(concentration=jnp.asarray(2.0), rate=jnp.asarray(2.0))
    k0, k1 = p.kernel.kernels
    return pr.logpdf(k0.h) + pr.logpdf(k0.sigma) + pr.logpdf(k1.sigma)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_iters", nargs="?", type=int, default=1500)
    ap.add_argument("--nx", type=int, default=40)
    ap.add_argument("--ny", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    OUT.mkdir(exist_ok=True)

    key = jax.random.PRNGKey(args.seed)
    k1, k2, k3 = jax.random.split(key, 3)
    locs = jax.random.uniform(
        k1, (30, 2), minval=jnp.array([-1.8, 54.8]), maxval=jnp.array([-1.2, 55.2])
    )
    truth = gpx.Parameters(
        mean=gpx.zero(), kernel=gpx.se(1.0, 0.25) + gpx.white(0.1)
    )
    resid = gp.draw(k2, truth, locs)

    # 1. infer the residual-kernel hyperparameters by MH (the reference's
    #    chain is produced upstream by TemperatureDlm; here the MH fit runs
    #    in-example) and stream the chains to CSV
    template = gpx.Parameters(
        mean=gpx.zero(), kernel=gpx.se(0.5, 0.5) + gpx.white(0.3)
    )
    post = sample_mh(
        k3, locs, resid, template, log_prior,
        n_samples=args.n_iters, burn_in=0, n_chains=2, proposal_scale=0.15,
    )
    chain_base = OUT / "temperature_gp_residuals"
    paths = io.write_chains_csv(chain_base, np.asarray(post.flat), post.names)
    print(f"wrote chains: {[str(p) for p in paths]}")

    # 2. posterior-mean parameters re-read from the chain CSV with burn-in
    #    and thinning at read time (TemperatureKriging.scala:37-50 /
    #    Temperature.scala:137-141)
    draws, names = io.read_chain_csv(paths[0], burn_in=args.n_iters // 3,
                                     thin=2)
    post_mean = {n: float(v) for n, v in zip(names, draws.mean(axis=0))}
    print("posterior means from CSV:",
          {k: round(v, 3) for k, v in post_mean.items()})
    fitted = gpx.Parameters(
        mean=gpx.zero(),
        kernel=gpx.se(post_mean["kernel.kernels0.h"],
                      post_mean["kernel.kernels0.sigma"])
        + gpx.white(post_mean["kernel.kernels1.sigma"]),
    )

    # 3. krig the grid with the posterior-mean parameters through the
    #    test-point-sharded predict path (grid columns split over the mesh)
    grid = dlmgp.grid_locations((-1.8, -1.2), (54.8, 55.2), args.nx, args.ny)
    n_dev = len(jax.devices())
    shards = n_dev
    while (args.nx * args.ny) % shards:
        shards -= 1
    mesh = make_mesh(data=shards)
    summary = sharded_predict(fitted, locs, resid, grid, mesh)
    print(f"krigged {args.nx * args.ny} grid cells over {shards} device(s)")

    mean = np.asarray(summary.mean).reshape(args.nx, args.ny)
    var = np.asarray(summary.variance).reshape(args.nx, args.ny)

    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(12, 5))
    for ax, img, title in [(axes[0], mean, "posterior mean"),
                           (axes[1], np.sqrt(var), "posterior sd")]:
        im = ax.imshow(img.T, origin="lower", extent=[-1.8, -1.2, 54.8, 55.2],
                       aspect="auto")
        ax.scatter(np.asarray(locs)[:, 0], np.asarray(locs)[:, 1],
                   c="red", s=10)
        ax.set_title(title)
        fig.colorbar(im, ax=ax)
    plots.savefig(fig, OUT / "kriging.png")
    print(f"wrote {OUT}/kriging.png ({args.nx}x{args.ny} grid)")


if __name__ == "__main__":
    main()
