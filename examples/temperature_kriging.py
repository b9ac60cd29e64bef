"""Kriging on a spatial grid — examples/src/main/scala/TemperatureKriging.scala.

Fit a GP to sensor residuals and produce posterior mean/variance on a dense
grid (TemperatureKriging.scala:35-107), using the test-point-sharded predict
path so the grid scales across chips.
"""

import argparse
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

import gpx
from gpx import plots
from gpx.models import dlmgp, gp

OUT = pathlib.Path(__file__).parent / "output"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=40)
    ap.add_argument("--ny", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    OUT.mkdir(exist_ok=True)

    key = jax.random.PRNGKey(args.seed)
    k1, k2 = jax.random.split(key)
    locs = jax.random.uniform(
        k1, (30, 2), minval=jnp.array([-1.8, 54.8]), maxval=jnp.array([-1.2, 55.2])
    )
    truth = gpx.Parameters(
        mean=gpx.zero(), kernel=gpx.se(1.0, 0.25) + gpx.white(0.1)
    )
    resid = gp.draw(k2, truth, locs)

    grid = dlmgp.grid_locations((-1.8, -1.2), (54.8, 55.2), args.nx, args.ny)
    summary = gp.fit(truth, locs, resid, grid)

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
