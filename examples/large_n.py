"""Large-N workflows — beyond the reference's few-thousand-point ceiling.

The reference builds the Gram entry-by-entry on the JVM and factors it with
one LAPACK call (GaussianProcess.scala:50-61,123), capping practical N at a
few thousand. This example drives the three gpx scaling paths end to end:

  dense <n>        exact logML + gradient + dense-grid prediction through
                   the Pallas chol_inv route (power-of-2 N; the bench path)
  iterative <n>    matrix-free: preconditioned CG + mBCG SLQ logML, and
                   fit_iterative prediction (K never materializes)
  svgp <n>         minibatched SVGP training + predictive plot

Outputs land in examples/output/. On CPU, sizes are clamped to stay quick;
on a TPU chip the defaults exercise the real scale.
"""

import argparse
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np

import gpx
from gpx.models import gp

OUT = pathlib.Path(__file__).parent / "output"


def _data(n, key=0, noise=0.7):
    rng = np.random.default_rng(key)
    x = jnp.asarray(
        np.sort(rng.uniform(-10, 10, size=(n, 1)), axis=0), jnp.float32
    )
    y = jnp.asarray(
        np.sin(np.asarray(x)[:, 0]) + rng.normal(size=n) * noise, jnp.float32
    )
    return x, y


def _params():
    return gpx.Parameters(
        mean=gpx.zero(), kernel=gpx.se(2.0, 3.0) + gpx.white(0.5)
    )


def run_dense(n):
    x, y = _data(n)
    params = _params()
    t0 = time.time()
    val, grads = jax.jit(lambda p: gp.logml_value_and_grad(p, x, y))(params)
    jax.block_until_ready((val, grads))
    print(f"dense logML+grad N={n}: {time.time() - t0:.1f}s (incl. compile); "
          f"value={float(val):.1f}")
    xs = jnp.linspace(-10, 10, 1024).reshape(-1, 1)
    summary = gp.fit(params, x, y, xs)
    _plot(xs, summary.mean, summary.variance, x, y, f"large_n_dense_{n}.png")


def run_iterative(n):
    from gpx.models.gp_iterative import (
        fit_iterative,
        logml_value_and_grad_iterative,
    )

    x, y = _data(n)
    params = _params()
    t0 = time.time()
    res = jax.jit(lambda: logml_value_and_grad_iterative(
        params, x, y, jax.random.PRNGKey(0), n_probes=8, lanczos_iters=32,
        cg_tol=1e-4, precond_rank=64,
    ))()
    jax.block_until_ready(res)
    print(f"iterative logML+grad N={n}: {time.time() - t0:.1f}s; "
          f"value={float(res.value):.1f} "
          f"(CG {int(res.cg_iters)} iters, converged {bool(res.cg_converged)})")
    xs = jnp.linspace(-10, 10, 1024).reshape(-1, 1)
    post = jax.jit(lambda: fit_iterative(
        params, x, y, xs, cg_tol=1e-4, precond_rank=64,
        variance="exact", variance_block=256,
    ))()
    _plot(xs, post.mean, post.variance, x, y, f"large_n_iterative_{n}.png")


def run_svgp(n):
    from gpx.models import sparse, svgp

    x, y = _data(n)
    z0 = sparse.init_inducing(jax.random.PRNGKey(1), x, 64)
    t0 = time.time()
    p2, z2, state, noise2, trace = svgp.train(
        jax.random.PRNGKey(2), _params(), z0, x, y,
        noise=0.5, batch_size=min(512, n), steps=300, train_noise=True,
    )
    tr = np.asarray(trace)
    print(f"svgp N={n}: {time.time() - t0:.1f}s; "
          f"ELBO {tr[:5].mean():.0f} -> {tr[-5:].mean():.0f}, "
          f"noise {float(noise2):.3f}")
    xs = jnp.linspace(-10, 10, 1024).reshape(-1, 1)
    pred = svgp.fit(p2, z2, state, xs)
    _plot(xs, pred.mean, pred.variance, x, y, f"large_n_svgp_{n}.png")


def _plot(xs, mean, var, x, y, name):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    OUT.mkdir(exist_ok=True)
    fig, ax = plt.subplots(figsize=(9, 4))
    g = np.asarray(xs)[:, 0]
    m = np.asarray(mean)
    s = np.sqrt(np.maximum(np.asarray(var), 0.0))
    sub = max(len(np.asarray(x)) // 2000, 1)
    ax.plot(np.asarray(x)[::sub, 0], np.asarray(y)[::sub], ".", ms=2,
            alpha=0.3, label="data (subsampled)")
    ax.plot(g, m, lw=1.5, label="posterior mean")
    ax.fill_between(g, m - 1.64 * s, m + 1.64 * s, alpha=0.25,
                    label="90% band")
    ax.legend(loc="best")
    fig.tight_layout()
    fig.savefig(OUT / name, dpi=110)
    plt.close(fig)
    print(f"wrote {OUT / name}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["dense", "iterative", "svgp"])
    ap.add_argument("n", nargs="?", type=int, default=None)
    args = ap.parse_args()
    on_tpu = jax.default_backend() == "tpu"
    default_n = {"dense": 16384 if on_tpu else 1024,
                 "iterative": 32768 if on_tpu else 2048,
                 "svgp": 16384 if on_tpu else 2048}[args.mode]
    n = args.n or default_n
    {"dense": run_dense, "iterative": run_iterative, "svgp": run_svgp}[
        args.mode
    ](n)


if __name__ == "__main__":
    main()
