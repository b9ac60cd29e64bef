"""A/B: bf16x2 fast factorization (chol_inv fast=True) at N=16384.

Measures (a) chol_inv wall fast vs exact, (b) inverse residual growth,
(c) the full fast-everything logML+gradient path (fast factor + 2-pass
contraction) — wall and accuracy vs the exact 3-pass path. Decides
whether fast_gradients=True should also run the factorization at the
2-pass split (ROADMAP 23 follow-up; the contraction-only fast mode is
101.9 ms headline vs 109.9 exact).

Run on chip in background (fresh compiles are minutes):
    python benchmarks/fast_factor_ab.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import gpx
from gpx.models import gp
import gpx.ops.pallas_chol as pc

N = 16384
REPS = 5


def timed_loop(f, *args):
    out = f(*args)                    # warm 1
    jax.block_until_ready(out)
    float(sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(out)))  # warm 2
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(*args)
    float(sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(out)))
    return (time.perf_counter() - t0) / REPS * 1e3, out


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-10.0, 10.0, size=(N, 1)), jnp.float32)
    y = jnp.asarray(rng.normal(size=N), jnp.float32)
    params = gpx.Parameters(
        mean=gpx.zero(), kernel=gpx.se(3.0, 5.5) + gpx.white(0.5)
    )
    k = params.kernel.gram(x, nugget=gp.LOGML_NUGGET)
    jax.block_until_ready(k)

    eye = jnp.eye(N, dtype=jnp.float32)

    for fast in (False, True):
        t0 = time.perf_counter()
        f = jax.jit(lambda a: pc.chol_inv(a, fast=fast))
        ms, (l, m) = timed_loop(f, k)
        print(f"chol_inv fast={fast}: {ms:.1f} ms/call "
              f"(incl first-call compile {time.perf_counter()-t0:.0f} s)")
        resid = float(jnp.abs(
            jnp.matmul(m, l, precision=jax.lax.Precision.HIGHEST) - eye
        ).max())
        print(f"  ||M L - I||_max = {resid:.3e}")

    # full path: exact vs contraction-fast vs everything-fast
    f_exact = jax.jit(lambda p: gp.logml_value_and_grad(p, x, y))
    ms_e, (v_e, g_e) = timed_loop(f_exact, params)
    print(f"logml exact: {ms_e:.1f} ms, value {float(v_e):.4f}")

    f_fast = jax.jit(
        lambda p: gp.logml_value_and_grad(p, x, y, fast_gradients=True)
    )
    ms_f, (v_f, g_f) = timed_loop(f_fast, params)
    print(f"logml fast (2-pass contraction + top-M21): {ms_f:.1f} ms, "
          f"value {float(v_f):.4f}")

    names = ["h", "sigma", "white"]
    for name, a, b in zip(
        names,
        jax.tree_util.tree_leaves(g_e.kernel),
        jax.tree_util.tree_leaves(g_f.kernel),
    ):
        print(f"  grad {name}: exact {float(a):+.4f}  fast {float(b):+.4f}")


if __name__ == "__main__":
    main()
