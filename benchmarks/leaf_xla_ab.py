"""A/B: chol_inv's 2048^2 Pallas base case vs XLA chol + trsm at tile scale.

The N=16k exact headline decomposes as ~50 ms of eight serially-dependent
2048^2 base cases (latency-bound, ~6.3 ms/tile) + MXU-bound bf16x3 sweeps
(PERF.md round-2 section). XLA's ``lax.linalg.cholesky`` and
``triangular_solve`` are f32-faithful (CLAUDE.md) but were only ever
measured at N=16k, where trsm-vs-identity OOMs and chol costs 95 ms. At
2048 the temps are 64x smaller — this measures whether an XLA base case
beats the single-program Pallas tile:

  (a) chol_inv_tile(2048)            — current Pallas base case
  (b) lax.linalg.cholesky(2048)      — factor only
  (c) (b) + triangular_solve vs I    — factor + inverse, XLA
  (d) in-situ: full chol_inv(16384) with an XLA base case spliced into
      the value recursion (only run with --insitu; ~minutes of compile)

Run on chip in background: python benchmarks/leaf_xla_ab.py [--insitu]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import gpx
from gpx.models import gp
import gpx.ops.pallas_chol as pc
from gpx.ops.pallas_trmm import syrk_lower, trmm

T = 2048
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


def xla_base(a):
    """XLA-native (L, L^{-1}) of one SPD tile."""
    l = lax.linalg.cholesky(a, symmetrize_input=False)
    m = lax.linalg.triangular_solve(
        l, jnp.eye(a.shape[-1], dtype=a.dtype),
        left_side=True, lower=True,
    )
    return l, m


def rec_value_xla_base(a, *, base=T, bt=512):
    """pc._rec_value with the base case swapped to XLA chol+trsm."""
    n = a.shape[-1]
    if n <= base:
        return xla_base(a)
    h = n // 2
    a11, a21, a22 = a[:h, :h], a[h:, :h], a[h:, h:]
    l11, m11 = rec_value_xla_base(a11, base=base, bt=bt)
    l21 = trmm(a21, m11, mode="right_lower_t", bt=bt)
    s = syrk_lower(a22, l21, bt=bt)
    l22, m22 = rec_value_xla_base(s, base=base, bt=bt)
    t1 = trmm(l21, m11, mode="right_lower", bt=bt, neg=True)
    m21 = trmm(t1, m22, mode="left_lower", bt=bt)
    z = jnp.zeros((h, h), jnp.float32)
    l = jnp.concatenate(
        [jnp.concatenate([l11, z], 1), jnp.concatenate([l21, l22], 1)], 0
    )
    m = jnp.concatenate(
        [jnp.concatenate([m11, z], 1), jnp.concatenate([m21, m22], 1)], 0
    )
    return l, m


def main():
    insitu = "--insitu" in sys.argv
    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.uniform(-10.0, 10.0, size=(T, 1)), jnp.float32)
    params = gpx.Parameters(
        mean=gpx.zero(), kernel=gpx.se(3.0, 5.5) + gpx.white(0.5)
    )
    at = params.kernel.gram(xt, nugget=gp.LOGML_NUGGET)
    jax.block_until_ready(at)
    eye_t = jnp.eye(T, dtype=jnp.float32)

    t0 = time.perf_counter()
    ms, (l_p, m_p) = timed_loop(jax.jit(pc.chol_inv_tile), at)
    print(f"(a) pallas chol_inv_tile({T}): {ms:.2f} ms/call "
          f"(compile {time.perf_counter()-t0:.0f} s)", flush=True)
    rp = float(jnp.abs(jnp.matmul(
        m_p, l_p, precision=jax.lax.Precision.HIGHEST) - eye_t).max())
    print(f"    ||M L - I||_max = {rp:.3e}", flush=True)

    t0 = time.perf_counter()
    ms, l_x = timed_loop(
        jax.jit(lambda a: lax.linalg.cholesky(a, symmetrize_input=False)), at)
    print(f"(b) xla cholesky({T}): {ms:.2f} ms/call "
          f"(compile {time.perf_counter()-t0:.0f} s)", flush=True)

    t0 = time.perf_counter()
    ms, (l_x, m_x) = timed_loop(jax.jit(xla_base), at)
    print(f"(c) xla chol+trsm({T}): {ms:.2f} ms/call "
          f"(compile {time.perf_counter()-t0:.0f} s)", flush=True)
    rx = float(jnp.abs(jnp.matmul(
        m_x, l_x, precision=jax.lax.Precision.HIGHEST) - eye_t).max())
    print(f"    ||M L - I||_max = {rx:.3e}", flush=True)

    if not insitu:
        return

    xn = jnp.asarray(rng.uniform(-10.0, 10.0, size=(N, 1)), jnp.float32)
    an = params.kernel.gram(xn, nugget=gp.LOGML_NUGGET)
    jax.block_until_ready(an)

    t0 = time.perf_counter()
    ms, (l, m) = timed_loop(jax.jit(pc.chol_inv), an)
    print(f"(d0) in-situ pallas-base chol_inv({N}): {ms:.1f} ms/call "
          f"(compile {time.perf_counter()-t0:.0f} s)", flush=True)

    t0 = time.perf_counter()
    ms, (l2, m2) = timed_loop(jax.jit(rec_value_xla_base), an)
    print(f"(d1) in-situ xla-base chol_inv({N}): {ms:.1f} ms/call "
          f"(compile {time.perf_counter()-t0:.0f} s)", flush=True)
    dl = float(jnp.abs(l - l2).max())
    print(f"    ||L_pallas - L_xla||_max = {dl:.3e}", flush=True)


if __name__ == "__main__":
    main()
