"""Roofline microbenchmark: sustained MXU rates behind the PERF.md claims.

Measures, on the real chip, the sustained throughput of exactly the
kernels the N=16k north-star path is built from (gpx.ops.pallas_trmm /
pallas_logml_grad), at the bench tile size (bt=512), next to XLA dense
matmul references — so "the exact path is at the LAPACK MAC optimum x 3
bf16 passes at the chip's sustained rate" is auditable, not asserted
(round-3 VERDICT item 1a).

Reported TF numbers count USEFUL MACs x 2 (the algorithmic flops of the
triangular op), not the 3x bf16 passes — so a bf16x3 kernel showing
~50 TF of useful f32-faithful throughput is sustaining ~150 TF of raw
bf16 MXU issue.

Run: ``python benchmarks/roofline.py [n]`` (default 8192; 16384 matches
the bench point but doubles compile time).
"""

import sys
import time

import jax
import jax.numpy as jnp


def _time(f, *args, reps=5):
    # two untimed calls: compile, then one warm call — the first
    # post-compile dispatch of a Pallas program has measured ~400 ms of
    # one-off overhead on this platform (round-3 debug), which at reps=5
    # polluted small-kernel numbers by ~80 ms/rep
    for _ in range(2):
        out = f(*args)
        jax.block_until_ready(out)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    # forced consumer: block_until_ready on Pallas outputs has returned
    # early on this platform (CLAUDE.md) — touch a scalar
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.time() - t0) / reps


def main(n=8192):
    print(f"device: {jax.devices()[0].device_kind}, n={n}")
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (n, n), jnp.float32)
    lt = jnp.tril(a)

    dense_macs = n * n * n

    # XLA dense matmul references. The DEFAULT-precision f32 matmul is
    # SINGLE-PASS bf16 on this chip (times identically to the explicit
    # bf16 product — the accuracy cost is what gpx/utils/precision.py
    # guards against); HIGHEST lowers to a catastrophically slow path
    # here (measured 51 s at 8k; don't use it for XLA-side matmuls).
    for name, f, macs, passes in [
        ("xla f32-default matmul (1-pass bf16)",
         jax.jit(lambda x, y: jax.lax.dot(x, y)),
         dense_macs, 1),
        ("xla bf16 matmul (1-pass)",
         jax.jit(lambda x, y: jax.lax.dot(
             x.astype(jnp.bfloat16), y.astype(jnp.bfloat16),
             preferred_element_type=jnp.float32)),
         dense_macs, 1),
    ]:
        dt = _time(f, a, a)
        tf = 2 * macs / dt / 1e12
        print(f"{name:38s} {dt*1e3:8.1f} ms  {tf:6.1f} TF useful"
              f"  (~{tf*passes:6.1f} TF raw MXU)")

    from gpx.ops.pallas_trmm import syrk_lower, trmm

    tri_macs = dense_macs // 2          # useful MACs of a triangular op
    for name, f, macs in [
        ("pallas trmm right_lower_t bf16x3",
         jax.jit(lambda b, l: trmm(b, l, mode="right_lower_t")), tri_macs),
        ("pallas trmm left_lower bf16x3",
         jax.jit(lambda b, l: trmm(b, l, mode="left_lower")), tri_macs),
        ("pallas syrk_lower bf16x3",
         jax.jit(lambda x, b: syrk_lower(x, b)), tri_macs),
    ]:
        dt = _time(f, a, lt)
        tf = 2 * macs / dt / 1e12
        print(f"{name:38s} {dt*1e3:8.1f} ms  {tf:6.1f} TF useful"
              f"  (~{tf*3:6.1f} TF raw MXU)")

    # realistic operands from here on: the REAL Gram of the bench config
    # and its actual factor/inverse. Operand values matter on this chip:
    # the same grad-contraction kernel measured 76 ms on O(1) random tril
    # input vs 34.6 ms on the true L^-1 (round-3 debug) — publish the
    # workload number, not a synthetic pessimization.
    from gpx import se, white
    from gpx.ops.pallas_chol import chol_inv, chol_inv_tile
    from gpx.ops.pallas_logml_grad import logml_kernel_grads

    x = jnp.sort(jax.random.uniform(key, (n, 1)) * 30.0, axis=0)
    alpha = jax.random.normal(key, (n,), jnp.float32)
    kern = se(2.0, 3.0) + white(0.3)
    gram = kern.gram(x, nugget=1e-3)
    jax.block_until_ready(gram)

    dt = _time(jax.jit(chol_inv), gram)
    macs = dense_macs // 3              # chol N^3/6 + trtri N^3/6
    tf = 2 * macs / dt / 1e12
    print(f"chol_inv (L, L^-1) end-to-end        {dt*1e3:8.1f} ms"
          f"  {tf:6.1f} TF useful  (~{tf*3:6.1f} TF raw MXU)")

    t = 2048
    dt = _time(jax.jit(chol_inv_tile), gram[:t, :t])
    print(f"chol_inv_tile base case ({t}^2)      {dt*1e3:8.1f} ms"
          f"  ({n//t} serially-dependent per {n} factorization — the"
          f" fori diagonal chain, not the MXU, binds here)")

    l_inv = jax.jit(chol_inv)(gram)[1]
    jax.block_until_ready(l_inv)
    for label, fast in [("exact bf16x3", False), ("fast bf16x2", True)]:
        f = jax.jit(lambda li, fa=fast: jax.tree_util.tree_leaves(
            logml_kernel_grads(kern, x, alpha, li, fast=fa))[0])
        dt = _time(f, l_inv)
        passes = 2 if fast else 3
        tf = 2 * (dense_macs // 6) / dt / 1e12
        print(f"fused logml grad contraction {label:12s} {dt*1e3:8.1f} ms"
              f"  {tf:6.1f} TF useful  (~{tf*passes:6.1f} TF raw MXU)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8192)
