"""A/B the fused gradient contraction's tile size on the real chip.

The roofline table (PERF.md) shows the exact bf16x3 contraction running at
128 TF raw vs the trmm/syrk kernels' 164 — the one fused kernel below the
machine sweep rate. Tile size is the untried knob: larger tiles mean 8x
fewer grid steps and finalize epilogues at the same MAC count (the VPU
epilogue work is O(N^2) total either way, but its fixed per-step costs
shrink). Inputs are synthetic (random lower-triangular l_inv) — the
kernel's cost is data-independent, so timings transfer to the real path.

Usage (background; each variant compiles ~1-3 min):
    python benchmarks/grad_bt_ab.py [n]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import gpx
from gpx.ops.pallas_logml_grad import logml_kernel_grads

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
REPS = 5


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(-10, 10, N)).reshape(-1, 1),
                    jnp.float32)
    alpha = jnp.asarray(rng.normal(size=N), jnp.float32)
    # synthetic well-scaled lower-triangular "inverse factor"
    l_inv = jnp.asarray(
        np.tril(rng.normal(size=(N, N)) * (1.0 / np.sqrt(N)))
        + np.eye(N) * 0.5, jnp.float32,
    )
    kern = gpx.se(3.0, 5.5) + gpx.white(0.5)

    for bt in (512, 1024, 2048):
        f = jax.jit(lambda li, bt=bt: logml_kernel_grads(
            kern, x, alpha, li, bt=bt, with_correction=True))
        t0 = time.perf_counter()
        out = f(l_inv)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        # two consumed warm calls before timing (CLAUDE.md dispatch note)
        for _ in range(2):
            float(jax.tree_util.tree_leaves(f(l_inv))[0])
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = f(l_inv)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / REPS * 1e3
        g0 = [round(float(g), 4) for g in jax.tree_util.tree_leaves(out[0])]
        print(f"bt={bt}: {ms:.1f} ms/call (compile {compile_s:.0f}s) "
              f"grads {g0}", flush=True)


if __name__ == "__main__":
    main()
