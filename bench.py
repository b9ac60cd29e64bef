"""North-star benchmark: N=16k exact-GP logML + hyperparameter gradient.

BASELINE.md: target < 50 ms/eval on one TPU v5p chip (this environment runs
a single v5e/lite chip — weaker MXU; the number is reported as measured).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
``vs_baseline`` = target_ms / measured_ms (>1.0 beats the target).

Two timings are taken:

* ``value`` (headline): per-eval cost of REPS back-to-back evaluations
  inside ONE compiled ``lax.scan``, each eval data-dependent on the
  previous (a perturbed parameter pytree) — the production pattern: every
  sampler runs logML+grad inside a compiled chain (SURVEY.md §3.4/§3.5),
  paying host dispatch once per chain, not per eval.
* ``per_call_ms``: one jitted call per eval. In this environment each
  invocation pays a fixed ~27 ms axon host<->device round-trip
  (CLAUDE.md), which dominates the gap between the two numbers.
"""

import json
import os
import time

N = int(os.environ.get("GPX_BENCH_N", 16384))
TARGET_MS = 50.0
REPS = int(os.environ.get("GPX_BENCH_REPS", 10))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import gpx
    from gpx.models import gp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-10.0, 10.0, size=(N, 1)), jnp.float32)
    params = gpx.Parameters(
        mean=gpx.zero(), kernel=gpx.se(3.0, 5.5) + gpx.white(0.5)
    )
    y = jnp.asarray(rng.normal(size=N), jnp.float32)

    # --- per-call timing -------------------------------------------------
    # persistent AOT cache (gpx.utils.aot): on repeat runs the ~5 min
    # compile of this program shape is replaced by a sub-second load of
    # the serialized executable (identical outputs — chip-verified);
    # disable with GPX_AOT_CACHE=0
    def _compile(fn, *args):
        if os.environ.get("GPX_AOT_CACHE", "1") != "0":
            try:
                from gpx.utils.aot import cached_compile

                return cached_compile(fn, *args)
            except Exception:
                pass
        return jax.jit(fn)

    f = _compile(lambda p: gp.logml_value_and_grad(p, x, y), params)
    out = f(params)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(params)
    jax.block_until_ready(out)
    per_call_ms = (time.perf_counter() - t0) / REPS * 1e3

    value, grads = out
    assert bool(jnp.isfinite(value)), "non-finite logml"
    assert all(
        bool(jnp.isfinite(g).all()) for g in jax.tree_util.tree_leaves(grads)
    ), "non-finite grads"

    # --- scanned steady-state (headline) ---------------------------------
    # each eval perturbs the params with the previous eval's value, so the
    # REPS evals are genuinely sequential and cannot be CSE'd or cached
    def one(carry, _):
        p = jax.tree_util.tree_map(
            lambda leaf: leaf * (1.0 + 1e-7 * carry), params
        )
        v, g = gp.logml_value_and_grad(p, x, y)
        return jnp.tanh(v) * 1e-6, v

    f_scan = _compile(
        lambda: jax.lax.scan(one, jnp.float32(0.0), None, length=REPS)
    )
    vals = f_scan()
    jax.block_until_ready(vals)
    t0 = time.perf_counter()
    vals = f_scan()
    jax.block_until_ready(vals)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    assert bool(jnp.isfinite(vals[1]).all()), "non-finite scanned logml"

    # --- opt-in fast-gradient mode (recorded, not the headline) ----------
    # 2-pass bf16 split on the W-contraction: warmup-grade gradients
    # (~2^-9 rel) at less MXU time — the documented sampler-warmup mode
    def one_fast(carry, _):
        p = jax.tree_util.tree_map(
            lambda leaf: leaf * (1.0 + 1e-7 * carry), params
        )
        v, g = gp.logml_value_and_grad(p, x, y, fast_gradients=True)
        return jnp.tanh(v) * 1e-6, v

    fast_ms = None
    if os.environ.get("GPX_BENCH_FAST", "1") != "0":
        f_fast = _compile(
            lambda: jax.lax.scan(one_fast, jnp.float32(0.0), None, length=REPS)
        )
        vals = f_fast()
        jax.block_until_ready(vals)
        t0 = time.perf_counter()
        vals = f_fast()
        jax.block_until_ready(vals)
        fast_ms = round((time.perf_counter() - t0) / REPS * 1e3, 2)
        assert bool(jnp.isfinite(vals[1]).all()), "non-finite fast logml"

    # --- stochastic-exact hybrid (recorded, not the headline) -------------
    # spine factorization + DEFLATED probe traces (round 5: deflate=None
    # auto-selects the Hutch++/control-variate split): gradients at the
    # exact path's own f32 envelope for ~0.56x the cost (61.6 vs 109.4 ms
    # at 16k in situ, PERF.md round 5); the VALUE keeps a ~0.06 absolute
    # probe shift, which is why the exact path stays the headline
    def one_hybrid(carry, _):
        p = jax.tree_util.tree_map(
            lambda leaf: leaf * (1.0 + 1e-7 * carry), params
        )
        v, g = gp.logml_value_and_grad(
            p, x, y, method="hybrid", probes=64,
            probe_key=jax.random.PRNGKey(0),
        )
        return jnp.tanh(v) * 1e-6, v

    hybrid_ms = None
    # off-512 N is identity-block padded inside the hybrid path (exact),
    # so off-grid GPX_BENCH_N runs record a hybrid number too
    if os.environ.get("GPX_BENCH_HYBRID", "1") != "0":
        f_hyb = _compile(
            lambda: jax.lax.scan(one_hybrid, jnp.float32(0.0), None,
                                 length=REPS)
        )
        vals = f_hyb()
        jax.block_until_ready(vals)
        t0 = time.perf_counter()
        vals = f_hyb()
        jax.block_until_ready(vals)
        hybrid_ms = round((time.perf_counter() - t0) / REPS * 1e3, 2)
        assert bool(jnp.isfinite(vals[1]).all()), "non-finite hybrid logml"

    print(json.dumps({
        "metric": f"exact_gp_logml_grad_n{N}",
        "value": round(ms, 2),
        "unit": "ms/eval",
        "vs_baseline": round(TARGET_MS / ms, 4),
        "per_call_ms": round(per_call_ms, 2),
        "fast_mode_ms": fast_ms,
        "hybrid_ms": hybrid_ms,
        "hybrid_vs_baseline": (
            round(TARGET_MS / hybrid_ms, 4) if hybrid_ms else None
        ),
        "reps": REPS,
    }))


if __name__ == "__main__":
    main()
