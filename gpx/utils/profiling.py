"""Tracing / profiling harness (SURVEY.md §5).

The reference has no profiling at all (stray printlns only,
DualAveraging.scala:92). Here: wall-clock stage timing with correct device
synchronization (``block_until_ready``), a jax.profiler trace context for
TPU timeline captures, and a per-stage breakdown of the GP hot path
(Gram / Cholesky / solve / gradient) for perf triage.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


class StageTimer:
    """Accumulates per-stage wall-clock timings across repetitions."""

    def __init__(self):
        self.times: dict[str, list] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        yield
        self.times.setdefault(name, []).append(time.perf_counter() - t0)

    def report(self) -> str:
        lines = [f"{'stage':<28}{'mean ms':>10}{'min ms':>10}{'count':>7}"]
        for name, ts in self.times.items():
            ms = [t * 1e3 for t in ts]
            lines.append(
                f"{name:<28}{sum(ms)/len(ms):>10.2f}{min(ms):>10.2f}{len(ms):>7}"
            )
        return "\n".join(lines)


def timeit(fn: Callable, *args, reps: int = 10, warmup: int = 1, **kwargs):
    """Benchmark a jitted function with proper synchronization. Returns
    (mean_seconds, last_result)."""
    result = None
    for _ in range(warmup):
        result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    t0 = time.perf_counter()
    for _ in range(reps):
        result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    return (time.perf_counter() - t0) / reps, result


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_gp_stages(params, x, y, *, nugget: float = 1e-3, reps: int = 5):
    """Per-stage timing of the exact-GP hot path (SURVEY.md §3.3)."""
    import jax.numpy as jnp

    from gpx.models import gp
    from gpx.ops.chol import cholesky, forward_solve, tri_inverse_lower
    from gpx.ops.distance import as_locations

    x = as_locations(x)
    timer = StageTimer()

    gram_fn = jax.jit(lambda: params.kernel.gram(x, nugget=nugget))
    k = gram_fn()
    jax.block_until_ready(k)
    chol_fn = jax.jit(cholesky)
    l = chol_fn(k)
    jax.block_until_ready(l)
    solve_fn = jax.jit(forward_solve)
    tri_fn = jax.jit(tri_inverse_lower)
    vag_fn = jax.jit(lambda p: gp.logml_value_and_grad(p, x, y, nugget=nugget))
    _ = solve_fn(l, y), tri_fn(l), vag_fn(params)
    jax.block_until_ready(_)

    # the fused (512 | N, TPU) path's factorization stage
    n = x.shape[0]
    ci_fn = None
    if jax.default_backend() == "tpu" and n >= 4096 and n % 512 == 0:
        from gpx.ops.pallas_chol import chol_inv

        ci_fn = jax.jit(chol_inv)
        jax.block_until_ready(ci_fn(k))

    for _ in range(reps):
        with timer.stage("gram"):
            jax.block_until_ready(gram_fn())
        with timer.stage("cholesky"):
            jax.block_until_ready(chol_fn(k))
        with timer.stage("triangular_solve"):
            jax.block_until_ready(solve_fn(l, y))
        with timer.stage("tri_inverse"):
            jax.block_until_ready(tri_fn(l))
        if ci_fn is not None:
            with timer.stage("pallas_chol_inv"):
                jax.block_until_ready(ci_fn(k))
        with timer.stage("logml_value_and_grad"):
            jax.block_until_ready(vag_fn(params))
    return timer
