"""Type-II maximum-likelihood / MAP hyperparameter optimization.

The reference estimates hyperparameters only by MCMC (KernelParameters
``sample``/``sampleHmc``, KernelParameters.scala:121-154,231-246); the
standard deterministic workflow it leaves out — GPML ch. 5 type-II MLE,
the thing every production GP user reaches for first — is supplied here
on top of the same machinery the samplers use: the bijector
reparametrization to unconstrained space (KernelParameters.scala:251-264)
and the fused analytic logML gradient (GaussianProcess.scala:166-187,
rebuilt as the N^3/2-MAC custom-VJP path in ``gpx.models.gp``).

TPU notes: the whole optimization loop is ONE compiled ``lax.scan`` —
every L-BFGS/Adam step (including zoom-linesearch logML re-evaluations)
runs on device with no host round-trips, and each logML+gradient is the
same fused Gram + chol_inv + contraction program the bench measures
(~110 ms/eval at N=16k, so a 100-step L-BFGS fit of a 16k-point GP is
~30 s of chip time instead of hours of autodiff).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax import lax

from gpx.models import gp
from gpx.params import Parameters, constrain, unconstrain, unraveler
from gpx.ops.distance import check_xy


class OptimizeResult(NamedTuple):
    """Outcome of :func:`optimize`.

    ``params`` are on the constrained (natural) scale. ``value`` is the
    final objective on the log scale being maximized (logML, plus the log
    prior for MAP). ``values`` is the per-step trace of that quantity —
    monotone non-decreasing for L-BFGS up to linesearch failures — and
    ``grad_norm`` the final unconstrained-space gradient norm, the
    convergence diagnostic (``converged`` applies a simple threshold).
    """

    params: Parameters
    value: jax.Array
    values: jax.Array
    grad_norm: jax.Array
    converged: jax.Array


def optimize(
    params: Parameters,
    x,
    y,
    *,
    nugget: float = gp.LOGML_NUGGET,
    log_prior: Optional[Callable[[Parameters], jax.Array]] = None,
    steps: int = 100,
    optimizer: str = "lbfgs",
    learning_rate: float = 0.05,
    method: str = "analytic",
    grad_tol: float = 1e-3,
    history_size: int = 10,
    mesh=None,
    mesh_axis: str = "data",
    panel: int = 128,
    key=None,
    n_probes: int | None = None,
    lanczos_iters: int = 32,
    precond_rank: int = 0,
    deflate: int | None = None,
    chunk_steps: int | None = None,
) -> OptimizeResult:
    """Maximize the exact-GP marginal likelihood over hyperparameters.

    Runs in the unconstrained space given by each parameter's bijector
    (positivity etc. are automatic; the optimum is reported constrained).
    ``log_prior`` (a function of constrained :class:`Parameters`) turns
    MLE into MAP. ``optimizer`` is ``"lbfgs"`` (zoom linesearch; the
    default and the right choice for the smooth logML surface) or
    ``"adam"`` (``learning_rate`` applies; more robust very far from the
    optimum). ``method`` selects the gradient path, ``"analytic"`` (the
    fused trace-identity VJP) or ``"autodiff"`` (Cholesky VJP — use for
    x64 parity checks).

    Non-finite objective values (non-PSD Gram at extreme proposals) are
    mapped to ``+inf`` so the linesearch backtracks instead of poisoning
    the state, mirroring the samplers' NaN-guarded accepts (SURVEY.md §5
    failure detection).

    Passing a ``jax.sharding.Mesh`` as ``mesh`` runs every logML (and its
    gradient) fully distributed — Gram, panel Cholesky, and solves row-
    sharded over ``mesh_axis`` with the backward pass riding the same ICI
    collectives (``gpx.parallel.distributed_logml``) — i.e. multi-chip
    type-II MLE for data sets no single chip can factor. ``method`` is
    ignored in that case (AD through shard_map is the distributed
    analytic path) unless it is ``"iterative"``; ``panel`` is the
    factorization panel width.

    ``method="hybrid"`` optimizes the stochastic-exact hybrid logML
    (gpx.models.gp.log_marginal_likelihood_hybrid_vjp: spine
    factorization + probe-estimated trace terms, ~1.8x the exact eval at
    N=16k — PERF.md round 4). The probe key is fixed (``key``, default
    PRNGKey(0)) so steps are reproducible; requires
    ``optimizer="adam"`` — on ill-conditioned K the probe-estimated
    logdet correction can return finite garbage values that a zoom
    linesearch latches onto (measured), while Adam follows only the
    gradients. The optimum lands within the probe envelope (O(0.1-1)
    absolute on smooth-component gradients at ``n_probes=64``) — the
    MAP-warm-start engine ahead of exact refinement or MCMC. Same gate
    as ``logml_value_and_grad``'s hybrid: stationary Pallas-safe kernel
    (any N — off-512 sizes are identity-block padded, exactly).
    ``deflate`` selects the Hutch++ deflation rank (round 5; None =
    auto — see gp._logml_value_and_grad_hybrid), which removes most of
    the probe noise on smooth-hyperparameter gradients.

    ``method="iterative"`` optimizes the MATRIX-FREE logML estimate
    (gpx.models.gp_iterative: CG quadratic term, SLQ logdet, Hutchinson
    gradients with fresh probes per step) — type-II MLE at N beyond any
    dense factorization, GPyTorch's headline workflow. Requires
    ``optimizer="adam"`` (the stochastic gradients break a zoom
    linesearch) and accepts ``key``/``n_probes``/``lanczos_iters``/
    ``precond_rank``; with ``mesh=`` every matvec row-shards over the
    mesh (multi-chip matrix-free MLE). ``value``/``values`` are then SLQ
    estimates and ``converged`` reflects only finiteness + the (noisy)
    gradient-norm threshold.
    """
    x, y = check_xy(x, y)
    if optimizer not in ("lbfgs", "adam"):
        raise ValueError(f"unknown optimizer: {optimizer!r}")
    if n_probes is None:
        # per-method default: the hybrid path's documented probe envelope is
        # 64 (matching gp.log_marginal_likelihood_hybrid_vjp); the iterative
        # SLQ estimator redraws probes per step so 16 suffices
        n_probes = 64 if method == "hybrid" else 16

    bij = params.bijectors()
    u0 = unconstrain(bij, params)
    if jnp.issubdtype(x.dtype, jnp.floating):
        # optimize in the DATA's dtype (cast BEFORE flattening so unravel
        # reconstructs matching leaves): on the x64 CPU lane, f32 data with
        # default-constructed (f64) template params otherwise mixes dtypes
        # inside optax's linesearch cond (stored f64 value vs the f32
        # objective), which lax.cond rejects
        u0 = jax.tree_util.tree_map(
            lambda leaf: jnp.asarray(leaf, x.dtype), u0
        )
    flat0, unravel = unraveler(u0)

    if method == "iterative":
        if optimizer != "adam":
            raise ValueError(
                "method='iterative' has stochastic (SLQ/Hutchinson) "
                "gradients — use optimizer='adam'; a zoom linesearch "
                "cannot compare noisy objective values"
            )
        loglik = _iterative_loglik_vjp(
            x, y, nugget=nugget, n_probes=n_probes,
            lanczos_iters=lanczos_iters, precond_rank=precond_rank,
            mesh=mesh, mesh_axis=mesh_axis,
        )
        step_keys = jax.random.split(
            key if key is not None else jax.random.PRNGKey(0), steps + 1
        )
    elif mesh is not None:
        from gpx.parallel.dist_chol import distributed_logml

        def loglik(p):
            return distributed_logml(
                p, x, y, mesh, axis=mesh_axis, nugget=nugget, panel=panel
            )
    elif method == "analytic":
        loglik = gp.log_marginal_likelihood_analytic_vjp(x, y, nugget=nugget)
    elif method == "hybrid":
        if optimizer != "adam":
            raise ValueError(
                "method='hybrid' requires optimizer='adam': the probe-"
                "estimated logdet correction can return finite GARBAGE "
                "values (measured: +5.9e6 at an ordinary small-noise "
                "point) on ill-conditioned K, and a zoom linesearch "
                "latches onto them as huge improvements and wedges"
            )
        loglik = gp.log_marginal_likelihood_hybrid_vjp(
            x, y, nugget=nugget, probes=n_probes, probe_key=key,
            deflate=deflate,
        )
    elif method == "autodiff":
        def loglik(p):
            return gp.log_marginal_likelihood(p, x, y, nugget=nugget)
    else:
        raise ValueError(f"unknown method: {method!r}")

    def objective(uflat, kb=None):
        p = constrain(bij, unravel(uflat))
        val = loglik(p) if kb is None else loglik(p, kb)
        if log_prior is not None:
            val = val + log_prior(p)
        # +inf (not NaN) on failure: zoom linesearch compares against the
        # current value and shrinks the step; NaN fails every comparison
        return jnp.where(jnp.isfinite(val), -val, jnp.inf)

    return _run_flat_opt(
        objective, flat0, bij, unravel,
        optimizer=optimizer, steps=steps, learning_rate=learning_rate,
        history_size=history_size, grad_tol=grad_tol,
        step_keys=step_keys if method == "iterative" else None,
        chunk_steps=chunk_steps,
    )


def optimize_log_density(
    template,
    log_density: Callable,
    *,
    steps: int = 100,
    optimizer: str = "lbfgs",
    learning_rate: float = 0.05,
    grad_tol: float = 1e-3,
    history_size: int = 10,
    step_keys=None,
) -> OptimizeResult:
    """Maximize an arbitrary log density over any gpx parameter pytree.

    The generic core of :func:`optimize`: ``template`` is any pytree with
    a ``bijectors()`` method (``gpx.Parameters``, ``IcmParams``, a custom
    model's container) and ``log_density`` maps the constrained pytree to
    a scalar. The search runs in unconstrained bijector space as one
    compiled ``lax.scan`` of L-BFGS (zoom linesearch) or Adam steps —
    the deterministic counterpart to handing the same ``(template,
    log_density)`` pair to the samplers via
    ``mh.make_unconstrained_log_posterior``.

    ``step_keys`` (``steps + 1`` PRNG keys): for STOCHASTIC log densities
    (SLQ/Hutchinson estimates), ``log_density(p, key)`` receives a fresh
    key per step; requires ``optimizer="adam"`` (a zoom linesearch cannot
    compare noisy objective values)."""
    if optimizer not in ("lbfgs", "adam"):
        raise ValueError(f"unknown optimizer: {optimizer!r}")
    if step_keys is not None and optimizer != "adam":
        raise ValueError(
            "step_keys (stochastic log density) requires optimizer='adam'"
        )
    bij = template.bijectors()
    u0 = unconstrain(bij, template)
    flat0, unravel = unraveler(u0)

    def objective(uflat, kb=None):
        p = constrain(bij, unravel(uflat))
        val = log_density(p) if kb is None else log_density(p, kb)
        return jnp.where(jnp.isfinite(val), -val, jnp.inf)

    return _run_flat_opt(
        objective, flat0, bij, unravel,
        optimizer=optimizer, steps=steps, learning_rate=learning_rate,
        history_size=history_size, grad_tol=grad_tol, step_keys=step_keys,
    )


def _run_flat_opt(objective, flat0, bij, unravel, *, optimizer, steps,
                  learning_rate, history_size, grad_tol, step_keys,
                  chunk_steps=None):
    """Shared optimizer loop: one jitted ``lax.scan`` over L-BFGS/Adam
    steps on a flat unconstrained vector. ``step_keys`` (len steps+1)
    threads per-step PRNG keys into the objective for stochastic
    (SLQ/Hutchinson) estimates; None for deterministic objectives.

    ``chunk_steps``: run the scan in host-level chunks of at most this
    many steps (the optimizer state round-trips through the host between
    chunks — the math is identical, to f32 reproducibility). Use it to
    bound SINGLE-DEVICE-EXECUTION time: at N=16k a 60-step L-BFGS scan
    whose zoom linesearch backtracks heavily is one multi-minute device
    launch, which this environment's TPU worker killed reproducibly
    (data-dependent — 10-step chunks and single-eval Adam steps run
    clean; ROADMAP round 5); long single launches are also where
    preemption/watchdog limits live on real fleets."""
    if optimizer == "lbfgs":
        opt = optax.lbfgs(memory_size=history_size)
        value_and_grad = optax.value_and_grad_from_state(objective)

        def step(carry, _):
            uflat, opt_state = carry
            value, grad = value_and_grad(uflat, state=opt_state)
            gnorm = jnp.linalg.norm(grad)   # raw: NaN/inf must stay visible
            grad = jnp.where(jnp.isfinite(grad), grad, 0.0)
            updates, opt_state = opt.update(
                grad, opt_state, uflat,
                value=value, grad=grad, value_fn=objective,
            )
            uflat = optax.apply_updates(uflat, updates)
            return (uflat, opt_state), (value, gnorm)
    else:
        opt = optax.adam(learning_rate)

        def step(carry, kb):
            uflat, opt_state = carry
            value, grad = jax.value_and_grad(objective)(uflat, kb)
            gnorm = jnp.linalg.norm(grad)   # raw: NaN/inf must stay visible
            grad = jnp.where(jnp.isfinite(grad), grad, 0.0)
            updates, opt_state = opt.update(grad, opt_state, uflat)
            uflat = optax.apply_updates(uflat, updates)
            return (uflat, opt_state), (value, gnorm)

    scan_xs = step_keys[:-1] if step_keys is not None else None

    def final_eval(u_final):
        # final value AND gradient at the RETURNED iterate (the scan's
        # per-step trace is at pre-update points), jitted: an eager
        # objective(u_final) would re-pay a full O(N^3) logML (and, with
        # mesh=, an eager shard_map dispatch)
        return jax.value_and_grad(objective)(
            u_final, step_keys[-1] if step_keys is not None else None
        )

    if chunk_steps is None or chunk_steps >= steps:
        def run(uflat):
            (u_final, _), (vals, gnorms) = lax.scan(
                step, (uflat, opt.init(uflat)), scan_xs, length=steps
            )
            final_value, final_grad = final_eval(u_final)
            return (u_final, vals, gnorms, final_value,
                    jnp.linalg.norm(final_grad))

        u_final, vals, gnorms, final_obj, final_gnorm = jax.jit(run)(flat0)
    else:
        def scan_chunk(carry, xs, length):
            return lax.scan(step, carry, xs, length=length)

        chunk_fn = jax.jit(scan_chunk, static_argnums=2)
        carry = (flat0, opt.init(flat0))
        vals_l, gnorms_l = [], []
        done = 0
        while done < steps:
            length = min(chunk_steps, steps - done)
            xs = None if scan_xs is None else scan_xs[done:done + length]
            carry, (v, g) = chunk_fn(carry, xs, length)
            # block per chunk: each chunk must be its own bounded device
            # execution, or the async dispatches chain back into one
            jax.block_until_ready(carry[0])
            vals_l.append(v)
            gnorms_l.append(g)
            done += length
        u_final = carry[0]
        final_obj, final_grad = jax.jit(final_eval)(u_final)
        final_gnorm = jnp.linalg.norm(final_grad)
        vals = jnp.concatenate(vals_l)
        gnorms = jnp.concatenate(gnorms_l)

    converged = bool(jnp.isfinite(final_obj)) and bool(final_gnorm < grad_tol)
    return OptimizeResult(
        params=constrain(bij, unravel(u_final)),
        value=-final_obj,
        values=-vals,
        grad_norm=final_gnorm,
        converged=converged,
    )


def stochastic_log_density_vjp(run):
    """Wrap ``run(params, key) -> result`` (any object with ``.value`` and
    ``.grads``, e.g. the iterative logML estimators) into ``f(params, key)
    -> value`` whose reverse-mode gradient is ``result.grads`` — the glue
    that lets ``jax.grad`` consume estimators that package their own
    gradients. The key gets a symbolic-zero cotangent: it parameterizes
    the ESTIMATOR, not the model."""
    from jax.dtypes import float0
    import numpy as np

    @jax.custom_vjp
    def f(p, kb):
        return run(p, kb).value

    def fwd(p, kb):
        res = run(p, kb)
        return res.value, (res.grads, kb)

    def bwd(residual, ct):
        grads, kb = residual
        key_ct = np.zeros(kb.shape, float0)
        return (jax.tree_util.tree_map(lambda g: g * ct, grads), key_ct)

    f.defvjp(fwd, bwd)
    return f


def _iterative_loglik_vjp(x, y, *, nugget, n_probes, lanczos_iters,
                          precond_rank, mesh, mesh_axis):
    """``(params, key) -> logML estimate`` whose reverse-mode gradient is
    the matrix-free Hutchinson estimate packaged by
    ``gp_iterative.logml_value_and_grad_iterative`` (CG-exact quadratic
    term; SLQ logdet; probes drawn from ``key``)."""
    from gpx.models.gp_iterative import logml_value_and_grad_iterative

    def _run(p, kb):
        return logml_value_and_grad_iterative(
            p, x, y, kb, nugget=nugget, n_probes=n_probes,
            lanczos_iters=lanczos_iters, precond_rank=precond_rank,
            mesh=mesh, mesh_axis=mesh_axis,
        )

    return stochastic_log_density_vjp(_run)
