"""Stochastic variational GP (SVGP): uncollapsed, minibatched inducing-point
regression (Hensman et al., "Gaussian Processes for Big Data", 2013).

Beyond the reference (which is dense-exact only): completes the sparse
family next to the collapsed SGPR bound (gpx.models.sparse). Where SGPR
optimizes hyperparameters against a bound computed from ALL data per step
(O(N M^2)), SVGP carries an explicit variational posterior ``q(u) =
N(mu, S)`` over inducing outputs so each optimization step touches only a
minibatch — O(B M^2) — and the bound is an unbiased estimate of the full
ELBO. That makes hyperparameters, inducing locations and the variational
state jointly trainable by any first-order optimizer at N far beyond the
dense path.

TPU shape: every step is (B, M) / (M, M) matmuls (MXU) inside one jit;
the training loop is a ``lax.scan`` with per-step ``jax.random`` minibatch
draws, so the whole optimization compiles to a single program.

Whitened parameterization (the standard stable choice): ``u = Luu v``,
``q(v) = N(mu, S)`` with ``S = C C^T`` for a lower-triangular ``C`` kept
unconstrained as ``c_raw`` (strict lower triangle free, diagonal through
``exp``). KL(q||p) is then the standard-normal form
``0.5 (||mu||^2 + tr(S) - logdet S - M)`` — no Kuu solves in the KL.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpx.ops.chol import cholesky, forward_solve
from gpx.ops.distance import as_locations
from gpx.params import Parameters

from gpx.models.sparse import JITTER, JITTER_F32, _jitter  # noqa: F401
# (single source of truth for the Kuu regularization policy — see
# gpx.models.sparse for the measured f32 rationale)


class SVGPState(NamedTuple):
    """Variational state: whitened mean and unconstrained Cholesky factor."""

    mu: jnp.ndarray      # (M,)
    c_raw: jnp.ndarray   # (M, M); tril(-1) free, diag through exp


def init_state(m: int, dtype=jnp.float32) -> SVGPState:
    """q(v) = N(0, I) start (equal to the whitened prior: zero KL)."""
    return SVGPState(mu=jnp.zeros((m,), dtype), c_raw=jnp.zeros((m, m), dtype))


def _c_factor(c_raw):
    lower = jnp.tril(c_raw, -1)
    diag = jnp.exp(jnp.diagonal(c_raw))
    return lower + jnp.diag(diag)


def _whitened_features(params: Parameters, z, xb):
    """``a_i = Luu^{-1} k(z, x_i)`` columns for a batch — (M, B).

    ``GPX_SVGP_SOLVER=inv`` (A/B knob, MEASURED NEGATIVE at M=1024 —
    PERF.md round 5): materialize ``Luu^{-1}`` via the blocked recursion
    and apply it as one HIGHEST-precision matmul instead of XLA's
    ``triangular_solve``. The matmul form wins in the dense-16k path,
    but in the SVGP step it measured 50.3 vs 40.0 ms/step (and ~6e-5
    relative ELBO accuracy cost from the explicit inverse) — at this M
    the solve is not latency-dominated. Kept for other M/B regimes and
    future hardware; the solve stays the default.
    """
    import os

    z = as_locations(z)
    kuu = params.kernel.gram(z, nugget=_jitter(z.dtype))
    luu = cholesky(kuu)
    kuf = params.kernel.gram(z, xb)
    if os.environ.get("GPX_SVGP_SOLVER") == "inv":
        from gpx.ops.chol import tri_inverse_lower

        luu_inv = tri_inverse_lower(luu)
        # HIGHEST: `a` feeds the predictive variance through ||a||^2; the
        # bf16 matmul default costs ~3 digits there (CLAUDE.md)
        a = jnp.matmul(luu_inv, kuf, precision=jax.lax.Precision.HIGHEST)
        return a, luu
    return forward_solve(luu, kuf), luu


def kl(state: SVGPState):
    """KL(q(v) || N(0, I)) in the whitened space."""
    c = _c_factor(state.c_raw)
    m = state.mu.shape[0]
    return 0.5 * (
        state.mu @ state.mu
        + jnp.sum(c * c)
        - 2.0 * jnp.sum(jnp.diagonal(state.c_raw))
        - m
    )


def elbo_minibatch(
    params: Parameters, z, state: SVGPState, xb, yb, *, n_total: int,
    noise: float,
):
    """Unbiased ELBO estimate from one minibatch (Gaussian likelihood).

    ``E_q[log p(y_i | f_i)]`` is closed-form: with ``m_i = a_i^T mu + mean``
    and ``v_i = k_ii - ||a_i||^2 + ||C^T a_i||^2``,
    ``-0.5 log(2 pi s2) - ((y_i - m_i)^2 + v_i) / (2 s2)`` — scaled by
    ``n_total / B``, minus the (full) KL.
    """
    xb = as_locations(xb)
    z = as_locations(z)
    b = xb.shape[0]
    a, _ = _whitened_features(params, z, xb)       # (M, B)
    c = _c_factor(state.c_raw)
    mean_b = params.mean(xb) + a.T @ state.mu
    kff = params.kernel.diag(xb, dtype=mean_b.dtype)
    # HIGHEST on c.T @ a: matrix-matrix into a variance (sum of squares);
    # the chip's bf16 default costs ~3 digits there (M is small)
    ca = jnp.matmul(c.T, a, precision=jax.lax.Precision.HIGHEST)
    var_b = kff - jnp.sum(a * a, axis=0) + jnp.sum(ca ** 2, axis=0)
    s2 = noise
    exp_ll = -0.5 * jnp.log(2.0 * jnp.pi * s2) - 0.5 * (
        (yb - mean_b) ** 2 + var_b
    ) / s2
    return (n_total / b) * jnp.sum(exp_ll) - kl(state)


class SVGPSummary(NamedTuple):
    x: jnp.ndarray
    mean: jnp.ndarray
    variance: jnp.ndarray


def fit(params: Parameters, z, state: SVGPState, xs, *, noise: float = 0.0):
    """Predictive q(f*) (add ``noise`` for the observation predictive)."""
    xs = as_locations(xs)
    a, _ = _whitened_features(params, z, xs)
    c = _c_factor(state.c_raw)
    mean = params.mean(xs) + a.T @ state.mu
    kss = params.kernel.diag(xs, dtype=mean.dtype)
    ca = jnp.matmul(c.T, a, precision=jax.lax.Precision.HIGHEST)  # see elbo
    var = kss - jnp.sum(a * a, axis=0) + jnp.sum(ca ** 2, axis=0)
    return SVGPSummary(x=xs, mean=mean, variance=jnp.maximum(var, 0.0) + noise)


def train(
    key,
    params: Parameters,
    z,
    x,
    y,
    *,
    noise: float,
    batch_size: int = 256,
    steps: int = 1000,
    learning_rate: float = 1e-2,
    train_inducing: bool = True,
    train_hyper: bool = True,
    train_noise: bool = False,
    mesh=None,
    mesh_axis: str = "data",
):
    """Adam on the minibatch ELBO over (state, hyperparameters, inducing
    locations, optionally the observation noise) as one ``lax.scan``
    program.

    Returns ``(params, z, state, noise, elbo_trace)``. Hyperparameters are
    optimized through their bijectors (unconstrained space), mirroring the
    samplers (KernelParameters.scala:251-264's constrain/unconstrain);
    noise trains on the log scale.

    ``mesh=`` trains DATA-PARALLEL over ``mesh[mesh_axis]``: ``x``/``y``
    are row-sharded, each device draws ``batch_size / n_devices`` points
    from its own shard per step, and the devices' likelihood terms are
    combined with one ``pmean`` per step (the only communication — the
    O(M^2)-sized variational state, hyperparameters and optimizer state
    stay replicated). The combined estimator is exactly as unbiased as
    the single-device one: each device's ``(N / B_loc) sum_local`` term
    estimates the full-data likelihood from its shard, and the pmean
    averages D such estimates. ``batch_size`` is the GLOBAL batch."""
    import optax

    from gpx.params import constrain, unconstrain

    x = as_locations(x)
    z = as_locations(z)
    n_total = x.shape[0]
    state = init_state(z.shape[0], dtype=x.dtype)

    bijs = params.bijectors()
    u_params = unconstrain(bijs, params)

    trainable = {"state": state}
    if train_hyper:
        trainable["params"] = u_params
    if train_inducing:
        trainable["z"] = z
    if train_noise:
        trainable["log_noise"] = jnp.log(jnp.asarray(noise, x.dtype))

    opt = optax.adam(learning_rate)
    opt_state = opt.init(trainable)

    def make_step(loss_fn):
        def step(carry, kb):
            tr, os = carry
            loss, grads = jax.value_and_grad(loss_fn)(tr, kb)
            updates, os = opt.update(grads, os, tr)
            tr = optax.apply_updates(tr, updates)
            return (tr, os), -loss
        return step

    keys = jax.random.split(key, steps)

    if mesh is None:
        def loss_fn(tr, kb):
            p = constrain(bijs, tr.get("params", u_params))
            zz = tr.get("z", z)
            s2 = jnp.exp(tr["log_noise"]) if train_noise else noise
            idx = jax.random.choice(kb, n_total, (batch_size,), replace=False)
            return -elbo_minibatch(
                p, zz, tr["state"], x[idx], y[idx], n_total=n_total, noise=s2
            )

        (trainable, _), trace = jax.lax.scan(
            make_step(loss_fn), (trainable, opt_state), keys
        )
    else:
        from jax import lax
        from jax.sharding import PartitionSpec as P

        d = mesh.shape[mesh_axis]
        if n_total % d or batch_size % d:
            raise ValueError(
                f"data-parallel SVGP needs n ({n_total}) and batch_size "
                f"({batch_size}) divisible by the {d}-device mesh axis"
            )
        b_loc = batch_size // d

        def body(tr0, os0, x_loc, y_loc, keys):
            n_loc = x_loc.shape[0]

            def loss_fn(tr, kb):
                p = constrain(bijs, tr.get("params", u_params))
                zz = tr.get("z", z)
                s2 = jnp.exp(tr["log_noise"]) if train_noise else noise
                kd = jax.random.fold_in(kb, lax.axis_index(mesh_axis))
                idx = jax.random.choice(kd, n_loc, (b_loc,), replace=False)
                # per-device unbiased full-likelihood estimate, KL once:
                # elbo_minibatch returns (N / b_loc) sum_local - KL; pmean
                # of the likelihood parts + the (replicated) KL recovers
                # the global-batch estimator exactly
                e_loc = elbo_minibatch(
                    p, zz, tr["state"], x_loc[idx], y_loc[idx],
                    n_total=n_total, noise=s2,
                )
                k = kl(tr["state"])
                return -(lax.pmean(e_loc + k, mesh_axis) - k)

            return jax.lax.scan(make_step(loss_fn), (tr0, os0), keys)

        (trainable, _), trace = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(), P(mesh_axis, None), P(mesh_axis), P()),
            out_specs=((P(), P()), P()),
        ))(trainable, opt_state, x, y, keys)

    out_params = (
        constrain(bijs, trainable["params"]) if train_hyper else params
    )
    out_z = trainable.get("z", z)
    out_noise = (
        jnp.exp(trainable["log_noise"]) if train_noise
        else jnp.asarray(noise, x.dtype)
    )
    return out_params, out_z, trainable["state"], out_noise, trace
