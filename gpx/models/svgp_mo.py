"""Multi-output SVGP: minibatched variational LMC over inducing points.

The scalable UNSTRUCTURED multi-output leg: where
`gpx.models.multioutput_iterative` is exact-but-iterative (CG/SLQ over
the streamed Kronecker matvec) and `gpx.models.gridgp` needs a lattice,
this trains on arbitrary (x, all-T-outputs) rows at O(B M² Q) per step —
the LMC form of Hensman et al.'s big-data bound, the multi-output
counterpart of `gpx.models.svgp` (whose whitened-state design it reuses
per latent process).

Model: Q independent latent GPs ``g_q ~ GP(0, k_q)`` mixed linearly into
T outputs, ``f_t(x) = Σ_q W[t, q] g_q(x)``, ``y_t ~ N(f_t, noise_t)`` —
the sparse counterpart of `multioutput.LmcParams` (coupling `B_q =
w_q w_qᵀ` of rank 1 per latent; stack more latents for higher rank).
Each latent has its own whitened variational posterior over shared
inducing locations; the Gaussian likelihood keeps the per-entry expected
log-likelihood closed-form:

    mean[b, t] = Σ_q W[t, q] m_q[b],   var[b, t] = Σ_q W[t, q]² v_q[b].

Beyond the reference (its multi-sensor coverage is the 8-sensor DLM,
TemperatureDlm.scala:83-118). TPU shape: per step, Q small (M, M)
Choleskys + (M, B) trsm/matmuls and one (B, T) elementwise pass, all
MXU-friendly inside one `lax.scan` program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpx import bijectors as bij
from gpx.models.svgp import _c_factor, _jitter
from gpx.ops.chol import cholesky, forward_solve
from gpx.ops.distance import as_locations
from gpx.utils.pytree import pytree_dataclass

HI = jax.lax.Precision.HIGHEST


@pytree_dataclass
class MoSVGPParams:
    """Q latent kernels + (T, Q) mixing matrix."""

    kernels: tuple
    w: jnp.ndarray

    @property
    def n_latent(self) -> int:
        return len(self.kernels)

    @property
    def n_outputs(self) -> int:
        return self.w.shape[0]

    def bijectors(self) -> "MoSVGPParams":
        return MoSVGPParams(
            kernels=tuple(k.bijectors() for k in self.kernels),
            w=bij.identity,
        )


def mo_svgp(kernels, n_outputs: int, *, w=None) -> MoSVGPParams:
    """Constructor; default ``W`` is the staggered near-equal mix (same
    degeneracy rationale as ``multioutput.icm``)."""
    kernels = tuple(kernels)
    q = len(kernels)
    if w is None:
        ramp = 1.0 + 0.05 * jnp.arange(n_outputs)[:, None]
        w = ramp * jnp.full((n_outputs, q), q ** -0.5)
    return MoSVGPParams(kernels=kernels,
                        w=jnp.asarray(w, jnp.result_type(float)))


class MoSVGPState(NamedTuple):
    """Per-latent whitened variational states, stacked on axis 0."""

    mu: jnp.ndarray      # (Q, M)
    c_raw: jnp.ndarray   # (Q, M, M)


def init_state(q: int, m: int, dtype=jnp.float32) -> MoSVGPState:
    return MoSVGPState(mu=jnp.zeros((q, m), dtype),
                       c_raw=jnp.zeros((q, m, m), dtype))


def _latent_moments(p: MoSVGPParams, z, state: MoSVGPState, xb):
    """Per-latent predictive moments at ``xb``: ``m_q`` (Q, B) and
    ``v_q`` (Q, B) under the whitened q(v_q)."""
    z = as_locations(z)
    xb = as_locations(xb)
    ms, vs = [], []
    for qi, kern in enumerate(p.kernels):
        kuu = kern.gram(z, nugget=_jitter(z.dtype))
        luu = cholesky(kuu)
        a = forward_solve(luu, kern.gram(z, xb))          # (M, B)
        c = _c_factor(state.c_raw[qi])
        ms.append(a.T @ state.mu[qi])
        kff = kern.diag(xb, dtype=a.dtype)
        vs.append(kff - jnp.sum(a * a, axis=0)
                  + jnp.sum(jnp.matmul(c.T, a, precision=HI) ** 2, axis=0))
    return jnp.stack(ms), jnp.stack(vs)


def kl(state: MoSVGPState):
    """Σ_q KL(q(v_q) || N(0, I)) — whitened standard-normal form."""
    def one(mu, c_raw):
        c = _c_factor(c_raw)
        return 0.5 * (mu @ mu + jnp.sum(c * c)
                      - 2.0 * jnp.sum(jnp.diagonal(c_raw)) - mu.shape[0])

    return jnp.sum(jax.vmap(one)(state.mu, state.c_raw))


def elbo_minibatch(p: MoSVGPParams, z, state: MoSVGPState, xb, Yb, *,
                   n_total: int, noise, mask_b=None):
    """Unbiased multi-output ELBO estimate from one minibatch of rows.

    ``Yb`` (B, T); ``noise`` scalar or (T,); ``mask_b`` (B, T) boolean
    drops missing entries from the likelihood (the N/B row scaling stays
    unbiased for a fixed mask)."""
    b = jnp.asarray(Yb).shape[0]
    m_q, v_q = _latent_moments(p, z, state, xb)           # (Q, B) each
    w = p.w                                               # (T, Q)
    mean_bt = jnp.einsum("tq,qb->bt", w, m_q, precision=HI)
    var_bt = jnp.einsum("tq,qb->bt", w * w, v_q, precision=HI)
    s2 = jnp.broadcast_to(jnp.asarray(noise), (p.n_outputs,))
    exp_ll = -0.5 * jnp.log(2.0 * jnp.pi * s2)[None, :] - 0.5 * (
        (Yb - mean_bt) ** 2 + var_bt
    ) / s2[None, :]
    if mask_b is not None:
        exp_ll = jnp.where(mask_b, exp_ll, 0.0)
    return (n_total / b) * jnp.sum(exp_ll) - kl(state)


class MoSVGPSummary(NamedTuple):
    x: jnp.ndarray
    mean: jnp.ndarray       # (M*, T)
    variance: jnp.ndarray   # (M*, T)

    def interval(self, q):
        from gpx.distributions import Normal

        return Normal(self.mean, jnp.sqrt(self.variance)).ppf(q)


def fit(p: MoSVGPParams, z, state: MoSVGPState, xs, *,
        noise=0.0) -> MoSVGPSummary:
    """Predictive q(f*) per output (add ``noise`` — scalar or (T,) — for
    the observation predictive)."""
    xs = as_locations(xs)
    m_q, v_q = _latent_moments(p, z, state, xs)
    mean = jnp.einsum("tq,qb->bt", p.w, m_q, precision=HI)
    var = jnp.einsum("tq,qb->bt", p.w * p.w, v_q, precision=HI)
    s2 = jnp.broadcast_to(jnp.asarray(noise), (p.n_outputs,))
    return MoSVGPSummary(x=xs, mean=mean,
                         variance=jnp.maximum(var, 0.0) + s2[None, :])


def train(key, p: MoSVGPParams, z, x, Y, *, noise, batch_size: int = 256,
          steps: int = 1000, learning_rate: float = 1e-2,
          train_inducing: bool = True, train_hyper: bool = True,
          train_noise: bool = False, mask=None):
    """Adam on the minibatch multi-output ELBO — one ``lax.scan`` program
    over (variational states, kernels + W, inducing locations, optionally
    per-output noise), mirroring `gpx.models.svgp.train`.

    Returns ``(params, z, state, noise, elbo_trace)``."""
    import optax

    from gpx.params import constrain, unconstrain

    x = as_locations(x)
    z = as_locations(z)
    Y = jnp.asarray(Y)
    n_total = x.shape[0]
    if Y.shape != (n_total, p.n_outputs):
        raise ValueError(
            f"Y has shape {Y.shape}; expected ({n_total}, {p.n_outputs})"
        )
    state = init_state(p.n_latent, z.shape[0], dtype=x.dtype)
    noise0 = jnp.broadcast_to(
        jnp.asarray(noise, x.dtype), (p.n_outputs,)
    )
    if mask is not None:
        mask = jnp.asarray(mask, bool)

    bijs = p.bijectors()
    u_params = unconstrain(bijs, p)

    trainable = {"state": state}
    if train_hyper:
        trainable["params"] = u_params
    if train_inducing:
        trainable["z"] = z
    if train_noise:
        trainable["log_noise"] = jnp.log(noise0)

    opt = optax.adam(learning_rate)
    opt_state = opt.init(trainable)

    def loss_fn(tr, kb):
        pc = constrain(bijs, tr.get("params", u_params))
        zz = tr.get("z", z)
        s2 = jnp.exp(tr["log_noise"]) if train_noise else noise0
        idx = jax.random.choice(kb, n_total, (batch_size,), replace=False)
        mb = None if mask is None else mask[idx]
        return -elbo_minibatch(
            pc, zz, tr["state"], x[idx], Y[idx], n_total=n_total,
            noise=s2, mask_b=mb,
        )

    def step(carry, kb):
        tr, os = carry
        loss, grads = jax.value_and_grad(loss_fn)(tr, kb)
        updates, os = opt.update(grads, os, tr)
        tr = optax.apply_updates(tr, updates)
        return (tr, os), -loss

    keys = jax.random.split(key, steps)
    (trainable, _), trace = jax.lax.scan(step, (trainable, opt_state), keys)

    out_params = constrain(bijs, trainable["params"]) if train_hyper else p
    out_z = trainable.get("z", z)
    out_noise = (jnp.exp(trainable["log_noise"]) if train_noise
                 else noise0)
    return out_params, out_z, trainable["state"], out_noise, trace
