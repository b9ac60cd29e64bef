"""MCMC diagnostics: ACF, ESS, split-R̂, posterior summaries.

Rebuild of ``Diagnostics`` (core/src/main/scala/gp/Diagnostics.scala) as pure
jnp functions (plot rendering lives in :mod:`gpx.plots`). The reference's
``acf`` normalizes the lagged sum by ``sum(x - mean)`` — a quantity that is
~0 by construction (Diagnostics.scala:19-28, a bug); here the standard
autocorrelation ``gamma(lag)/gamma(0)`` is computed via FFT. ESS and split-R̂
are added (the reference's TODO "accommodate multiple chains",
Diagnostics.scala:10).

Everything here is jit/vmap-able jnp (SURVEY.md §5's "pure-jnp" plan —
round 3 replaced the host-NumPy loops): ``summary`` vmaps ESS over chains
and parameters in one compiled call, so 16-chain x 100k-draw diagnostics
run on device instead of walking Python loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def acf(x, max_lag: int = 30):
    """Autocorrelation function at lags ``0..max_lag`` (FFT-based, jnp)."""
    x = jnp.asarray(x, dtype=jnp.result_type(float))
    n = x.shape[0]
    xc = x - jnp.mean(x)
    size = int(2 ** np.ceil(np.log2(max(2 * n, 2))))
    f = jnp.fft.rfft(xc, size)
    autocov = jnp.fft.irfft(f * jnp.conjugate(f))[: max_lag + 1].real / n
    return autocov / autocov[0]


def autocorrelation(x, lag: int):
    """Single-lag autocorrelation — the (corrected) Diagnostics.acf."""
    return float(acf(x, lag)[lag])


def ess(x):
    """Effective sample size via Geyer's initial monotone positive sequence
    — branch-free jnp (cumulative mask + running minimum), so it vmaps
    over chains/parameters and runs under jit."""
    x = jnp.asarray(x, dtype=jnp.result_type(float))
    n = x.shape[0]
    rho = acf(x, max_lag=min(n - 2, 1000))
    # pair sums rho[2t+1] + rho[2t+2]; truncate at the first negative pair,
    # then enforce monotone non-increase via a running minimum
    pair = rho[1:-1:2] + rho[2::2]
    valid = jnp.cumprod(pair >= 0.0) > 0
    running_min = jax.lax.associative_scan(jnp.minimum, pair)
    tau = 1.0 + 2.0 * jnp.sum(jnp.where(valid, running_min, 0.0))
    return n / tau


def split_rhat(chains):
    """Split-R̂ (Gelman et al.) over ``(n_chains, n_draws)`` draws (jnp)."""
    c = jnp.asarray(chains, dtype=jnp.result_type(float))
    if c.ndim == 1:
        c = c[None, :]
    m, n = c.shape
    half = n // 2
    splits = jnp.concatenate([c[:, :half], c[:, half : 2 * half]], axis=0)
    n2 = splits.shape[1]
    chain_means = jnp.mean(splits, axis=1)
    chain_vars = jnp.var(splits, axis=1, ddof=1)
    w = jnp.mean(chain_vars)
    b = n2 * jnp.var(chain_means, ddof=1)
    var_plus = (n2 - 1) / n2 * w + b / n2
    return jnp.sqrt(var_plus / w)


@jax.jit
def _summary_stats(flat):
    """All per-parameter statistics in one compiled pass:
    ``flat (n_chains, n_draws, dim)`` -> dict of (dim,) arrays."""
    pooled = flat.reshape(-1, flat.shape[-1])
    qs = jnp.percentile(pooled, jnp.asarray([5.0, 50.0, 95.0]), axis=0)
    # ESS vmapped over (chain, parameter); summed over chains per parameter
    ess_cp = jax.vmap(jax.vmap(ess, in_axes=1), in_axes=0)(flat)
    rhat = jax.vmap(split_rhat, in_axes=2)(flat)
    return {
        "mean": jnp.mean(pooled, axis=0),
        "sd": jnp.std(pooled, axis=0, ddof=1),
        "median": qs[1],
        "q5": qs[0],
        "q95": qs[2],
        "ess": jnp.sum(ess_cp, axis=0),
        "rhat": rhat,
    }


def summary(flat, names):
    """Per-parameter posterior table from ``(n_chains, n_draws, dim)`` draws:
    mean, sd, central 90% interval, ESS (pooled), split-R̂. One jitted
    device pass computes every statistic for every parameter."""
    flat = jnp.asarray(flat)
    if flat.ndim == 2:
        flat = flat[None]
    stats = jax.tree_util.tree_map(np.asarray, _summary_stats(flat))
    return {
        name: {k: float(v[j]) for k, v in stats.items()}
        for j, name in enumerate(names)
    }


def format_summary(rows: dict) -> str:
    header = f"{'param':<22}{'mean':>10}{'sd':>10}{'5%':>10}{'95%':>10}{'ess':>9}{'rhat':>8}"
    lines = [header]
    for name, r in rows.items():
        lines.append(
            f"{name:<22}{r['mean']:>10.4f}{r['sd']:>10.4f}{r['q5']:>10.4f}"
            f"{r['q95']:>10.4f}{r['ess']:>9.0f}{r['rhat']:>8.3f}"
        )
    return "\n".join(lines)
