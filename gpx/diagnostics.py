"""MCMC diagnostics: ACF, ESS, split-R̂, posterior summaries.

Rebuild of ``Diagnostics`` (core/src/main/scala/gp/Diagnostics.scala) as pure
jnp functions (plot rendering lives in :mod:`gpx.plots`). The reference's
``acf`` normalizes the lagged sum by ``sum(x - mean)`` — a quantity that is
~0 by construction (Diagnostics.scala:19-28, a bug); here the standard
autocorrelation ``gamma(lag)/gamma(0)`` is computed via FFT. ESS and split-R̂
are added (the reference's TODO "accommodate multiple chains",
Diagnostics.scala:10).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def acf(x, max_lag: int = 30):
    """Autocorrelation function at lags ``0..max_lag`` (FFT-based)."""
    x = np.asarray(x, dtype=float)
    n = x.shape[0]
    xc = x - x.mean()
    size = int(2 ** np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(xc, size)
    autocov = np.fft.irfft(f * np.conjugate(f))[: max_lag + 1].real / n
    return autocov / autocov[0]


def autocorrelation(x, lag: int):
    """Single-lag autocorrelation — the (corrected) Diagnostics.acf."""
    return float(acf(x, lag)[lag])


def ess(x):
    """Effective sample size via Geyer's initial monotone positive sequence."""
    x = np.asarray(x, dtype=float)
    n = x.shape[0]
    rho = acf(x, max_lag=min(n - 2, 1000))
    # pair sums rho[2t] + rho[2t+1]; truncate at first negative, enforce monotone
    pair = rho[1:-1:2] + rho[2::2]
    tau = 1.0
    running_min = np.inf
    for p in pair:
        if p < 0:
            break
        running_min = min(running_min, p)
        tau += 2.0 * running_min
    return n / tau


def split_rhat(chains):
    """Split-R̂ (Gelman et al.) over ``(n_chains, n_draws)`` draws."""
    c = np.asarray(chains, dtype=float)
    if c.ndim == 1:
        c = c[None, :]
    m, n = c.shape
    half = n // 2
    splits = np.concatenate([c[:, :half], c[:, half : 2 * half]], axis=0)
    m2, n2 = splits.shape
    chain_means = splits.mean(axis=1)
    chain_vars = splits.var(axis=1, ddof=1)
    w = chain_vars.mean()
    b = n2 * chain_means.var(ddof=1)
    var_plus = (n2 - 1) / n2 * w + b / n2
    return float(np.sqrt(var_plus / w))


def summary(flat, names):
    """Per-parameter posterior table from ``(n_chains, n_draws, dim)`` draws:
    mean, sd, central 90% interval, ESS (pooled), split-R̂."""
    flat = np.asarray(flat)
    if flat.ndim == 2:
        flat = flat[None]
    rows = {}
    for j, name in enumerate(names):
        d = flat[:, :, j]
        pooled = d.reshape(-1)
        rows[name] = {
            "mean": float(pooled.mean()),
            "sd": float(pooled.std(ddof=1)),
            "median": float(np.median(pooled)),
            "q5": float(np.percentile(pooled, 5)),
            "q95": float(np.percentile(pooled, 95)),
            "ess": float(sum(ess(d[i]) for i in range(d.shape[0]))),
            "rhat": split_rhat(d),
        }
    return rows


def format_summary(rows: dict) -> str:
    header = f"{'param':<22}{'mean':>10}{'sd':>10}{'5%':>10}{'95%':>10}{'ess':>9}{'rhat':>8}"
    lines = [header]
    for name, r in rows.items():
        lines.append(
            f"{name:<22}{r['mean']:>10.4f}{r['sd']:>10.4f}{r['q5']:>10.4f}"
            f"{r['q95']:>10.4f}{r['ess']:>9.0f}{r['rhat']:>8.3f}"
        )
    return "\n".join(lines)
