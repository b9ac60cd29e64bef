"""Iterative panel sweep with depth-1 lookahead vs the binary recursion
(round 4, VERDICT Next-2 A/B).

The VERDICT asked for a lookahead restructure of `chol_inv`'s serially-
dependent leaf chain: overlap panel k+1's diagonal factorization with
panel k's trailing update. On a TPU core that overlap is STRUCTURAL, not
temporal — XLA executes one op at a time per core and already schedules
the (single) dataflow graph freely, so "issuing the leaf early" can only
help by changing the graph the scheduler sees (kernel granularity,
operand locality), never by running two compute ops concurrently. This
benchmark measures exactly that restructure:

* ``panel``: flat right-looking factorization, panels of `base` — leaf
  `chol_inv_tile` -> one rectangular trmm -> one rank-`base` syrk_lower
  per panel (vs the recursion's log-depth mix of sweep sizes); inverse
  assembled by the same binary M21 trmms as `_rec_value` from the leaf
  inverses.
* ``lookahead``: same, but each panel's trailing update is split so the
  NEXT panel's diagonal block is updated and its leaf factorization
  enters the graph before the bulk syrk/strip updates are issued
  (depth-1 lookahead order).

Both produce (L, M) with the same MAC count as `chol_inv` (the lookahead
variant re-associates, never recomputes). Compare ms/call and agreement
vs the production `chol_inv` at N=16384 on chip.

Usage: python -u benchmarks/panel_lookahead_ab.py [N] [--check]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gpx.ops.pallas_chol import chol_inv, chol_inv_tile
from gpx.ops.pallas_trmm import _dot_bf16x3, syrk_lower, trmm

INTERPRET = False


def _factor_panels(a, base, bt, lookahead):
    """Flat right-looking L sweep. Returns (ldiags, mdiags, panels)."""
    n = a.shape[-1]
    nb = n // base
    kw = dict(bt=bt, interpret=INTERPRET)
    ldiags, mdiags, panels = [], [], []
    pending = None  # lookahead-prefactored (lkk, mkk) of the current panel
    trail = a
    for k in range(nb):
        r = trail.shape[0] - base
        lkk, mkk = (pending if pending is not None
                    else chol_inv_tile(trail[:base, :base],
                                       interpret=INTERPRET))
        pending = None
        ldiags.append(lkk)
        mdiags.append(mkk)
        if r == 0:
            break
        lk = trmm(trail[base:, :base], mkk, mode="right_lower_t",
                  n=base, m=r, **kw)
        panels.append(lk)
        t22 = trail[base:, base:]
        if lookahead and r >= 2 * base:
            # depth-1 lookahead: next diagonal block updated + factored
            # FIRST, then the bulk updates (strip + trailing syrk)
            nd = syrk_lower(t22[:base, :base], lk[:base], **kw)
            pending = chol_inv_tile(nd, interpret=INTERPRET)
            strip = t22[base:, :base] - _dot_bf16x3(
                lk[base:], lk[:base], dn=(((1,), (1,)), ((), ()))
            )
            rest = syrk_lower(t22[base:, base:], lk[base:], **kw)
            trail = jnp.concatenate(
                [
                    jnp.concatenate([nd, jnp.zeros((base, r - base),
                                                   jnp.float32)], 1),
                    jnp.concatenate([strip, rest], 1),
                ],
                0,
            )
        else:
            trail = syrk_lower(t22, lk, **kw)
    return ldiags, mdiags, panels


def _assemble_l(ldiags, panels, n, base):
    nb = n // base
    cols = []
    for k in range(nb):
        parts = []
        if k:
            parts.append(jnp.zeros((k * base, base), jnp.float32))
        parts.append(ldiags[k])
        if k < nb - 1:
            parts.append(panels[k])
        cols.append(jnp.concatenate(parts, 0))
    return jnp.concatenate(cols, 1)


def _m_rec(l, mdiags, lo, t, base, bt):
    """Binary inverse assembly from leaf inverses + the assembled L —
    the exact M21 trmm structure of pallas_chol._rec_value."""
    if t == base:
        return mdiags[lo // base]
    h = t // 2
    kw = dict(bt=bt, interpret=INTERPRET)
    m11 = _m_rec(l, mdiags, lo, h, base, bt)
    m22 = _m_rec(l, mdiags, lo + h, h, base, bt)
    l21 = l[lo + h : lo + t, lo : lo + h]
    t1 = trmm(l21, m11, mode="right_lower", neg=True, m=h, **kw)
    m21 = trmm(t1, m22, mode="left_lower", **kw)
    z = jnp.zeros((h, h), jnp.float32)
    return jnp.concatenate(
        [jnp.concatenate([m11, z], 1), jnp.concatenate([m21, m22], 1)], 0
    )


def chol_inv_panel(a, *, base=2048, bt=512, lookahead=False):
    n = a.shape[-1]
    ldiags, mdiags, panels = _factor_panels(a, base, bt, lookahead)
    l = _assemble_l(ldiags, panels, n, base)
    m = _m_rec(l, mdiags, 0, n, base, bt)
    return l, m


def time_calls(fn, arg, reps=5):
    out = fn(arg)
    jax.block_until_ready(out)
    float(jnp.sum(out[0]))
    out = fn(arg)
    float(jnp.sum(out[0]))  # two consumed warm calls (ROADMAP-24)
    t0 = time.time()
    for _ in range(reps):
        out = fn(arg)
    float(jnp.sum(out[0]) + jnp.sum(out[1]))
    return (time.time() - t0) / reps


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 16384
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(-10, 10, size=n)).astype(np.float32)
    d2 = (x[:, None] - x[None, :]) ** 2
    k = (5.5 * np.exp(-0.5 * d2 / 9.0) + 0.5 * np.eye(n) + 1e-3 * np.eye(n))
    k = jnp.asarray(k, jnp.float32)

    variants = [
        ("recursion (production chol_inv)", jax.jit(chol_inv)),
        ("panel", jax.jit(lambda a: chol_inv_panel(a, lookahead=False))),
        ("panel+lookahead", jax.jit(lambda a: chol_inv_panel(a,
                                                             lookahead=True))),
    ]
    ref = None
    for name, fn in variants:
        t0 = time.time()
        l, m = fn(k)
        jax.block_until_ready(m)
        compile_s = time.time() - t0
        ms = time_calls(fn, k) * 1e3
        # compare LOWER triangles only: syrk_lower/the panel assemblies
        # leave upper tiles uninitialized (on chip: garbage, possibly NaN);
        # residual computed on device (a 16k matmul is minutes on this host)
        l = jnp.tril(l)
        m = jnp.tril(m)
        resid = float(jax.jit(
            lambda l, k: jnp.abs(
                jnp.dot(l, l.T, precision=jax.lax.Precision.HIGHEST) - k
            ).max()
        )(l, k))
        if ref is None:
            ref = (l, m)
            print(f"{name}: {ms:.1f} ms/call (compile {compile_s:.0f}s)  "
                  f"|LL^T-A|={resid:.3g}")
        else:
            dl = float(jnp.abs(l - ref[0]).max())
            dm = float(jnp.abs(m - ref[1]).max())
            print(f"{name}: {ms:.1f} ms/call (compile {compile_s:.0f}s)  "
                  f"|LL^T-A|={resid:.3g} |dL|={dl:.3g} |dM|={dm:.3g}")


if __name__ == "__main__":
    main()
