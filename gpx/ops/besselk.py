"""Modified Bessel function of the second kind ``K_nu`` for real order.

The reference's Matérn calls commons-math3 ``Bessel.i0`` regardless of order
(KernelFunction.scala:22-28) — wrong function *and* wrong order. jax.scipy
has no ``kv``, so this is a JAX-native implementation for static real order
``nu`` (SURVEY.md §2.3: "jax.scipy.special for general nu" — the capability,
delivered with the standard two-regime algorithm instead since jax lacks it):

* ``x <= 2``: Temme's series for ``K_mu``/``K_{mu+1}`` with ``|mu| <= 1/2``
  (Temme 1975, J. Comp. Phys. 19; the ``bessik`` formulation of Numerical
  Recipes §6.7 re-derived for JAX — fixed iteration count, vectorized over
  the input array);
* ``x > 2``: Steed/Thompson–Barnett continued fraction CF2 for the same two
  orders;
* static upward recurrence ``K_{v+1} = K_{v-1} + (2v/x) K_v`` (stable for K)
  lifts ``mu`` to ``nu``.

``nu`` is a static Python float (kernel structure, matching
gpx.kernels.Matern), so the order split and the Gamma-function constants are
computed at trace time in f64 Python. Both regimes are evaluated with the
double-``where`` trick so autodiff through either branch is NaN-free; the
derivative of a converged series is the (converged) series of the
derivative, so ``jax.grad`` through ``kv`` is accurate.

Accuracy (tests/test_kernels.py): <= 1e-12 relative vs scipy.special.kv in
f64 over x in [1e-6, 30], nu in (0, 10].
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

_EULER_GAMMA = 0.5772156649015328606


def _n_iters(dtype):
    """Iteration counts per dtype. The CF2 auxiliaries grow factorially
    (``c ~ i!``) while their products converge — in f32, running past
    convergence overflows ``c`` to inf against an underflowed-to-0 ``qnew``
    and poisons the sum with inf*0 = NaN, so f32 stops at 25 iterations
    (~f32-converged at x >= 2; 25! is still representable)."""
    if jnp.finfo(dtype).bits <= 32:
        return 25, 25
    return 40, 60


def _temme_series(x, xmu: float, dtype):
    """(K_mu(x), K_{mu+1}(x)) for 0 < x <= 2, |xmu| <= 1/2 (static xmu)."""
    # trace-time f64 Gamma constants
    gampl = 1.0 / math.gamma(1.0 + xmu)
    gammi = 1.0 / math.gamma(1.0 - xmu)
    if abs(xmu) < 1e-10:
        gam1 = -_EULER_GAMMA
    else:
        gam1 = (gammi - gampl) / (2.0 * xmu)
    gam2 = (gammi + gampl) / 2.0

    x2 = 0.5 * x
    pimu = math.pi * xmu
    fact = 1.0 if abs(pimu) < 1e-10 else pimu / math.sin(pimu)
    d = -jnp.log(x2)
    e = xmu * d
    # sinh(e)/e with the e -> 0 limit
    fact2 = jnp.where(jnp.abs(e) < 1e-12, 1.0, jnp.sinh(e) / jnp.where(
        jnp.abs(e) < 1e-12, 1.0, e))
    ff0 = fact * (gam1 * jnp.cosh(e) + gam2 * fact2 * d)
    ee = jnp.exp(e)
    p0 = 0.5 * ee / gampl          # = (x/2)^{-mu} Gamma(1+mu) / 2
    q0 = 0.5 / (ee * gammi)        # = (x/2)^{+mu} Gamma(1-mu) / 2
    c0 = jnp.ones_like(x)
    dd = x2 * x2

    def body(i_, carry):
        i = i_.astype(dtype)
        ff, c, p, q, ksum, ksum1 = carry
        ff = (i * ff + p + q) / (i * i - xmu * xmu)
        c = c * dd / i
        p = p / (i - xmu)
        q = q / (i + xmu)
        ksum = ksum + c * ff
        ksum1 = ksum1 + c * (p - i * ff)
        return ff, c, p, q, ksum, ksum1

    init = (ff0, c0, p0, q0, ff0, p0)
    series_iters, _ = _n_iters(dtype)
    _, _, _, _, ksum, ksum1 = lax.fori_loop(
        1, series_iters + 1, body, init
    )
    return ksum, ksum1 * (2.0 / x)


def _cf2(x, xmu: float, dtype):
    """(K_mu(x), K_{mu+1}(x)) for x > 2 via the Steed/Thompson–Barnett
    continued fraction."""
    a1 = 0.25 - xmu * xmu
    b0 = 2.0 * (1.0 + x)
    d0 = 1.0 / b0
    h0 = d0
    q1 = jnp.zeros_like(x)
    q2 = jnp.ones_like(x)
    q0 = jnp.full_like(x, a1)
    c0 = jnp.full_like(x, a1)
    a0 = jnp.full_like(x, -a1)
    s0 = 1.0 + q0 * h0

    def body(i_, carry):
        i = i_.astype(dtype)
        a, b, c, d, h, delh, q, q1, q2, s = carry
        a = a - 2.0 * (i - 1.0)
        c = -a * c / i
        qnew = (q1 - b * q2) / a
        q1, q2 = q2, qnew
        q = q + c * qnew
        b = b + 2.0
        d = 1.0 / (b + a * d)
        delh = (b * d - 1.0) * delh
        h = h + delh
        s = s + q * delh
        return a, b, c, d, h, delh, q, q1, q2, s

    init = (a0, jnp.full_like(x, b0), c0, jnp.full_like(x, d0),
            h0 * jnp.ones_like(x), h0 * jnp.ones_like(x), q0, q1, q2, s0)
    _, cf2_iters = _n_iters(dtype)
    a, b, c, d, h, delh, q, q1, q2, s = lax.fori_loop(
        2, cf2_iters + 2, body, init
    )
    h = a1 * h
    rkmu = jnp.sqrt(jnp.pi / (2.0 * x)) * jnp.exp(-x) / s
    rk1 = rkmu * (xmu + x + 0.5 - h) / x
    return rkmu, rk1


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def kv(nu: float, x):
    """``K_nu(x)`` for static real ``nu`` (any sign; ``K_{-nu} = K_nu``) and
    array ``x > 0``.

    Derivatives come from the exact recurrence ``d K_nu / dx =
    -(K_{nu-1} + K_{nu+1}) / 2`` (custom_jvp below) — two extra forward
    evaluations instead of differentiating through the 25-iteration
    series/continued-fraction loops, whose stacked reverse-mode residuals
    are O(iters * N^2) (measured: 23 GB of f32[25,4096,4096] HLO temps at
    N=4096, an HBM OOM)."""
    nu = abs(float(nu))
    x = jnp.asarray(x)
    dtype = x.dtype
    nl = int(nu + 0.5)
    xmu = nu - nl                      # in [-1/2, 1/2]

    # double-where: clamp each branch's input into its own domain so the
    # unused branch can neither NaN the value nor the gradient
    small = x <= 2.0
    x_s = jnp.clip(x, jnp.finfo(dtype).tiny, 2.0)
    x_l = jnp.maximum(x, 2.0)
    k_s, k1_s = _temme_series(x_s, xmu, dtype)
    k_l, k1_l = _cf2(x_l, xmu, dtype)
    rkmu = jnp.where(small, k_s, k_l)
    rk1 = jnp.where(small, k1_s, k1_l)

    # static upward recurrence K_{v+1} = K_{v-1} + (2v/x) K_v
    xi2 = 2.0 / x
    for i in range(1, nl + 1):
        rkmu, rk1 = rk1, (xmu + i) * xi2 * rk1 + rkmu
    return rkmu


@kv.defjvp
def _kv_jvp(nu, primals, tangents):
    (x,), (dx,) = primals, tangents
    k = kv(nu, x)
    # K_{-a} = K_a handled inside kv; the identity holds for any real nu
    dkdx = -0.5 * (kv(nu - 1.0, x) + kv(nu + 1.0, x))
    return k, dkdx * dx
