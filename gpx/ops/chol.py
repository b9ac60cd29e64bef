"""Cholesky factorization and triangular solves.

The reference reaches LAPACK ``dpotrf`` via Breeze ``cholesky``
(GaussianProcess.scala:123, Predict.scala:69, MeanParameters.scala:86,98) and
BLAS ``dtrsv``/``dtrsm`` via hand-wrapped netlib calls
(Predict.forwardSolve, Predict.scala:40-45; Mcmc.backSolve, Mcmc.scala:35-58).
On TPU these map to XLA's blocked ``lax.linalg`` kernels, which tile onto the
MXU; the crucial structural change is *batching*: the reference's predict
path calls ``dtrsv`` once per test point (O(M N^2), Predict.scala:71-93) —
here a single ``trsm`` with an (N, M) RHS does all test points in one MXU
pass (see gpx.models.gp.predict).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular


def cholesky(a):
    """Lower Cholesky factor of an SPD matrix."""
    return lax.linalg.cholesky(a)


def forward_solve(l, b):
    """Solve ``L x = b`` with lower-triangular ``L`` — Predict.forwardSolve
    (Predict.scala:40-45). ``b`` may be a vector or a matrix of RHS columns
    (the batched-trsm upgrade of the reference's per-vector dtrsv)."""
    return solve_triangular(l, b, lower=True)


def back_solve(u, b):
    """Solve ``U x = b`` with upper-triangular ``U`` — Mcmc.backSolve
    (Mcmc.scala:35-58), vector or matrix RHS."""
    return solve_triangular(u, b, lower=False)


def cho_solve(l, b):
    """Solve ``(L L^T) x = b`` given the lower Cholesky factor — replaces the
    reference's generic ``kxx \\ ys`` LAPACK solves (GaussianProcess.scala:184)
    without ever forming ``K^{-1}``."""
    return solve_triangular(
        l, solve_triangular(l, b, lower=True), lower=True, trans=1
    )


def tri_inverse_lower(l, base: int = 256):
    """Explicit inverse of a lower-triangular matrix by blocked
    divide-and-conquer:

    ``inv([[A, 0], [B, C]]) = [[A^{-1}, 0], [-C^{-1} B A^{-1}, C^{-1}]]``

    This is the TPU-native replacement for LAPACK ``trtri``: XLA's own
    ``triangular_solve`` against an identity RHS at N=16k allocates ~67 GB
    of temporaries on TPU (blocked update chains kept live), while this
    formulation stays at O(N^2) memory and N^3/3 MACs on the MXU.

    (A level-by-level batched variant was tried and measured *slower* on
    TPU — the block scatters cost more than the recursion's concatenates:
    295 ms vs 223 ms at N=16k, and 705 s vs 495 s to compile.)

    Feeds ``K^{-1} = L^{-T} L^{-1}`` in the analytic logML gradient
    (gpx.models.gp._logml_value_and_grad_analytic).
    """
    return _tri_inverse_recursive(l, base)


def _tri_inverse_recursive(l, base: int):
    n = l.shape[-1]
    if n <= base:
        return solve_triangular(l, jnp.eye(n, dtype=l.dtype), lower=True)
    # split at a hardware-aligned midpoint (multiples of 128 lanes)
    m = max(128, ((n // 2) // 128) * 128) if n > 256 else n // 2
    a = l[..., :m, :m]
    b = l[..., m:, :m]
    c = l[..., m:, m:]
    a_inv = _tri_inverse_recursive(a, base)
    c_inv = _tri_inverse_recursive(c, base)
    # the combine products have a triangular operand (A^{-1}, C^{-1} lower):
    # the scheduled Pallas trmm skips the dead half's MACs and DMA; XLA
    # multiplies densely (2x waste). Use it for the large square levels.
    use_trmm = (
        jax.default_backend() == "tpu"
        and l.ndim == 2
        and l.dtype == jnp.float32
        and n - m == m
        and m % 512 == 0
        and m >= 2048
    )
    if use_trmm:
        from gpx.ops.pallas_trmm import trmm

        ba = trmm(b, a_inv, mode="right_lower")
        lower_left = -trmm(ba, c_inv, mode="left_lower")
    else:
        # HIGHEST: TPU's default matrix-matrix precision is single-pass
        # bf16 (5.8e-4 rel, measured round 3) — an explicit inverse built
        # from bf16 products is no longer f32-grade. This is the fallback
        # path (non-power-of-2 N); the production route is the bf16x3
        # Pallas chol_inv with its logdet correction.
        hi = jax.lax.Precision.HIGHEST
        ba = jnp.matmul(b, a_inv, preferred_element_type=l.dtype, precision=hi)
        lower_left = -jnp.matmul(
            c_inv, ba, preferred_element_type=l.dtype, precision=hi
        )
    top = jnp.concatenate(
        [a_inv, jnp.zeros((*l.shape[:-2], m, n - m), dtype=l.dtype)], axis=-1
    )
    bottom = jnp.concatenate([lower_left, c_inv], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def spd_inverse_from_chol(l, base: int = 256):
    """``K^{-1}`` from the lower Cholesky factor: blocked triangular inverse
    + one syrk-shaped matmul (the LAPACK ``potri`` capability)."""
    l_inv = tri_inverse_lower(l, base)
    return jnp.matmul(
        l_inv.swapaxes(-1, -2), l_inv, preferred_element_type=l.dtype,
        precision=jax.lax.Precision.HIGHEST,   # see _tri_inverse_recursive
    )


def logdet_from_chol(l):
    """``log det K = 2 sum log diag(L)``; the loglikelihood uses the
    half-logdet ``sum log diag(L)`` directly (GaussianProcess.scala:126)."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(l, axis1=-2, axis2=-1)), axis=-1)


def add_jitter(a, jitter):
    """``a + jitter * I`` — the reference's nugget discipline
    (1e-3: GaussianProcess.scala:71,117; 1e-6: Predict.scala:67)."""
    return a + jitter * jnp.eye(a.shape[-1], dtype=a.dtype)
