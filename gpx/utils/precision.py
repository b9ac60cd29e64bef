"""Matmul-precision policy helpers.

TPU's DEFAULT matrix-matrix precision is single-pass bf16 — measured
5.8e-4 max relative error on this chip (round 3), identical to an explicit
bf16 cast. Matvecs, vector dots, ``lax.linalg.cholesky`` and
``triangular_solve`` internals are f32-faithful (1e-7-grade, measured), so
only genuine matrix-matrix products need annotating. The hot O(N^3) paths
use explicit bf16x3 split kernels instead (gpx.ops.pallas_*); this module
covers the small/fallback XLA-side products where HIGHEST costs nothing
measurable but bf16 degrades covariance recursions and SPD builds.
"""

from __future__ import annotations

import functools

import jax


def highest_matmuls(fn):
    """Trace ``fn`` with HIGHEST default matmul precision.

    Used on covariance-recursion code (Kalman filters, smoothers, FFBS)
    whose state dimensions are tiny: the 6-pass f32 contraction is free at
    those sizes, and the bf16 default otherwise accumulates 5.8e-4-grade
    error through T sequential filter steps."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
