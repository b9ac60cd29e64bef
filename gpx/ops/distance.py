"""Pairwise distances, MXU-shaped.

The reference builds an O(N^2) distance matrix with a scalar JVM
for-comprehension (GaussianProcess.distanceMatrix, GaussianProcess.scala:50-61)
over a ``Location.euclidean`` metric (Location.scala:27-33). Here locations
are ``(N, D)`` arrays and pairwise *squared* distances come from the matmul
identity ``|x|^2 + |y|^2 - 2 x.y`` — one MXU contraction plus VPU elementwise
work, fully fusable by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def as_locations(x):
    """Coerce to ``(N, D)``: 1-D input becomes the reference's ``One``
    locations (``(N, 1)``); ``(N, 2)`` is ``Two``; any D is allowed.
    Rejects ndim > 2 with a clear error instead of a downstream broadcast
    failure (ROADMAP: friendlier input validation)."""
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2:
        raise ValueError(
            f"locations must be (N,) or (N, D), got shape {x.shape}"
        )
    return x


def check_xy(x, y, what: str = "y"):
    """Validate targets against locations: returns ``(x, y)`` with ``x``
    coerced, raising a readable error on a length mismatch (instead of the
    raw XLA broadcast error the solves would produce)."""
    x = as_locations(x)
    y = jnp.asarray(y)
    if y.ndim != 1 or y.shape[0] != x.shape[0]:
        raise ValueError(
            f"{what} must be a length-N vector matching x's N={x.shape[0]}, "
            f"got shape {y.shape}"
        )
    return x, y


def sq_distances(x1, x2=None, *, exact: bool = False):
    """Pairwise squared Euclidean distances.

    Symmetric case (``x2 is None``) clamps at zero and zeroes the diagonal
    exactly, so kernels testing ``r2 == 0`` (White) behave like the
    reference's exact ``dist == 0`` check on the diagonal
    (KernelFunction.scala:33-35).

    ``exact=True`` forces the broadcast-subtract form at any D: the
    norms+matmul identity used for D > 8 can round *coincident points*
    (duplicated locations, off the diagonal) away from exactly 0, which
    silently breaks White's ``dist == 0`` semantics — the Gram builders
    set this whenever a White kernel is present (gpx.ops.gram,
    gpx.kernels.Ard).
    """
    x1 = as_locations(x1)
    symmetric = x2 is None
    x2 = x1 if symmetric else as_locations(x2)
    # distances are translation-invariant: centering costs nothing
    # mathematically but keeps f32 coordinate rounding from perturbing r2
    # (at |x| ~ 1e6 the raw-coordinate error makes Gram matrices
    # numerically indefinite — observed as CG divergence)
    center = jax.lax.stop_gradient(jnp.mean(x1, axis=0, keepdims=True))
    x1 = x1 - center
    x2 = x1 if symmetric else x2 - center
    if exact or x1.shape[-1] <= 8:
        # Low-dimensional spatial inputs (the reference's One/Two locations):
        # the broadcast-subtract form is exact at coincident points (the
        # norms+matmul identity can round |x|^2+|y|^2-2x.y away from 0, which
        # matters for White's ``dist == 0`` semantics) and XLA fuses the
        # (N, M, D) intermediate away. Matches gpx.ops.pallas_gram's tile path.
        diff = x1[:, None, :] - x2[None, :, :]
        r2 = jnp.sum(diff * diff, axis=-1)
    else:
        n1 = jnp.sum(x1 * x1, axis=-1)
        n2 = n1 if symmetric else jnp.sum(x2 * x2, axis=-1)
        # HIGHEST: TPU's default matrix-matrix precision is single-pass
        # bf16 (measured 5.8e-4 rel, round 3) — that would undo the
        # centering care above; the D-deep contraction is cheap at HIGHEST
        r2 = n1[:, None] + n2[None, :] - 2.0 * jnp.matmul(
            x1, x2.T, precision=jax.lax.Precision.HIGHEST
        )
    r2 = jnp.maximum(r2, 0.0)
    if symmetric:
        r2 = jnp.fill_diagonal(r2, 0.0, inplace=False)
    return r2


def distances(x1, x2=None):
    """Pairwise Euclidean distances (the reference's distanceMatrix)."""
    return jnp.sqrt(sq_distances(x1, x2))


def euclidean(a, b):
    """Distance between two single locations — Location.euclidean
    (Location.scala:27-33)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    return jnp.sqrt(jnp.sum((a - b) ** 2))


def locations_close(x1, x2, tol: float = 1e-3):
    """Approximate location equality — the reference's ``Eq[Location]``
    instance with per-coordinate tolerance 1e-3 (Location.scala:18-25),
    used there to match grid cells to sensor sites. Vectorized: for
    ``(N, D)`` vs ``(M, D)`` locations returns an ``(N, M)`` boolean mask
    of approximately-equal pairs (single locations broadcast)."""
    x1 = as_locations(x1)
    x2 = as_locations(x2)
    return jnp.all(
        jnp.abs(x1[:, None, :] - x2[None, :, :]) <= tol, axis=-1
    )


def match_locations(x1, x2, tol: float = 1e-3):
    """Index of the first ``x2`` row approximately equal to each ``x1``
    row, or -1 — the lookup the reference performs with its ``Eq``
    instance when joining sensor locations to kriging grids
    (Location.scala:18-25; TemperatureKriging workflow)."""
    close = locations_close(x1, x2, tol)
    has = jnp.any(close, axis=1)
    return jnp.where(has, jnp.argmax(close, axis=1), -1)
