"""Shared test fixtures.

Ports the one genuinely reusable test idea from the reference suite: random
SPD matrices with a *prescribed condition number* built from a fixed-spectrum
diagonal conjugated by a Householder reflector
(core/src/test/scala/ParameterTest.scala:19-36; SURVEY.md §4).
"""

import numpy as np


def symmetric_pos_def(rng, n: int, cond: float) -> np.ndarray:
    """Random SPD matrix with condition number ``cond``."""
    if n < 2:
        raise ValueError("n must be >= 2")
    spectrum = np.concatenate(
        [[1.0, cond], rng.uniform(1.0, cond, size=n - 2)]
    )
    d = np.diag(spectrum)
    u = rng.uniform(-10.0, 10.0, size=(n, 1))
    h = np.eye(n) - (2.0 / (u.T @ u)) * (u @ u.T)  # Householder reflector
    return h @ d @ h


def random_locations(rng, n: int, d: int = 1, scale: float = 10.0) -> np.ndarray:
    return rng.uniform(-scale, scale, size=(n, d))
