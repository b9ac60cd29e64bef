"""Device mesh construction helpers."""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_mesh(**axis_sizes: int) -> Mesh:
    """``make_mesh(chains=2, data=4)`` -> a 2x4 logical mesh over the
    available devices. Sizes of -1 are inferred (at most one)."""
    names = tuple(axis_sizes)
    sizes = list(axis_sizes.values())
    n_dev = len(jax.devices())
    if sizes.count(-1) == 1:
        known = 1
        for s in sizes:
            if s != -1:
                known *= s
        sizes[sizes.index(-1)] = n_dev // known
    total = 1
    for s in sizes:
        total *= s
    if total > n_dev:
        raise ValueError(f"mesh {dict(zip(names, sizes))} needs {total} devices, have {n_dev}")
    # Auto axes: sharding is expressed via constraints and GSPMD propagation
    # (jax>=0.7 defaults new meshes to Explicit axes, which require reshard).
    return jax.make_mesh(
        tuple(sizes), names, axis_types=(jax.sharding.AxisType.Auto,) * len(names)
    )
