"""Chain IO: CSV export/import (reference-workflow parity) and pytree
checkpoints (resume).

The reference checkpoints implicitly by streaming parameter CSVs per chain
(``Streaming.writeParallelChain`` -> ``<name>_<i>.csv``,
SimulatedGp.scala:163-165) and downstream stages resume by re-reading them
with burn-in/thinning applied at read time (Temperature.scala:137-141,
SimulatedGp.scala:209-219). Both behaviours are reproduced, plus a proper
checkpoint: the full sampler state pytree (parameters, PRNG key, adaptation
stats) saved/restored losslessly (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import csv
import pickle
from pathlib import Path

import jax
import numpy as np


def write_chain_csv(path, flat, names):
    """One chain -> CSV with a header row. ``flat``: (n_draws, dim).

    Uses the native C++ writer (gpx/native/fastcsv.cpp) when available —
    roughly an order of magnitude faster than the csv module on long chains
    — with a pure-Python fallback."""
    flat = np.ascontiguousarray(np.asarray(flat, dtype=np.float64))
    if flat.ndim == 1:
        flat = flat[:, None]
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)

    from gpx.native import load_fastcsv

    lib = load_fastcsv()
    if lib is not None:
        import ctypes

        rc = lib.gpx_write_csv(
            str(path).encode(),
            ",".join(names).encode(),
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            flat.shape[0],
            flat.shape[1],
        )
        if rc == 0:
            return path
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(names)
        w.writerows(flat.tolist())
    return path


def write_chains_csv(base_path, flat, names):
    """Per-chain files ``<base>_<i>.csv`` — the writeParallelChain layout
    (SimulatedGp.scala:163-165). ``flat``: (n_chains, n_draws, dim)."""
    flat = np.asarray(flat)
    base = Path(base_path)
    paths = []
    for i in range(flat.shape[0]):
        paths.append(
            write_chain_csv(base.with_name(f"{base.stem}_{i}.csv"), flat[i], names)
        )
    return paths


def read_chain_csv(path, burn_in: int = 0, thin: int = 1):
    """Read a chain CSV with burn-in drop + thinning at read time
    (Temperature.scala:137-141). Returns ``(flat, names)``. Native C++
    parser with Python fallback."""
    with open(path, newline="") as f:
        names = f.readline().strip().split(",")

    from gpx.native import load_fastcsv

    lib = load_fastcsv()
    if lib is not None:
        import ctypes

        rows = ctypes.c_int64()
        cols = ctypes.c_int64()
        if lib.gpx_csv_shape(str(path).encode(), ctypes.byref(rows),
                             ctypes.byref(cols)) == 0:
            out = np.empty((rows.value, cols.value), dtype=np.float64)
            rc = lib.gpx_read_csv(
                str(path).encode(),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                rows.value,
                cols.value,
            )
            if rc == 0:
                return out[burn_in::thin], names

    with open(path, newline="") as f:
        r = csv.reader(f)
        next(r)
        rows_l = [[float(v) for v in row] for row in r]
    flat = np.asarray(rows_l)[burn_in::thin]
    return flat, names


def save_checkpoint(path, state) -> Path:
    """Save any pytree (parameters, PRNG key, dual-averaging stats, ...)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    with open(path, "wb") as f:
        pickle.dump(
            {"leaves": [np.asarray(l) for l in leaves], "treedef": treedef}, f
        )
    return path


def load_checkpoint(path):
    with open(path, "rb") as f:
        blob = pickle.load(f)
    import jax.numpy as jnp

    return jax.tree_util.tree_unflatten(
        blob["treedef"], [jnp.asarray(l) for l in blob["leaves"]]
    )
