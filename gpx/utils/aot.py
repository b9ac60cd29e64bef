"""Persistent ahead-of-time executable cache.

The environment's remote TPU compiler does not engage JAX's persistent
compilation cache, so every process pays the full compile of every program
shape (~20 s for a 2048 chol_inv, ~5 min for the fused N=16k logML path).
``jax.experimental.serialize_executable`` round-trips compiled executables
across processes here (measured: 20.6 s compile -> 0.1 s deserialize +
instant first run, bit-identical outputs, Pallas kernels included), so this
module keys serialized executables on a hash of the *lowered* StableHLO —
tracing/lowering still runs per process (cheap, seconds), only the
XLA/Mosaic compile is skipped.

Usage::

    f = cached_compile(lambda p: gp.logml_value_and_grad(p, x, y), params)
    out = f(params)

Cache entries are invalidated by anything that changes the lowered text
(shapes, dtypes, program structure, jax version, backend); a cache that
fails to deserialize (e.g. different runtime) falls back to a fresh
compile and overwrites the entry.

CAVEAT (measured, round 3): the XLA *CPU* runtime can deserialize a
multi-device shard_map executable successfully and then fail at
INVOCATION time ("Buffer Definition Event: Function ... not found") —
an error the load-path try/except cannot see. TPU round-trips are
chip-verified. On CPU, prefer leaving complex mesh programs to fresh
compiles (set ``GPX_AOT_LOAD=0`` to disable the load path entirely);
gpx's own distributed entry points gate themselves off CPU
(gpx/parallel/dist_chol.py).
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import pickle

import jax

_DEFAULT_DIR = pathlib.Path(
    os.environ.get("GPX_AOT_CACHE_DIR", os.path.expanduser("~/.cache/gpx_aot"))
)


def _cache_key(lowered, extra: str) -> str:
    h = hashlib.sha256()
    h.update(lowered.as_text().encode())
    h.update(jax.__version__.encode())
    h.update(jax.default_backend().encode())
    # device kind + count + jaxlib/runtime identifiers: a cache dir shared
    # across chip revisions or a remote-compiler update must not
    # deserialize a mismatched executable (deserialization does not always
    # raise), and a deserialized executable binds to ALL local devices —
    # so entries are only valid within an identical local topology
    try:
        h.update(jax.devices()[0].device_kind.encode())
        h.update(str(len(jax.local_devices())).encode())
    except Exception:
        pass
    try:
        import jaxlib

        h.update(getattr(jaxlib, "__version__", "").encode())
    except Exception:
        pass
    h.update(getattr(jax.lib, "xla_extension_version", 0).__repr__().encode())
    h.update(extra.encode())
    return h.hexdigest()[:32]


def cached_compile(fn, *args, cache_dir=None, key_extra: str = "", **kwargs):
    """``jax.jit(fn)`` compiled with a persistent on-disk executable cache.

    Returns the compiled executable (callable with the same arguments).
    On a cache hit the XLA/Mosaic compile is skipped entirely; on a miss
    (or a stale/undeserializable entry) it compiles and stores."""
    from jax.experimental.serialize_executable import (
        deserialize_and_load,
        serialize,
    )

    cache_dir = pathlib.Path(cache_dir) if cache_dir else _DEFAULT_DIR
    lowered = jax.jit(fn).lower(*args, **kwargs)

    path = cache_dir / f"{_cache_key(lowered, key_extra)}.pkl"
    if path.exists() and os.environ.get("GPX_AOT_LOAD", "1") != "0":
        try:
            with open(path, "rb") as fh:
                payload, in_tree, out_tree = pickle.load(fh)
            return deserialize_and_load(payload, in_tree, out_tree)
        except Exception:
            pass                         # stale/corrupt entry: recompile

    compiled = lowered.compile()
    # a deserialized executable binds to ALL local devices (the original
    # device assignment is not preserved): a single-device program loaded
    # in a multi-device process then demands per-device shards (measured
    # on the 8-virtual-device CPU lane: "expected 8 shards, got [1]").
    # Mesh programs spanning every local device round-trip correctly
    # (measured, incl. shard_map collectives) — so cache exactly when the
    # executable's device span equals the process's local topology, which
    # the cache key also pins (count + kind).
    try:
        spans_local = len(compiled.runtime_executable().local_devices()) == (
            len(jax.local_devices())
        )
    except Exception:
        spans_local = False
    if not spans_local:
        return compiled
    try:
        cache_dir.mkdir(parents=True, exist_ok=True)
        payload, in_tree, out_tree = serialize(compiled)
        tmp = path.with_suffix(".tmp")
        with open(tmp, "wb") as fh:
            pickle.dump((payload, in_tree, out_tree), fh)
        os.replace(tmp, path)            # atomic publish
    except Exception:
        pass                             # cache is best-effort
    return compiled
