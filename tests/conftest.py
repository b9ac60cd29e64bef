"""Test configuration: CPU backend with 8 virtual devices, fp64 enabled.

Parity tests run in x64 on the CPU backend (SURVEY.md §7 "hard parts" —
precision); multi-chip sharding tests use the 8-device virtual CPU mesh as
the stand-in for a TPU slice (SURVEY.md §4).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# XLA:CPU logs a spurious ERROR on every persistent-cache load: the cached
# executable records pseudo-features (+prefer-no-scatter/+prefer-no-gather)
# that never appear in the host feature list. Same-machine loads are safe;
# silence the C++ log flood (real failures still raise in Python).
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache (works on the CPU backend; only the axon TPU
# tunnel lacks one).  Warm suite runs skip recompiles entirely — measured
# 30 s -> 5.8 s on a representative shard_map program.  The dir is
# repo-local and gitignored (.jax_cache/).
_CACHE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
