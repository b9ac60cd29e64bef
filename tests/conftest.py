"""Test configuration: CPU backend with 8 virtual devices, fp64 enabled.

Parity tests run in x64 on the CPU backend (SURVEY.md §7 "hard parts" —
precision); multi-chip sharding tests use the 8-device virtual CPU mesh as
the stand-in for a TPU slice (SURVEY.md §4).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
