"""On-TPU test lane (VERDICT round-1 item 8).

Runs compiled-mode Pallas kernels on the real chip — interpret mode (the
CPU lane, tests/) does not catch Mosaic-only behaviors: scalar VMEM store
rejection, single-pass-bf16 dot precision, scoped-VMEM limits, DMA
semantics. Every test here jit-compiles on the chip, so the suite is kept
small and shapes are reused where possible (first compile of each program
is 30-120 s through the axon remote compiler; there is no persistent
compilation cache).

Run: ``make test-tpu`` (= ``python -m pytest tests_tpu/ -q``). The whole
lane skips unless the default JAX backend is a real TPU.
"""

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    try:
        import jax

        is_tpu = jax.default_backend() == "tpu"
    except Exception:                     # tunnel down: backend init raises
        is_tpu = False
    if not is_tpu:
        skip = pytest.mark.skip(reason="no TPU backend — chip lane skipped")
        for item in items:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
