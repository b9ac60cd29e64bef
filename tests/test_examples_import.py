"""Import-smoke every example module (SURVEY.md §2.2): the reference ships
runnable example mains; a broken import in any of them is a release bug
even when the heavy __main__ path isn't executed in CI."""

import importlib

import pytest

MODULES = [
    "examples.dlm_gp",
    "examples.large_n",
    "examples.mnist_classify",
    "examples.simulated_gp",
    "examples.temperature",
    "examples.temperature_dlm",
    "examples.temperature_icm",
    "examples.temperature_kriging",
]


@pytest.mark.parametrize("name", MODULES)
def test_example_imports(name):
    mod = importlib.import_module(name)
    assert hasattr(mod, "main") or hasattr(mod, "__doc__")
