"""Execute every Makefile example target end-to-end at smoke scale.

The reference's examples are its de-facto test suite (SURVEY.md §4: the
only automated checks are 2 property files; the examples producing their
figures is what actually guards the workflows). test_examples_import.py
only import-checks the modules; this lane runs each ``main()`` with tiny
N/iteration counts so a broken workflow (not just a broken import) fails
CI. Mirrors Makefile targets: simulated/hmc_simulated/posterior_predictive
(SimulatedGp.scala), fit_temp_gp (Temperature.scala), krig_temperature
(TemperatureKriging.scala), fit_temp_dlm + forecast (TemperatureDlm.scala),
fit_dlm_gp (FitDlmGp.scala), icm_temperature, mnist (Mnist.scala), large_n.
"""

import importlib
import sys

import pytest


def _run(monkeypatch, module: str, *argv):
    mod = importlib.import_module(f"examples.{module}")
    monkeypatch.setattr(sys, "argv", [f"{module}.py", *map(str, argv)])
    mod.main()


def test_simulated_gp_targets(monkeypatch):
    # one test for the whole family: `posterior-predictive` re-reads the
    # chain CSV that `parameters` writes (SimulatedGp.scala:209-219), so
    # the order is part of the workflow under test
    for argv in (
        ["simulate", "--n", "64"],
        ["replicate", "--n", "64"],
        ["fit", "--n", "64"],
        ["parameters", "40", "--n", "64"],
        ["posterior-predictive", "40", "--n", "64"],
    ):
        _run(monkeypatch, "simulated_gp", *argv)


def test_hmc_simulated_target(monkeypatch):
    _run(monkeypatch, "simulated_gp", "hmc", "10", "--n", "64")


def test_fit_temp_gp_target(monkeypatch):
    _run(monkeypatch, "temperature", "8")


def test_krig_temperature_target(monkeypatch):
    _run(monkeypatch, "temperature_kriging", "8", "--nx", "6", "--ny", "6")


def test_fit_temp_dlm_and_forecast_targets(monkeypatch):
    _run(monkeypatch, "temperature_dlm", "8")
    _run(monkeypatch, "temperature_dlm", "8", "--forecast", "6")


def test_fit_dlm_gp_target(monkeypatch):
    _run(monkeypatch, "dlm_gp", "8")


def test_icm_temperature_target(monkeypatch):
    _run(monkeypatch, "temperature_icm", "8")


def test_mnist_target(monkeypatch):
    _run(monkeypatch, "mnist_classify", "--n-train", "30", "--n-test", "10")


@pytest.mark.parametrize("mode,n", [("dense", 256), ("iterative", 320),
                                    ("svgp", 256)])
def test_large_n_target(monkeypatch, mode, n):
    _run(monkeypatch, "large_n", mode, n)
