"""End-to-end user-facing example on the real chip (round 4, VERDICT
Next-6).

The chip lane so far exercised kernels and model fragments; this runs the
whole `make simulated`-shaped workflow — simulate -> MH chains ->
diagnostics -> CSV -> plots (the reference's Makefile-driven app,
reference/Makefile:1-2 / SimulatedGp.scala:138-223) — as one subprocess
on real hardware, at a chip-scale dataset (--n 2048 simulated points,
every-15th subsample observed) and a few hundred iterations.
"""

import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_simulated_gp_parameters_on_chip(tmp_path):
    out = REPO / "examples" / "output"
    target = out / "gpmcmc_0.csv"
    if target.exists():
        target.unlink()
    # gpx is not pip-installed; the example subprocess gets examples/ on
    # sys.path, not the repo root — make the import explicit so the lane
    # works under plain `pytest tests_tpu/` as well as `make test-tpu`
    env = {**os.environ,
           "PYTHONPATH": str(REPO) + os.pathsep
           + os.environ.get("PYTHONPATH", "")}
    r = subprocess.run(
        [sys.executable, str(REPO / "examples" / "simulated_gp.py"),
         "parameters", "400", "--n", "2048"],
        cwd=REPO, capture_output=True, text=True, timeout=1800, env=env,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    # the workflow's artifacts: per-chain CSVs + the diagnostics figure
    assert target.exists()
    assert (out / "gpmcmc_diagnostics.png").exists()
    # the summary table printed (diagnostics ran)
    assert "rhat" in r.stdout
