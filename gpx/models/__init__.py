"""Model families: GP regression, GP classification, DLM / DLM-GP,
multi-output (ICM) GPs."""

from gpx.models import (
    classify,
    dlm,
    dlmgp,
    gp,
    gp_iterative,
    gridgp,
    multioutput,
    multioutput_iterative,
    optimize,
    sparse,
    svgp,
    svgp_mo,
)

__all__ = [
    "classify", "dlm", "dlmgp", "gp", "gp_iterative", "gridgp",
    "multioutput",
    "multioutput_iterative", "optimize", "sparse", "svgp", "svgp_mo",
]
