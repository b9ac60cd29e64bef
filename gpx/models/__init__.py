"""Model families: GP regression, GP classification, DLM / DLM-GP."""

from gpx.models import (
    classify,
    dlm,
    dlmgp,
    gp,
    gp_iterative,
    optimize,
    sparse,
    svgp,
)

__all__ = [
    "classify", "dlm", "dlmgp", "gp", "gp_iterative", "optimize", "sparse",
    "svgp",
]
