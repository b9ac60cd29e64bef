"""Numerical ops: distances, Gram builders, Cholesky/solves, Pallas kernels."""

from gpx.ops.chol import (
    add_jitter,
    back_solve,
    cho_solve,
    cholesky,
    forward_solve,
    logdet_from_chol,
)
from gpx.ops.distance import (
    as_locations,
    distances,
    euclidean,
    locations_close,
    match_locations,
    sq_distances,
)
from gpx.ops.gram import build_cov_matrix, cross_gram, gram

__all__ = [
    "add_jitter",
    "back_solve",
    "cho_solve",
    "cholesky",
    "forward_solve",
    "logdet_from_chol",
    "as_locations",
    "distances",
    "euclidean",
    "locations_close",
    "match_locations",
    "sq_distances",
    "build_cov_matrix",
    "cross_gram",
    "gram",
]
