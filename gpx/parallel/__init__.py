"""Multi-chip scale-out via jax.sharding (SURVEY.md §2.4).

The reference's only parallelism is 2 MCMC chains on JVM threads
(SimulatedGp.scala:163-165). Here the axes are first-class:

* ``chains`` — embarrassingly parallel vmapped chains, sharded across chips;
* ``data``  — the Gram matrix and cross-covariance sharded over matrix axes,
  with XLA GSPMD inserting the ICI collectives.
"""

from gpx.parallel.dist_chol import (
    distributed_back_solve,
    distributed_cholesky,
    distributed_forward_solve,
    distributed_half_logdet,
    distributed_logml,
    distributed_logml_value_and_grad,
    distributed_predict,
)
from gpx.parallel.dist_matvec import distributed_gram_matvec
from gpx.parallel.mesh import make_mesh
from gpx.parallel.sharded import (
    sharded_gram,
    sharded_logml,
    sharded_predict,
    sample_chains_sharded,
    sample_mh_2d,
)

__all__ = [
    "distributed_back_solve",
    "distributed_cholesky",
    "distributed_forward_solve",
    "distributed_gram_matvec",
    "distributed_half_logdet",
    "distributed_logml",
    "distributed_logml_value_and_grad",
    "distributed_predict",
    "make_mesh",
    "sharded_gram",
    "sharded_logml",
    "sharded_predict",
    "sample_chains_sharded",
    "sample_mh_2d",
]
