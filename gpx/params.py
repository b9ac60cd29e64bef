"""Parameter containers and constrained/unconstrained transforms.

Replaces ``GaussianProcess.Parameters`` (GaussianProcess.scala:15-29) and the
flatten/constrain plumbing of ``KernelParameters``:

* ``paramsToArray`` / ``arrayToParams`` (KernelParameters.scala:88-101) ->
  :func:`to_array` / :func:`from_array` via ``jax.flatten_util.ravel_pytree``.
* ``unconstrainParams`` / ``constrainParams`` (KernelParameters.scala:251-264)
  -> :func:`unconstrain` / :func:`constrain` against a same-structure bijector
  tree. Unlike the reference, Matérn is fully supported (the reference throws
  "Not implemented yet" at KernelParameters.scala:254,263).
* ``toMap`` (GaussianProcess.scala:27-28) -> :func:`names` from pytree paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from gpx.kernels import Kernel
from gpx.means import MeanFunction
from gpx.utils.pytree import pytree_dataclass


@pytree_dataclass
class Parameters:
    """A GP model's full parameter set: mean function + kernel.

    Both members are themselves pytrees carrying their hyperparameters, so
    this container is directly differentiable and ``vmap``/``scan``-able.
    """

    mean: MeanFunction
    kernel: Kernel

    def bijectors(self) -> "Parameters":
        return Parameters(mean=self.mean.bijectors(), kernel=self.kernel.bijectors())


def to_array(tree):
    """Flatten any parameter pytree to a 1-D array
    (KernelParameters.paramsToArray, :88-89)."""
    flat, _ = ravel_pytree(tree)
    return flat


def from_array(template, flat):
    """Rebuild a pytree with ``template``'s structure from a flat array
    (KernelParameters.arrayToParams, :94-101)."""
    _, unravel = ravel_pytree(template)
    return unravel(flat)


def unraveler(template):
    """Return ``(flat0, unravel)`` for repeated use inside jitted samplers."""
    return ravel_pytree(template)


def constrain(bij_tree, u_tree):
    """Map an unconstrained pytree to the constrained domain, leafwise."""
    return jax.tree_util.tree_map(lambda b, u: b.forward(u), bij_tree, u_tree)


def unconstrain(bij_tree, c_tree):
    """Inverse of :func:`constrain`."""
    return jax.tree_util.tree_map(lambda b, c: b.inverse(c), bij_tree, c_tree)


def log_det_jacobian(bij_tree, u_tree):
    """Total ``log |d constrain(u) / du|`` — the change-of-variables term a
    sampler on unconstrained space adds to the log-posterior."""
    parts = jax.tree_util.tree_map(
        lambda b, u: jnp.sum(b.log_det_jacobian(u)), bij_tree, u_tree
    )
    return jax.tree_util.tree_reduce(jnp.add, parts, jnp.asarray(0.0))


def names(tree) -> list[str]:
    """Stable, unique flat parameter names from pytree paths, expanded to one
    name per scalar element (the rebuild's ``Parameters.toMap``,
    GaussianProcess.scala:27-28 — but collision-free where the reference's
    Map-merge silently drops duplicate kernel names)."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = []
    for path, leaf in leaves:
        base = jax.tree_util.keystr(path).lstrip(".")
        base = base.replace("[", "").replace("]", "").replace("'", "")
        n = jnp.size(leaf)
        if n == 1:
            out.append(base)
        else:
            out.extend(f"{base}_{i}" for i in range(n))
    return out


def to_dict(tree) -> dict:
    """Name -> scalar value mapping for diagnostics/CSV headers."""
    return dict(zip(names(tree), [float(v) for v in to_array(tree)]))
