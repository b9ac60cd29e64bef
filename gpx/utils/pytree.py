"""Pytree dataclass helpers.

The reference models parameters as Scala case-class ADTs with hand-written
``map``/``toList``/``toMap``/``vectorToParams`` plumbing
(core/src/main/scala/gp/KernelParameters.scala:11-67,88-101,306-321).
In the TPU rebuild every parameter container is a frozen dataclass registered
as a JAX pytree, so ``jax.tree_util`` / ``jax.flatten_util.ravel_pytree``
replace all of that plumbing and gradients flow through containers for free.
"""

from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls=None, *, meta_fields: tuple[str, ...] = ()):
    """Decorate a class as a frozen dataclass registered as a JAX pytree.

    Fields named in ``meta_fields`` are static (part of the treedef, compared
    by equality under ``jit`` retracing); all other fields are pytree leaves.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = [
            f.name for f in dataclasses.fields(c) if f.name not in meta_fields
        ]
        jax.tree_util.register_dataclass(c, data_fields, list(meta_fields))
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def tree_replace(obj, **changes):
    """``dataclasses.replace`` that reads nicely at call sites."""
    return dataclasses.replace(obj, **changes)
