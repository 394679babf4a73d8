"""Tiny helper to declare frozen dataclasses as JAX pytrees.

Fields marked ``static()`` become aux_data (hashable, trigger recompilation
when changed); everything else is a traced leaf.
"""

from __future__ import annotations

import dataclasses
import jax

__all__ = ["pytree_dataclass", "static", "field"]


def static(**kw) -> dataclasses.Field:
    """A static (aux) field of a pytree dataclass."""
    kw.setdefault("metadata", {})
    kw["metadata"] = {**kw["metadata"], "static": True}
    return dataclasses.field(**kw)


def field(**kw) -> dataclasses.Field:
    return dataclasses.field(**kw)


def pytree_dataclass(cls=None, **kwargs):
    """Decorator: frozen dataclass registered as a JAX pytree."""
    def wrap(c):
        c = dataclasses.dataclass(frozen=True, **kwargs)(c)
        data_fields = [f.name for f in dataclasses.fields(c)
                       if not f.metadata.get("static", False)]
        meta_fields = [f.name for f in dataclasses.fields(c)
                       if f.metadata.get("static", False)]
        jax.tree_util.register_dataclass(c, data_fields, meta_fields)

        def _replace(self, **updates):
            return dataclasses.replace(self, **updates)

        c.replace = _replace
        return c

    if cls is None:
        return wrap
    return wrap(cls)
