"""Tiny frozen-dataclass pytree helper (no external deps)."""
from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls=None, *, static=()):
    """Register a frozen dataclass as a JAX pytree.

    Fields named in ``static`` become metadata (hashed into jit cache keys);
    the rest are traced leaves.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        fields = dataclasses.fields(c)
        data = [f.name for f in fields if f.name not in static]
        meta = [f.name for f in fields if f.name in static]
        jax.tree_util.register_dataclass(c, data_fields=data, meta_fields=meta)
        return c

    return wrap(cls) if cls is not None else wrap
