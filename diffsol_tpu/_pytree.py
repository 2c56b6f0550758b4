"""Pytree dataclass helper.

All solver state in diffsol_tpu is carried through ``lax.while_loop`` /
``lax.scan`` as pytrees of arrays.  This module provides a tiny decorator that
registers a dataclass as a JAX pytree, with selected fields marked static
(hashable metadata that participates in trace caching rather than in the
tree leaves).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax


def pytree_dataclass(cls: type | None = None, *, static: tuple[str, ...] = ()):
    """Register ``cls`` (made a dataclass if needed) as a JAX pytree.

    Fields named in ``static`` become metadata (must be hashable); all other
    fields are pytree children.
    """

    def wrap(c: type) -> type:
        if not dataclasses.is_dataclass(c):
            c = dataclasses.dataclass(frozen=True)(c)
        data_fields = [f.name for f in dataclasses.fields(c) if f.name not in static]
        meta_fields = [f.name for f in dataclasses.fields(c) if f.name in static]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=meta_fields
        )

        def replace(self, **kwargs: Any):
            return dataclasses.replace(self, **kwargs)

        c.replace = replace  # type: ignore[attr-defined]
        return c

    if cls is None:
        return wrap
    return wrap(cls)
