"""Tiny helper for declaring SoA pytree dataclasses."""

from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls=None, *, meta_fields: tuple[str, ...] = ()):
    """Decorator: make ``cls`` a frozen dataclass registered as a JAX pytree.

    All fields are pytree data leaves except those named in ``meta_fields``
    (which become static aux data and must be hashable).
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = tuple(
            f.name for f in dataclasses.fields(c) if f.name not in meta_fields
        )
        return jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=tuple(meta_fields)
        )

    if cls is None:
        return wrap
    return wrap(cls)


def tree_where(mask, a, b):
    """Elementwise ``jnp.where`` over matching pytrees.

    ``mask`` is broadcast against each leaf: a leaf of shape ``[N, ...]`` is
    selected with ``mask[N]`` reshaped to ``[N, 1, ...]`` as needed.
    """
    import jax.numpy as jnp

    def sel(x, y):
        m = mask
        while m.ndim < x.ndim:
            m = m[..., None]
        return jnp.where(m, x, y)

    return jax.tree_util.tree_map(sel, a, b)
