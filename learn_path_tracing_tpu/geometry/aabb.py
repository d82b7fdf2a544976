"""Batched AABB slab tests.

Semantics mirror the reference's ``aabb_hit``
(/root/reference/legacy/PT_in_one_weekend/15_module.py:851-861): a hit is
``t1 > t0 - eps and t1 > 0`` — the epsilon-relaxed form introduced at
14_mesh.py:800 to avoid missing thin/flat boxes.
"""

from __future__ import annotations

import jax.numpy as jnp

EPSILON = 1e-4


def aabb_hit(low, high, ro, rd, eps: float = EPSILON):
    """Slab test. ``low, high``: ``f32[...,3]``; ``ro, rd``: ``f32[...,3]``
    broadcastable against them. Returns bool mask.

    Division by zero direction components follows IEEE (inf), which matches
    the reference's behavior on the same hardware path.
    """
    inv = 1.0 / rd
    i = (low - ro) * inv
    o = (high - ro) * inv
    tmax = jnp.maximum(i, o)
    tmin = jnp.minimum(i, o)
    t1 = jnp.min(tmax, axis=-1)
    t0 = jnp.max(tmin, axis=-1)
    return (t1 > t0 - eps) & (t1 > 0.0)


def aabb_union(low_a, high_a, low_b, high_b):
    return jnp.minimum(low_a, low_b), jnp.maximum(high_a, high_b)
