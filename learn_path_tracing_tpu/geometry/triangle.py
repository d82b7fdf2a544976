"""Batched ray-triangle intersection.

Mirrors the reference's plane-then-barycentric test
(/root/reference/legacy/PT_in_one_weekend/15_module.py:909-953): intersect
the supporting plane, then require all three barycentric weights strictly
positive. Attribute interpolation (smooth normal, UV, tangent frame) is
factored out so the traversal hot loop only needs ``t``; attributes are
computed once for the final nearest hit.
"""

from __future__ import annotations

import jax.numpy as jnp

EPSILON = 1e-4


def _cross(a, b):
    return jnp.cross(a, b)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def triangle_t(p1, p2, p3, ro, rd, eps: float = EPSILON):
    """Intersection distances for rays against triangles (pairwise, shapes
    broadcast). Returns ``t`` with +inf where there is no hit.

    All inputs ``f32[...,3]``.
    """
    n = _cross(p2 - p1, p3 - p1)
    nn = jnp.sqrt(_dot(n, n))[..., None]
    n = n / jnp.maximum(nn, 1e-20)
    denom = _dot(rd, n)
    t = (_dot(p1 - ro, n)) / denom
    p = ro + rd * t[..., None]
    # Barycentric weights via the reference's cross-ratio form.
    w1 = _dot(_cross(p3 - p2, p - p2), n) / _dot(_cross(p3 - p2, p1 - p2), n)
    w2 = _dot(_cross(p1 - p3, p - p3), n) / _dot(_cross(p1 - p3, p2 - p3), n)
    w3 = 1.0 - w1 - w2
    ok = (t > eps) & (w1 > 0.0) & (w2 > 0.0) & (w3 > 0.0)
    return jnp.where(ok, t, jnp.inf)


def triangle_barycentrics(p1, p2, p3, point):
    """Barycentric weights (w1, w2, w3) of ``point`` in the triangle plane."""
    n = _cross(p2 - p1, p3 - p1)
    nn = jnp.sqrt(_dot(n, n))[..., None]
    n = n / jnp.maximum(nn, 1e-20)
    w1 = _dot(_cross(p3 - p2, point - p2), n) / _dot(_cross(p3 - p2, p1 - p2), n)
    w2 = _dot(_cross(p1 - p3, point - p3), n) / _dot(_cross(p1 - p3, p2 - p3), n)
    return w1, w2, 1.0 - w1 - w2


def interpolate_attributes(w1, w2, w3, n1, n2, n3, uv1, uv2, uv3,
                           p1, p2, p3):
    """Smooth normal, UV, and UV-derived tangent/bitangent frame for the
    final hit (15_module.py:932-941). Returns (normal, uv, tangent, bitangent)."""
    normal = w1[..., None] * n1 + w2[..., None] * n2 + w3[..., None] * n3
    nn = jnp.sqrt(_dot(normal, normal))[..., None]
    normal = normal / jnp.maximum(nn, 1e-20)
    uv = w1[..., None] * uv1 + w2[..., None] * uv2 + w3[..., None] * uv3
    dv1 = (uv2 - uv1)[..., 1]
    dv2 = (uv3 - uv1)[..., 1]
    tangent = dv1[..., None] * (p3 - p1) - dv2[..., None] * (p2 - p1)
    tangent = tangent - _dot(tangent, normal)[..., None] * normal
    tn = jnp.sqrt(_dot(tangent, tangent))[..., None]
    tangent = tangent / jnp.maximum(tn, 1e-20)
    bitangent = _cross(tangent, normal)
    return normal, uv, tangent, bitangent
