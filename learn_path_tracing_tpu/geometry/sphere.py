"""Batched ray-sphere intersection.

Replaces the reference's per-thread linear scan over ``Sphere.field``
(/root/reference/taichi_pathtracer/10_final/world.py:24-33,42-59) with a
TPU-native formulation: the two per-(ray, sphere) dot products that dominate
the quadratic setup are batched matmuls

    rd @ centers.T   and   ro @ centers.T      (``f32[N,3] x f32[3,S]``)

which XLA tiles onto the MXU, with the remaining quadratic solve as fused
elementwise VPU ops and a single min/argmin reduction over the sphere axis.
A Pallas kernel (ops/sphere_scan.py) implements the same math with the
``[N, S]`` intermediates kept in VMEM for the full-resolution hot path.

Behavioral parity with the reference:
- nearest hit with ``t >= t_min`` (1e-4), first sphere wins ties;
- if the near root is closer than ``t_min`` and the sphere is transparent,
  the far root is used instead (8_refract/world.py:55-56) — this is what
  lets rays exit glass;
- spheres with radius <= 0 never hit (used for padding to lane multiples).
"""

from __future__ import annotations

import jax.numpy as jnp

# plain float, not jnp.float32: a module-level jnp constant would
# initialize the default backend at import time (see core/color.py)
INF = float("inf")
T_MIN = 1e-4


def intersect_spheres(ro, rd, centers, radii, transparency, t_min: float = T_MIN):
    """Nearest-hit scan of ``N`` rays against ``S`` spheres.

    Args:
      ro, rd: ``f32[N,3]`` ray origins / unit directions.
      centers: ``f32[S,3]``; radii: ``f32[S]``; transparency: ``f32[S]``.

    Returns:
      ``(t, idx)``: ``f32[N]`` hit distance (+inf on miss) and ``i32[N]``
      sphere index (arbitrary on miss — mask with ``jnp.isfinite(t)``).
    """
    # MXU-batched dot products.
    d_dot_c = rd @ centers.T                                   # f32[N,S]
    o_dot_c = ro @ centers.T                                   # f32[N,S]
    o_dot_d = jnp.sum(ro * rd, axis=-1, keepdims=True)         # f32[N,1]
    o_dot_o = jnp.sum(ro * ro, axis=-1, keepdims=True)         # f32[N,1]
    c_dot_c = jnp.sum(centers * centers, axis=-1)              # f32[S]

    half_b = o_dot_d - d_dot_c
    c = o_dot_o - 2.0 * o_dot_c + (c_dot_c - radii * radii)[None, :]
    disc = half_b * half_b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = -half_b - sq
    t_far = -half_b + sq
    t = jnp.where((t_near < t_min) & (transparency[None, :] > 0.0), t_far, t_near)
    valid = (disc >= 0.0) & (t >= t_min) & (radii[None, :] > 0.0)
    t = jnp.where(valid, t, INF)

    idx = jnp.argmin(t, axis=-1).astype(jnp.int32)
    t_best = jnp.take_along_axis(t, idx[:, None], axis=-1)[:, 0]
    return t_best, idx


def sphere_normal(point, center, radius):
    """Outward geometric normal at ``point`` on the sphere (normalized)."""
    v = point - center
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return v / jnp.maximum(n, 1e-20)


def sphere_uv(normal):
    """Spherical lat/long UV of a unit normal (legacy texture path,
    15_module.py:864-877 convention: u from atan2(z, x), v from acos(y))."""
    u = 0.5 + jnp.arctan2(normal[..., 2], normal[..., 0]) / (2.0 * jnp.pi)
    v = jnp.arccos(jnp.clip(normal[..., 1], -1.0, 1.0)) / jnp.pi
    return jnp.stack([u, v], axis=-1)
