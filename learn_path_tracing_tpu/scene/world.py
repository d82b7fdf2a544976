"""Sphere-scene container: host-side builder + device SoA tables + hit query.

Mirrors the reference ``World``/``Sphere`` API
(/root/reference/taichi_pathtracer/10_final/world.py) split TPU-style into:

- ``Sphere`` / ``World``: host-side scene construction (python lists, growable
  like the reference's capacity-doubling field, but trivially so);
- ``SphereWorldData``: a frozen SoA pytree of device arrays, padded to a lane
  multiple, produced by ``World.device()`` and fed to jitted render functions;
- ``hit(world_data, rays)``: the pure wavefront nearest-hit query, including
  the reference's back-face handling (flip normal, invert ior —
  8_refract/world.py:31-33, present from stage 8 on; harmless for earlier
  stages where rays never start inside a sphere).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.pytree import pytree_dataclass
from ..core.types import Hits, Material, Materials, Rays
from ..geometry.sphere import intersect_spheres, sphere_normal

_PAD = 128  # pad sphere tables to a lane multiple for clean TPU tiling


class Sphere:
    """Host-side sphere record. ``material`` may be a Material, an RGB tuple
    (stage-6 style albedo shorthand), or None (stages 4-5 normal shading)."""

    __slots__ = ("center", "radius", "material")

    def __init__(self, center, radius, material=None):
        self.center = tuple(float(c) for c in center)
        self.radius = float(radius)
        if material is None:
            material = Material()
        elif not isinstance(material, Material):
            material = Material(albedo=material)  # albedo shorthand
        self.material = material


@pytree_dataclass
class SphereWorldData:
    centers: jnp.ndarray       # f32[S,3] (padded; radius==0 marks padding)
    radii: jnp.ndarray         # f32[S]
    materials: Materials       # leaves [S,...]
    bvh: object = None         # FlatBVH | None (legacy 11_bvh-style accel)


class World:
    """Growable sphere scene (mirrors 10_final/world.py World.add)."""

    def __init__(self, spheres=()):
        self.spheres: list[Sphere] = list(spheres)
        self._cache: SphereWorldData | None = None

    def add(self, sphere: Sphere) -> None:
        self.spheres.append(sphere)
        self._cache = None

    @property
    def size(self) -> int:
        return len(self.spheres)

    def device(self, use_bvh: bool = False) -> SphereWorldData:
        """Upload the scene as padded SoA device arrays (cached).

        ``use_bvh=True`` additionally builds the legacy-line SAH sphere BVH
        (11_bvh.py) enabling ``hit(..., backend='bvh')``. The brute-force
        MXU scan is usually faster on TPU for <~2k spheres.
        """
        if self._cache is None or (use_bvh and self._cache.bvh is None):
            n = len(self.spheres)
            if n == 0:
                raise ValueError("empty world")
            padded = -(-n // _PAD) * _PAD
            centers = np.zeros((padded, 3), np.float32)
            radii = np.zeros((padded,), np.float32)
            for k, s in enumerate(self.spheres):
                centers[k] = s.center
                radii[k] = s.radius
            mats = [s.material for s in self.spheres]
            mats += [Material()] * (padded - n)
            bvh = None
            if use_bvh:
                from ..accel.bvh import build_bvh

                c = centers[:n]
                r = radii[:n, None]
                bvh = build_bvh(c - r, c + r, centroid=c, max_depth=8,
                                max_leaf=4)
            self._cache = SphereWorldData(
                centers=jnp.asarray(centers),
                radii=jnp.asarray(radii),
                materials=Materials.stack(mats),
                bvh=bvh,
            )
        return self._cache


def hit(world: SphereWorldData, rays: Rays, t_min: float = 1e-4,
        backend: str = "auto") -> Hits:
    """Nearest-hit of a ray wavefront against the sphere table.

    ``backend``: 'auto' picks the Pallas sphere-scan kernel on TPU and the
    XLA matmul formulation elsewhere; 'xla' / 'pallas' force one.
    """
    if backend == "auto":
        import jax

        # Pallas sphere-scan kernel everywhere except CPU. Note the TPU
        # backend may be named 'tpu' OR 'axon' (remote-tunnel plugin) —
        # matching on 'tpu' alone silently picks the XLA path, whose [N,S]
        # HBM intermediates are ~100x slower at full resolution.
        backend = "xla" if jax.default_backend() == "cpu" else "pallas"
    if backend == "pallas":
        from ..ops.sphere_scan import intersect_spheres_pallas

        # Pack per-sphere attributes as rows so the kernel's one-hot MXU
        # epilogue gathers the winning sphere's data — XLA's row-takes on
        # a [S] table are serialized on TPU (~52 ms/pass at 1280x720).
        m = world.materials
        attrs = jnp.stack([
            world.centers[:, 0], world.centers[:, 1], world.centers[:, 2],
            world.radii,
            m.albedo[:, 0], m.albedo[:, 1], m.albedo[:, 2],
            m.roughness, m.metallic, m.ior, m.transparency, m.absorptivity,
            jnp.zeros_like(world.radii), jnp.zeros_like(world.radii),
            jnp.zeros_like(world.radii), jnp.zeros_like(world.radii),
        ])
        t, idx, attr = intersect_spheres_pallas(
            rays.ro, rays.rd, world.centers, world.radii,
            world.materials.transparency, t_min=t_min, attrs=attrs,
        )

        hit_mask = jnp.isfinite(t)
        t_safe = jnp.where(hit_mask, t, 0.0)
        point = rays.ro + t_safe[:, None] * rays.rd
        center = attr[0:3].T
        radius = attr[3]
        normal = sphere_normal(point, center, radius)
        backface = jnp.sum(rays.rd * normal, axis=-1) > 0.0
        normal = jnp.where(backface[:, None], -normal, normal)
        ior = jnp.where(backface, 1.0 / jnp.maximum(attr[9], 1e-9), attr[9])
        mat = Materials(
            albedo=attr[4:7].T, roughness=attr[7], metallic=attr[8],
            ior=ior, transparency=attr[10], absorptivity=attr[11],
        )
        return Hits(
            t=t, point=point, normal=normal,
            uv=jnp.zeros((rays.count, 2), jnp.float32),
            obj=jnp.where(hit_mask, idx, -1), hit=hit_mask, material=mat,
        )
    if backend == "bvh":
        from ..accel.traverse import make_sphere_leaf_test, traverse

        if world.bvh is None:
            raise ValueError("World.device(use_bvh=True) required for 'bvh'")
        import jax

        if jax.default_backend() != "cpu" and rays.count > 65536:
            import warnings

            warnings.warn(
                "hit backend 'bvh' (lockstep XLA traversal) is minutes-slow "
                "at wavefront scale on TPU and can outlive the device "
                "watchdog (worker restart); use 'pallas'/'auto' there. "
                "'bvh' remains the portable reference implementation.",
                stacklevel=2)
        lt = make_sphere_leaf_test(world.centers, world.radii,
                                   world.materials.transparency, eps=t_min)
        t, idx = traverse(world.bvh, rays.ro, rays.rd, lt, eps=t_min)
        idx = jnp.maximum(idx, 0)
    else:
        t, idx = intersect_spheres(
            rays.ro, rays.rd, world.centers, world.radii,
            world.materials.transparency, t_min=t_min,
        )

    hit_mask = jnp.isfinite(t)
    t_safe = jnp.where(hit_mask, t, 0.0)
    point = rays.ro + t_safe[:, None] * rays.rd
    center = jnp.take(world.centers, idx, axis=0)
    radius = jnp.take(world.radii, idx, axis=0)
    normal = sphere_normal(point, center, radius)

    mat = world.materials.gather(idx)
    # Back-face: flip the normal and invert the relative ior so refraction
    # exits the medium correctly (8_refract/world.py:31-33).
    backface = jnp.sum(rays.rd * normal, axis=-1) > 0.0
    normal = jnp.where(backface[:, None], -normal, normal)
    ior = jnp.where(backface, 1.0 / mat.ior, mat.ior)
    mat = Materials(
        albedo=mat.albedo, roughness=mat.roughness, metallic=mat.metallic,
        ior=ior, transparency=mat.transparency, absorptivity=mat.absorptivity,
    )

    return Hits(
        t=t,
        point=point,
        normal=normal,
        uv=jnp.zeros((rays.count, 2), jnp.float32),
        obj=jnp.where(hit_mask, idx, -1),
        hit=hit_mask,
        material=mat,
    )
