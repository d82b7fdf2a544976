from .sphere import intersect_spheres, sphere_normal, sphere_uv

__all__ = ["intersect_spheres", "sphere_normal", "sphere_uv"]
