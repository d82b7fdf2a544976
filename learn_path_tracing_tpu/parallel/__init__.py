from .mesh import make_mesh, render_multichip, render_sharded

__all__ = ["make_mesh", "render_multichip", "render_sharded"]
