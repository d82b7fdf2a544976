from . import color, image, rng
from .pytree import pytree_dataclass, tree_where
from .types import Hits, Material, Materials, Rays

__all__ = [
    "color",
    "image",
    "rng",
    "pytree_dataclass",
    "tree_where",
    "Hits",
    "Material",
    "Materials",
    "Rays",
]
