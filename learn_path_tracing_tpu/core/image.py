"""Image buffers and PNG I/O.

Framework images follow the reference's field convention
(/root/reference/taichi_pathtracer/1_save_img/__main__.py:8-13): shape
``(W, H, 3)`` with ``img[i, j]`` meaning pixel column ``i`` (left→right) and
row ``j`` (bottom→top). ``write_png``/``read_png`` convert to/from the
top-down ``(H, W, 3)`` raster layout the same way ``ti.tools.imwrite`` does,
so outputs are directly comparable with the reference's golden PNGs.
"""

from __future__ import annotations

import os

import numpy as np


def to_raster(img_wh3) -> np.ndarray:
    """(W, H, 3) float [0,1] → (H, W, 3) uint8, top row first."""
    a = np.asarray(img_wh3)
    a = np.clip(a, 0.0, 1.0)
    a = (a * 255.0 + 0.5).astype(np.uint8)
    return np.transpose(a, (1, 0, 2))[::-1]


def from_raster(raster_hw3: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 top-down → (W, H, 3) float32 in [0,1], bottom-up."""
    a = np.asarray(raster_hw3)[::-1].astype(np.float32) / 255.0
    return np.transpose(a, (1, 0, 2))


def write_png(img_wh3, path: str) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(to_raster(img_wh3)).save(path)


def read_png(path: str) -> np.ndarray:
    """Read a PNG into the framework's (W, H, 3) float [0,1] convention."""
    from PIL import Image

    raster = np.asarray(Image.open(path).convert("RGB"))
    return from_raster(raster)
