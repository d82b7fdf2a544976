"""Shared helpers for the legacy-line stage scripts (l11..l15)."""

from __future__ import annotations

import os

DEFAULT_ASSET_ROOT = "/root/reference/assets"


def make_asset_path_map(asset_root: str | None = None):
    """Rewrite the reference's run-dir-relative texture paths ('./models/…',
    './textures/…') to an assets root directory."""
    root = asset_root or DEFAULT_ASSET_ROOT

    def path_map(p: str) -> str:
        if p.startswith("./"):
            return os.path.join(root, p[2:])
        return p

    return path_map


def save_frame(img, path):
    from ..core import image as image_io

    image_io.write_png(img, path)
    print(f"wrote {path}")
