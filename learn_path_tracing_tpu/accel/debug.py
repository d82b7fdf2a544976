"""BVH debug tooling: structural tree dump + AABB visual debug render.

Parity targets:
- the reference prints its tree (node index, depth, leaf object counts)
  after every build (/root/reference/legacy/PT_in_one_weekend/
  11_bvh.py:276-284, called at :311; 15_module.py:515-524);
- every BVH-era script carries a ``test_aabb`` kernel that renders the hit
  mask of one AABB as a visual unit test (11_bvh.py:478-484,
  15_module.py:1039-1045) — present but never wired to a runner there;
  here it is a callable helper + actual tests (tests/test_bvh_debug.py).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..camera.camera import CameraParams, generate_rays_for_pixels
from ..geometry.aabb import aabb_hit
from .bvh import FlatBVH


def format_tree(bvh: FlatBVH, max_lines: int | None = None) -> str:
    """Indented DFS dump: one line per node with bounds and, for leaves,
    the primitive count — the print_tree analog (11_bvh.py:276-284)."""
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    low = np.asarray(bvh.low)
    high = np.asarray(bvh.high)
    data = np.asarray(bvh.data)
    cut = np.asarray(bvh.cut)

    lines: list[str] = []
    stack = [(0, 0)]
    truncated = False
    while stack:
        if max_lines is not None and len(lines) >= max_lines:
            truncated = True
            break
        node, depth = stack.pop()
        lo = ", ".join(f"{v:.3g}" for v in low[node])
        hi = ", ".join(f"{v:.3g}" for v in high[node])
        if data[node] >= 0:
            leaf = int(data[node])
            n_prim = int(cut[leaf + 1] - cut[leaf])
            desc = f"leaf#{leaf} prims={n_prim}"
        else:
            desc = f"children=({int(left[node])}, {int(right[node])})"
        lines.append(f"{'  ' * depth}[{node}] aabb=({lo})-({hi}) {desc}")
        if data[node] < 0:
            # push right first so the left child prints first (DFS order)
            stack.append((int(right[node]), depth + 1))
            stack.append((int(left[node]), depth + 1))
    if truncated:
        lines.append(f"... ({bvh.n_nodes} nodes total)")
    return "\n".join(lines)


def print_tree(bvh: FlatBVH, max_lines: int | None = 64) -> None:
    print(format_tree(bvh, max_lines=max_lines))


def tree_stats(bvh: FlatBVH) -> dict:
    """Aggregate structural stats (node/leaf counts, depth, prim counts) —
    the numbers round-over-round perf work wants at a glance."""
    data = np.asarray(bvh.data)
    cut = np.asarray(bvh.cut)
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    depth = np.zeros(data.shape[0], np.int32)
    order = [0]
    for node in order:  # parents precede children in build order
        if data[node] < 0:
            for c in (int(left[node]), int(right[node])):
                depth[c] = depth[node] + 1
                order.append(c)
    leaf_sizes = (cut[1:] - cut[:-1])
    return {
        "n_nodes": int(data.shape[0]),
        "n_leaves": int((data >= 0).sum()),
        "max_depth": int(depth.max(initial=0)),
        "max_leaf_prims": int(leaf_sizes.max(initial=0)),
        "mean_leaf_prims": float(leaf_sizes.mean()) if leaf_sizes.size else 0.0,
        "n_prims": int(cut[-1]) if cut.size else 0,
    }


def render_aabb_mask(low, high, cam: CameraParams, resolution,
                     seed: int = 0) -> np.ndarray:
    """``test_aabb`` analog: render the primary-ray hit mask of one AABB
    (11_bvh.py:478-484 — there it writes 1.0 into the image field; here it
    returns ``bool[W, H]`` for assertions or imaging)."""
    w, h = resolution
    pixel_ids = jnp.arange(w * h, dtype=jnp.uint32)
    rays = generate_rays_for_pixels(cam, resolution, pixel_ids, seed,
                                    jnp.uint32(0), model="center")
    mask = aabb_hit(jnp.asarray(low, jnp.float32),
                    jnp.asarray(high, jnp.float32), rays.ro, rays.rd)
    return np.asarray(mask).reshape(w, h)


def render_bvh_heatmap(bvh: FlatBVH, cam: CameraParams, resolution,
                       seed: int = 0) -> np.ndarray:
    """Per-pixel count of BVH nodes whose AABB the primary ray enters —
    a traversal-cost heatmap (the visual-debug upgrade of test_aabb: hot
    pixels are where packets will walk large node unions)."""
    w, h = resolution
    pixel_ids = jnp.arange(w * h, dtype=jnp.uint32)
    rays = generate_rays_for_pixels(cam, resolution, pixel_ids, seed,
                                    jnp.uint32(0), model="center")
    # [N, M] broadcast slab test; debug-scale only (N*M floats)
    mask = aabb_hit(bvh.low[None, :, :], bvh.high[None, :, :],
                    rays.ro[:, None, :], rays.rd[:, None, :])
    return np.asarray(jnp.sum(mask, axis=1)).reshape(w, h)
