"""BVH debug tooling: tree dump, stats, AABB visual debug render."""

import numpy as np

from learn_path_tracing_tpu.accel.bvh import build_bvh
from learn_path_tracing_tpu.accel.debug import (
    format_tree,
    render_aabb_mask,
    render_bvh_heatmap,
    tree_stats,
)
from learn_path_tracing_tpu.camera import Camera


def _toy_bvh(np_rng, n=32):
    centers = np_rng.random((n, 3)).astype(np.float32) * 10
    r = 0.25
    return build_bvh(centers - r, centers + r, centroid=centers,
                     max_depth=8, max_leaf=4)


def test_format_tree_structure(np_rng):
    bvh = _toy_bvh(np_rng)
    dump = format_tree(bvh)
    lines = dump.splitlines()
    assert len(lines) == bvh.n_nodes          # every node printed once
    assert lines[0].startswith("[0] ")        # root first
    assert sum("leaf#" in ln for ln in lines) == int(
        (np.asarray(bvh.data) >= 0).sum())
    # leaf prim counts in the dump sum to the primitive total
    total = sum(int(ln.split("prims=")[1]) for ln in lines if "prims=" in ln)
    assert total == int(np.asarray(bvh.cut)[-1])

    short = format_tree(bvh, max_lines=3)
    assert short.splitlines()[-1].startswith("...")


def test_tree_stats(np_rng):
    bvh = _toy_bvh(np_rng, n=64)
    st = tree_stats(bvh)
    assert st["n_prims"] == 64
    assert st["n_leaves"] >= 64 // st["max_leaf_prims"]
    assert 0 < st["max_depth"] <= 8
    assert st["max_leaf_prims"] <= 4


def test_render_aabb_mask():
    """The test_aabb visual unit test (11_bvh.py:478-484): a unit box in
    front of the camera hits center pixels and misses the border."""
    cam = Camera((32, 24))
    cam.set_position((0.0, 0.0, 5.0))
    cam.look_at((0.0, 0.0, 0.0))
    mask = render_aabb_mask((-0.5, -0.5, -0.5), (0.5, 0.5, 0.5),
                            cam.params(), (32, 24))
    assert mask.shape == (32, 24)
    assert mask[16, 12]                       # center pixel hits
    assert not mask[0, :].any() and not mask[-1, :].any()
    assert not mask[:, 0].any() and not mask[:, -1].any()
    assert 0 < mask.sum() < mask.size


def test_render_bvh_heatmap(np_rng):
    bvh = _toy_bvh(np_rng)
    cam = Camera((16, 12))
    cam.set_position((5.0, 5.0, 25.0))
    cam.look_at((5.0, 5.0, 5.0))
    heat = render_bvh_heatmap(bvh, cam.params(), (16, 12))
    assert heat.shape == (16, 12)
    assert heat.max() >= 1                    # something is on screen
    assert heat.max() <= bvh.n_nodes
