"""Wide BVH must agree with the binary traversal / brute force."""

import jax.numpy as jnp
import numpy as np
import pytest

from learn_path_tracing_tpu.accel.bvh import build_bvh
from learn_path_tracing_tpu.accel.traverse import (
    make_sphere_leaf_test,
    make_triangle_leaf_test,
    traverse,
)
from learn_path_tracing_tpu.accel.wide import collapse, decode_leaf, traverse_wide


def test_collapse_structure(np_rng):
    n = 500
    c = np_rng.normal(size=(n, 3)).astype(np.float32) * 5
    r = np_rng.uniform(0.1, 0.6, size=n).astype(np.float32)
    flat = build_bvh(c - r[:, None], c + r[:, None], centroid=c,
                     max_depth=12, max_leaf=4)
    wide = collapse(flat)
    entry = np.asarray(wide.child_entry)
    # every primitive appears exactly once across all leaf runs
    seen = []
    for code in entry.reshape(-1):
        if code < 0 and code != np.int32(-(2 ** 30)):
            v = -(int(code) + 1)
            start, count = v // 64, v % 64
            seen.extend(np.asarray(wide.prim)[start:start + count].tolist())
    assert sorted(seen) == list(range(n))
    # inner-child references are valid wide-node ids
    inner = entry[(entry >= 0)]
    assert inner.max(initial=0) < entry.shape[0]


@pytest.mark.parametrize(
    "max_depth,max_leaf",
    [(12, 4),
     pytest.param(6, 4, marks=pytest.mark.slow),
     pytest.param(16, 2, marks=pytest.mark.slow)])
def test_wide_matches_binary_spheres(np_rng, max_depth, max_leaf):
    n_s, n_r = 300, 400
    c = np_rng.normal(size=(n_s, 3)).astype(np.float32) * 5
    r = np_rng.uniform(0.1, 0.8, size=n_s).astype(np.float32)
    tr = (np_rng.uniform(size=n_s) < 0.2).astype(np.float32)
    ro = np_rng.normal(size=(n_r, 3)).astype(np.float32) * 4
    rd = np_rng.normal(size=(n_r, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)

    flat = build_bvh(c - r[:, None], c + r[:, None], centroid=c,
                     max_depth=max_depth, max_leaf=max_leaf)
    wide = collapse(flat)
    lt = make_sphere_leaf_test(*map(jnp.asarray, (c, r, tr)))
    t_b, p_b = traverse(flat, jnp.asarray(ro), jnp.asarray(rd), lt)
    t_w, p_w = traverse_wide(wide, jnp.asarray(ro), jnp.asarray(rd), lt)
    t_b, p_b, t_w, p_w = map(np.asarray, (t_b, p_b, t_w, p_w))
    assert np.array_equal(np.isfinite(t_b), np.isfinite(t_w))
    hit = np.isfinite(t_b)
    assert np.allclose(t_b[hit], t_w[hit], rtol=1e-6, atol=1e-7)
    assert np.array_equal(p_b[hit], p_w[hit])


def test_wide_matches_binary_triangles(np_rng):
    t_count, n_r = 400, 300
    base = np_rng.normal(size=(t_count, 3)).astype(np.float32) * 4
    v0 = base
    v1 = base + np_rng.normal(size=(t_count, 3)).astype(np.float32)
    v2 = base + np_rng.normal(size=(t_count, 3)).astype(np.float32)
    ro = np_rng.normal(size=(n_r, 3)).astype(np.float32) * 4
    rd = np_rng.normal(size=(n_r, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)

    plow = np.minimum(np.minimum(v0, v1), v2)
    phigh = np.maximum(np.maximum(v0, v1), v2)
    flat = build_bvh(plow, phigh, centroid=(v0 + v1 + v2) / 3,
                     max_depth=14, max_leaf=4)
    wide = collapse(flat)
    lt = make_triangle_leaf_test(*map(jnp.asarray, (v0, v1, v2)))
    t_b, p_b = traverse(flat, jnp.asarray(ro), jnp.asarray(rd), lt)
    t_w, p_w = traverse_wide(wide, jnp.asarray(ro), jnp.asarray(rd), lt)
    t_b, p_b, t_w, p_w = map(np.asarray, (t_b, p_b, t_w, p_w))
    assert np.array_equal(np.isfinite(t_b), np.isfinite(t_w))
    hit = np.isfinite(t_b)
    assert np.allclose(t_b[hit], t_w[hit], rtol=1e-6, atol=1e-7)
    assert (p_b[hit] == p_w[hit]).mean() > 0.995  # coplanar ties


def test_wide_fat_leaves(np_rng):
    """Depth-capped trees produce >8-prim leaves; runs must split cleanly.

    Small n keeps the binary traversal's per-leaf unroll compile time sane
    on one CPU core while leaves still exceed the 8-slot run width."""
    n = 150
    c = np_rng.normal(size=(n, 3)).astype(np.float32)
    r = np_rng.uniform(0.05, 0.2, size=n).astype(np.float32)
    tr = np.zeros(n, np.float32)
    flat = build_bvh(c - r[:, None], c + r[:, None], centroid=c,
                     max_depth=3, max_leaf=4)  # leaves ~19 prims (>8)
    wide = collapse(flat)
    assert wide.max_leaf <= 63
    ro = np_rng.normal(size=(100, 3)).astype(np.float32) * 2
    rd = np_rng.normal(size=(100, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    lt = make_sphere_leaf_test(*map(jnp.asarray, (c, r, tr)))
    t_b, p_b = traverse(flat, jnp.asarray(ro), jnp.asarray(rd), lt)
    t_w, p_w = traverse_wide(wide, jnp.asarray(ro), jnp.asarray(rd), lt)
    hit = np.isfinite(np.asarray(t_b))
    assert np.array_equal(hit, np.isfinite(np.asarray(t_w)))
    assert np.allclose(np.asarray(t_b)[hit], np.asarray(t_w)[hit], rtol=1e-6)
