"""SAH BVH build + traversal: equivalence with brute-force scans."""

import jax.numpy as jnp
import numpy as np
import pytest

from learn_path_tracing_tpu.accel.bvh import build_bvh, bvh_stats
from learn_path_tracing_tpu.accel.traverse import (
    make_sphere_leaf_test,
    make_triangle_leaf_test,
    traverse,
)
from learn_path_tracing_tpu.geometry.sphere import intersect_spheres
from learn_path_tracing_tpu.geometry.triangle import triangle_t


def random_spheres(np_rng, s):
    centers = np_rng.normal(size=(s, 3)).astype(np.float32) * 5
    radii = np_rng.uniform(0.1, 1.0, size=s).astype(np.float32)
    transparency = (np_rng.uniform(size=s) < 0.25).astype(np.float32)
    return centers, radii, transparency


def random_rays(np_rng, n):
    ro = np_rng.normal(size=(n, 3)).astype(np.float32) * 4
    rd = np_rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd


def test_build_structure(np_rng):
    centers, radii, transparency = random_spheres(np_rng, 100)
    bvh = build_bvh(centers - radii[:, None], centers + radii[:, None],
                    centroid=centers, max_depth=8, max_leaf=4)
    st = bvh_stats(bvh)
    assert st["prims"] == 100
    assert st["leaves"] >= 100 // 4 // 4
    left = np.asarray(bvh.left)
    data = np.asarray(bvh.data)
    # inner nodes have children, leaves have data
    inner = data < 0
    assert (left[inner] > 0).all()
    assert (left[~inner] == -1).all()
    # every primitive appears exactly once in leaf order
    assert sorted(np.asarray(bvh.prim).tolist()) == list(range(100))
    # child AABBs are contained in parent AABBs
    low = np.asarray(bvh.low)
    high = np.asarray(bvh.high)
    right = np.asarray(bvh.right)
    for i in np.where(inner)[0]:
        for c in (left[i], right[i]):
            assert (low[c] >= low[i] - 1e-5).all()
            assert (high[c] <= high[i] + 1e-5).all()


def test_sphere_bvh_matches_brute_force(np_rng):
    centers, radii, transparency = random_spheres(np_rng, 200)
    ro, rd = random_rays(np_rng, 400)
    bvh = build_bvh(centers - radii[:, None], centers + radii[:, None],
                    centroid=centers, max_depth=8, max_leaf=4)
    lt = make_sphere_leaf_test(jnp.asarray(centers), jnp.asarray(radii),
                               jnp.asarray(transparency))
    t_bvh, idx_bvh = traverse(bvh, jnp.asarray(ro), jnp.asarray(rd), lt)
    t_ref, idx_ref = intersect_spheres(
        jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(centers),
        jnp.asarray(radii), jnp.asarray(transparency))
    t_bvh, idx_bvh, t_ref, idx_ref = map(np.asarray, (t_bvh, idx_bvh, t_ref, idx_ref))
    # the scan computes the quadratic via the matmul decomposition, the leaf
    # test directly — f32 ordering differences only
    hit_ref = np.isfinite(t_ref)
    assert (np.isfinite(t_bvh) == hit_ref).mean() > 0.995
    both = np.isfinite(t_bvh) & hit_ref
    assert np.allclose(t_bvh[both], t_ref[both], rtol=1e-3, atol=1e-4)
    assert (idx_bvh[both] == idx_ref[both]).mean() > 0.995


def test_triangle_bvh_matches_brute_force(np_rng):
    # random triangle soup
    t_count = 300
    base = np_rng.normal(size=(t_count, 3)).astype(np.float32) * 4
    v0 = base
    v1 = base + np_rng.normal(size=(t_count, 3)).astype(np.float32)
    v2 = base + np_rng.normal(size=(t_count, 3)).astype(np.float32)
    ro, rd = random_rays(np_rng, 300)

    plow = np.minimum(np.minimum(v0, v1), v2)
    phigh = np.maximum(np.maximum(v0, v1), v2)
    bvh = build_bvh(plow, phigh, centroid=(v0 + v1 + v2) / 3,
                    max_depth=12, max_leaf=4)
    lt = make_triangle_leaf_test(*map(jnp.asarray, (v0, v1, v2)))
    t_bvh, idx_bvh = traverse(bvh, jnp.asarray(ro), jnp.asarray(rd), lt)

    # brute force: all-pairs triangle_t then min
    t_all = triangle_t(
        jnp.asarray(v0)[None], jnp.asarray(v1)[None], jnp.asarray(v2)[None],
        jnp.asarray(ro)[:, None], jnp.asarray(rd)[:, None])
    t_ref = np.asarray(jnp.min(t_all, axis=1))
    idx_ref = np.asarray(jnp.argmin(t_all, axis=1))

    t_bvh, idx_bvh = np.asarray(t_bvh), np.asarray(idx_bvh)
    hit_ref = np.isfinite(t_ref)
    assert np.array_equal(np.isfinite(t_bvh), hit_ref)
    assert np.allclose(t_bvh[hit_ref], t_ref[hit_ref], rtol=1e-4, atol=1e-5)
    same = idx_bvh[hit_ref] == idx_ref[hit_ref]
    assert same.mean() > 0.995  # coplanar-tie cases may pick either


def test_single_primitive_and_deep_tree(np_rng):
    centers = np.array([[0, 0, -3]], np.float32)
    radii = np.array([1.0], np.float32)
    tr = np.zeros(1, np.float32)
    bvh = build_bvh(centers - radii[:, None], centers + radii[:, None])
    lt = make_sphere_leaf_test(*map(jnp.asarray, (centers, radii, tr)))
    t, idx = traverse(bvh, jnp.array([[0.0, 0, 0]]), jnp.array([[0.0, 0, -1]]), lt)
    assert np.isclose(float(t[0]), 2.0, atol=1e-5)
    assert int(idx[0]) == 0
    # miss
    t2, idx2 = traverse(bvh, jnp.array([[0.0, 0, 0]]), jnp.array([[0.0, 1, 0]]), lt)
    assert np.isinf(float(t2[0])) and int(idx2[0]) == -1
