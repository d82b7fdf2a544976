"""Pallas packet traversal must agree with the binary XLA traversal.

Runs the kernel in interpret mode (no TPU needed); small sizes keep the
per-block while_loop re-tracing affordable on one CPU core.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from learn_path_tracing_tpu.accel.bvh import build_bvh
from learn_path_tracing_tpu.accel.traverse import (
    make_triangle_leaf_test,
    traverse,
)
from learn_path_tracing_tpu.accel.wide import collapse
from learn_path_tracing_tpu.ops.packet_traverse import (
    pack_packet_tables,
    packet_traverse,
)


def _mesh(np_rng, t_count):
    base = np_rng.normal(size=(t_count, 3)).astype(np.float32) * 3
    v0 = base
    v1 = base + np_rng.normal(size=(t_count, 3)).astype(np.float32)
    v2 = base + np_rng.normal(size=(t_count, 3)).astype(np.float32)
    return v0, v1, v2


def _tables(v0, v1, v2):
    plow = np.minimum(np.minimum(v0, v1), v2)
    phigh = np.maximum(np.maximum(v0, v1), v2)
    flat = build_bvh(plow, phigh, centroid=(v0 + v1 + v2) / 3,
                     max_depth=12, max_leaf=4)
    wide = collapse(flat)
    return flat, wide, pack_packet_tables(wide, v0, v1, v2)


def test_packet_matches_binary(np_rng):
    v0, v1, v2 = _mesh(np_rng, 60)
    flat, wide, (nodes, entries, runs) = _tables(v0, v1, v2)

    n_r = 64
    ro = np_rng.normal(size=(n_r, 3)).astype(np.float32) * 4
    rd = np_rng.normal(size=(n_r, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)

    lt = make_triangle_leaf_test(*map(jnp.asarray, (v0, v1, v2)))
    t_b, p_b = traverse(flat, jnp.asarray(ro), jnp.asarray(rd), lt)

    t_init = jnp.full((n_r,), jnp.inf, jnp.float32)
    active = jnp.ones((n_r,), bool)
    t_p, p_p = packet_traverse(nodes, entries, runs, jnp.asarray(ro),
                               jnp.asarray(rd), t_init, active,
                               interpret=True)
    t_b, p_b, t_p, p_p = map(np.asarray, (t_b, p_b, t_p, p_p))
    hit_b = np.isfinite(t_b)
    hit_p = np.isfinite(t_p)
    assert np.array_equal(hit_b, hit_p)
    # the packet kernel uses algebraically-refactored triangle coefficients;
    # t agrees to f32 roundoff, prim ids agree except coplanar ties
    assert np.allclose(t_b[hit_b], t_p[hit_p], rtol=1e-4, atol=1e-5)
    assert (p_b[hit_b] == p_p[hit_p]).mean() > 0.95


def test_packet_respects_t_init_and_active(np_rng):
    v0, v1, v2 = _mesh(np_rng, 40)
    flat, wide, (nodes, entries, runs) = _tables(v0, v1, v2)

    n_r = 32
    ro = np_rng.normal(size=(n_r, 3)).astype(np.float32) * 4
    rd = np_rng.normal(size=(n_r, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    active = np_rng.uniform(size=n_r) < 0.5

    t_full, p_full = packet_traverse(
        nodes, entries, runs, jnp.asarray(ro), jnp.asarray(rd),
        jnp.full((n_r,), jnp.inf, jnp.float32), jnp.ones((n_r,), bool),
        interpret=True)

    # inactive lanes keep t_init and prim -1
    t_m, p_m = packet_traverse(
        nodes, entries, runs, jnp.asarray(ro), jnp.asarray(rd),
        jnp.full((n_r,), jnp.inf, jnp.float32), jnp.asarray(active),
        interpret=True)
    t_m, p_m = np.asarray(t_m), np.asarray(p_m)
    assert np.isinf(t_m[~active]).all()
    assert (p_m[~active] == -1).all()
    on = active & np.isfinite(np.asarray(t_full))
    assert np.allclose(t_m[on], np.asarray(t_full)[on], rtol=1e-5)

    # t_init below the real hit distance suppresses the hit
    t_small = jnp.full((n_r,), 1e-3, jnp.float32)
    t_s, p_s = packet_traverse(
        nodes, entries, runs, jnp.asarray(ro), jnp.asarray(rd), t_small,
        jnp.ones((n_r,), bool), interpret=True)
    assert np.allclose(np.asarray(t_s), 1e-3, atol=1e-6)


@pytest.mark.slow
def test_packet_sorted_path_exact(np_rng):
    """sort_rays=True must return lane-exact results vs sort_rays=False
    (needs n > RAY_BLOCK, so it compiles a large interpret-mode grid)."""
    import learn_path_tracing_tpu.ops.packet_traverse as pt

    v0, v1, v2 = _mesh(np_rng, 30)
    flat, wide, (nodes, entries, runs) = _tables(v0, v1, v2)
    n_r = pt.RAY_BLOCK * 2
    ro = np_rng.normal(size=(n_r, 3)).astype(np.float32) * 4
    rd = np_rng.normal(size=(n_r, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    t_init = jnp.full((n_r,), jnp.inf, jnp.float32)
    active = jnp.ones((n_r,), bool)
    a = packet_traverse(nodes, entries, runs, jnp.asarray(ro),
                        jnp.asarray(rd), t_init, active,
                        interpret=True, sort_rays=False)
    b = packet_traverse(nodes, entries, runs, jnp.asarray(ro),
                        jnp.asarray(rd), t_init, active,
                        interpret=True, sort_rays=True)
    assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))


@pytest.mark.parametrize("version", [1, 2, 3])
def test_packet_fat_leaves_two_row_runs(np_rng, version):
    """max_leaf > 8 spills leaf runs into a second packed row; both kernel
    versions must still find every hit (a missed spill row would silently
    drop triangles 9..count of each fat leaf)."""
    v0, v1, v2 = _mesh(np_rng, 80)
    plow = np.minimum(np.minimum(v0, v1), v2)
    phigh = np.maximum(np.maximum(v0, v1), v2)
    flat = build_bvh(plow, phigh, centroid=(v0 + v1 + v2) / 3,
                     max_depth=4, max_leaf=14)  # shallow -> fat leaves
    wide = collapse(flat)
    nodes, entries, runs = pack_packet_tables(wide, v0, v1, v2)
    # the point of this fixture: at least one run must exceed one row
    assert int(np.asarray(flat.cut[1:] - flat.cut[:-1]).max()) > 8

    n_r = 64
    ro = np_rng.normal(size=(n_r, 3)).astype(np.float32) * 4
    rd = np_rng.normal(size=(n_r, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    lt = make_triangle_leaf_test(*map(jnp.asarray, (v0, v1, v2)))
    t_b, p_b = traverse(flat, jnp.asarray(ro), jnp.asarray(rd), lt)

    t_p, p_p = packet_traverse(
        nodes, entries, runs, jnp.asarray(ro), jnp.asarray(rd),
        jnp.full((n_r,), jnp.inf, jnp.float32), jnp.ones((n_r,), bool),
        interpret=True, version=version)
    t_b, t_p = np.asarray(t_b), np.asarray(t_p)
    assert np.array_equal(np.isfinite(t_b), np.isfinite(t_p))
    hit = np.isfinite(t_b)
    assert np.allclose(t_b[hit], t_p[hit], rtol=1e-4, atol=1e-5)


def test_packet_v3_matches_v2_exactly(np_rng):
    """The tile-ranged v3 kernel must be bit-identical to v2: lane-tile
    intervals only ever EXCLUDE lanes that provably cannot hit (child AABB
    nests inside the parent's, and the t_best prune is monotone), so hit
    sets, winning prims, and t values may not change at all."""
    from learn_path_tracing_tpu.ops.packet_traverse import packet_traverse

    v0, v1, v2 = _mesh(np_rng, 120)
    flat, wide, (nodes, entries, runs) = _tables(v0, v1, v2)

    n_r = 256
    ro = np_rng.normal(size=(n_r, 3)).astype(np.float32) * 4
    rd = np_rng.normal(size=(n_r, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    t_init = jnp.full((n_r,), jnp.inf, jnp.float32)
    active = jnp.asarray(np_rng.uniform(size=n_r) < 0.9)

    outs = [packet_traverse(nodes, entries, runs, jnp.asarray(ro),
                            jnp.asarray(rd), t_init, active,
                            interpret=True, version=v, sort_rays=False)
            for v in (2, 3)]
    np.testing.assert_array_equal(np.asarray(outs[0][0]),
                                  np.asarray(outs[1][0]))
    np.testing.assert_array_equal(np.asarray(outs[0][1]),
                                  np.asarray(outs[1][1]))


def test_packet_sorted_restart_exact(np_rng):
    """Treelet-restart seeding (restart=True) must return sorted-order
    results identical to the root walk: the seeded stack covers exactly
    the depth-2 treelets some lane enters, which bounds every reachable
    hit (seed_init docstring in ops/packet_traverse._kernel_v2)."""
    from learn_path_tracing_tpu.ops.packet_traverse import (
        RAY_BLOCK,
        packet_traverse_sorted,
    )

    v0, v1, v2 = _mesh(np_rng, 40)
    flat, wide, (nodes, entries, runs) = _tables(v0, v1, v2)
    n_r = RAY_BLOCK * 2
    ro = np_rng.normal(size=(n_r, 3)).astype(np.float32) * 4
    rd = np_rng.normal(size=(n_r, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    active = jnp.asarray(np_rng.random(n_r) < 0.9)
    a = packet_traverse_sorted(nodes, entries, runs, jnp.asarray(ro),
                               jnp.asarray(rd), active, interpret=True,
                               version=2, restart=False)
    b = packet_traverse_sorted(nodes, entries, runs, jnp.asarray(ro),
                               jnp.asarray(rd), active, interpret=True,
                               version=2, restart=True)
    # same key -> same sorted order; t/prim must agree lane-for-lane
    assert np.array_equal(np.asarray(a[5]), np.asarray(b[5]))  # order_idx
    assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))  # prim
    assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))  # t
    assert int(a[4]) == int(b[4])


def test_packet_sorted_payload_rides_the_sort(np_rng):
    """payload columns must come back permuted exactly like order_idx
    (trace_shade_compact carries pool state through this sort)."""
    from learn_path_tracing_tpu.ops.packet_traverse import (
        RAY_BLOCK,
        packet_traverse_sorted,
    )

    v0, v1, v2 = _mesh(np_rng, 30)
    flat, wide, (nodes, entries, runs) = _tables(v0, v1, v2)
    n_r = RAY_BLOCK + 512
    ro = np_rng.normal(size=(n_r, 3)).astype(np.float32) * 4
    rd = np_rng.normal(size=(n_r, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    active = jnp.asarray(np_rng.random(n_r) < 0.8)
    tag = jnp.arange(n_r, dtype=jnp.uint32) * 3 + 7
    val = jnp.asarray(np_rng.normal(size=(n_r,)).astype(np.float32))
    out = packet_traverse_sorted(nodes, entries, runs, jnp.asarray(ro),
                                 jnp.asarray(rd), active, interpret=True,
                                 version=2, payload=(tag, val))
    t_s, prim_s, ro_s, rd_s, entered_n, order_idx, payload_s = out
    oidx = np.asarray(order_idx)
    assert np.array_equal(np.asarray(payload_s[0]), np.asarray(tag)[oidx])
    assert np.array_equal(np.asarray(payload_s[1]), np.asarray(val)[oidx])
    # baseline without payload is unchanged
    base = packet_traverse_sorted(nodes, entries, runs, jnp.asarray(ro),
                                  jnp.asarray(rd), active, interpret=True,
                                  version=2)
    assert np.array_equal(np.asarray(base[1]), np.asarray(prim_s))
    assert np.array_equal(np.asarray(base[5]), oidx)
