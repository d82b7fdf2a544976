"""Sphere-leaf packet BVH (ops/packet_traverse.pack_sphere_packet_tables):
the device-side sphere BVH walk the reference runs (11_bvh.py:331-380) must
agree with the brute quadratic scan exactly — same nearest t, same sphere
id, including the transparent far-root rule (15_module.py:864-896)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from learn_path_tracing_tpu.accel.bvh import build_bvh
from learn_path_tracing_tpu.accel.wide import collapse
from learn_path_tracing_tpu.ops.packet_traverse import (
    pack_sphere_packet_tables,
    packet_traverse,
    treelet_boxes,
)


def _scene(n_spheres, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-20, 20, (n_spheres, 3)).astype(np.float32)
    radii = rng.uniform(0.1, 0.8, (n_spheres,)).astype(np.float32)
    transp = (rng.random(n_spheres) < 0.3).astype(np.float32)
    return centers, radii, transp


def _rays(n_rays, seed=1):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-25, 25, (n_rays, 3)).astype(np.float32)
    rd = rng.normal(size=(n_rays, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def _brute(centers, radii, transp, ro, rd, eps=1e-4):
    oc = np.asarray(ro)[:, None, :] - centers[None, :, :]
    half_b = np.sum(oc * np.asarray(rd)[:, None, :], axis=-1)
    cterm = np.sum(oc * oc, axis=-1) - radii[None, :] ** 2
    disc = half_b ** 2 - cterm
    sq = np.sqrt(np.maximum(disc, 0.0))
    t_near = -half_b - sq
    t_far = -half_b + sq
    t = np.where((t_near < eps) & (transp[None, :] > 0), t_far, t_near)
    t = np.where((disc >= 0.0) & (t > eps), t, np.inf)
    best = np.argmin(t, axis=1)
    tb = t[np.arange(t.shape[0]), best]
    return tb, np.where(np.isfinite(tb), best, -1)


@pytest.mark.parametrize("n_spheres", [100, 1500])
def test_sphere_packet_matches_brute(n_spheres):
    centers, radii, transp = _scene(n_spheres)
    bvh = build_bvh(centers - radii[:, None], centers + radii[:, None],
                    centroid=centers, max_depth=12, max_leaf=4)
    wide = collapse(bvh)
    nodes, entries, runs = pack_sphere_packet_tables(wide, centers, radii,
                                                     transp)
    ro, rd = _rays(2048)
    n = ro.shape[0]
    t, p = packet_traverse(
        nodes, entries, runs, ro, rd,
        t_init=jnp.full((n,), jnp.inf, jnp.float32),
        active=jnp.ones((n,), bool), sort_rays=False, interpret=True,
        treelets=treelet_boxes(nodes, entries), leaf_kind="sphere")
    t = np.where(np.asarray(p) >= 0, np.asarray(t), np.inf)
    tb, pb = _brute(centers, radii, transp, ro, rd)
    hit = np.isfinite(tb)
    assert np.array_equal(np.isfinite(t), hit)
    # same sphere chosen; t agrees within quadratic conditioning (grazing
    # hits amplify 1-ulp FMA differences through sqrt(b^2 - c) — both
    # values are valid f32 evaluations of the same quadratic)
    assert np.array_equal(np.asarray(p)[hit], pb[hit])
    assert np.allclose(t[hit], tb[hit], rtol=2e-5, atol=1e-3)


@pytest.mark.slow  # 16k spheres through the interpreter (~minutes)
def test_sphere_packet_16k_vs_brute():
    centers, radii, transp = _scene(16384, seed=7)
    bvh = build_bvh(centers - radii[:, None], centers + radii[:, None],
                    centroid=centers, max_depth=16, max_leaf=4)
    wide = collapse(bvh)
    nodes, entries, runs = pack_sphere_packet_tables(wide, centers, radii,
                                                     transp)
    ro, rd = _rays(1024, seed=9)
    n = ro.shape[0]
    t, p = packet_traverse(
        nodes, entries, runs, ro, rd,
        t_init=jnp.full((n,), jnp.inf, jnp.float32),
        active=jnp.ones((n,), bool), sort_rays=False, interpret=True,
        leaf_kind="sphere")
    t = np.where(np.asarray(p) >= 0, np.asarray(t), np.inf)
    tb, pb = _brute(centers, radii, transp, ro, rd)
    hit = np.isfinite(tb)
    assert np.array_equal(np.isfinite(t), hit)
    assert np.array_equal(np.asarray(p)[hit], pb[hit])
    assert np.allclose(t[hit], tb[hit], rtol=2e-5, atol=1e-3)


def test_big_sphere_world_builds_packet_and_renders():
    """A legacy world past SPHERE_SCAN_CEILING auto-builds the packet
    tables; hit_legacy walks the device BVH (no warning) and matches the
    same world with packet disabled (brute scan)."""
    import warnings

    from learn_path_tracing_tpu.camera import Camera
    from learn_path_tracing_tpu.scene import legacy_world as lw

    centers, radii, transp = _scene(300, seed=3)

    def mk(sphere_packet, ceiling):
        world = lw.LegacyWorld()
        for c, r, tr in zip(centers, radii, transp):
            world.add_sphere(tuple(c), float(r), transparency=int(tr),
                             texture_id=0)
        world.textures.add("missing", 0, size=(8, 8))
        world.set_environment(0)
        old = lw.SPHERE_SCAN_CEILING
        lw.SPHERE_SCAN_CEILING = ceiling
        try:
            with warnings.catch_warnings(record=True) as caught:
                warnings.simplefilter("always")
                built = world.build(sphere_packet=sphere_packet)
            # missing-texture warnings are expected; a sphere-scan scale
            # warning would mean the packet path failed to engage
            assert not any("brute scan" in str(w.message) for w in caught)
            return built
        finally:
            lw.SPHERE_SCAN_CEILING = old

    wd_packet = mk(sphere_packet=None, ceiling=100)   # auto: above ceiling
    assert wd_packet.spheres.packet is not None
    wd_brute = mk(sphere_packet=False, ceiling=10**9)
    assert wd_brute.spheres.packet is None

    cam = Camera((20, 16))
    cam.set_position((0, 0, 30))
    cam.look_at((0, 0, 0))
    from learn_path_tracing_tpu.camera.camera import generate_rays
    from learn_path_tracing_tpu.scene.legacy_world import hit_legacy

    rays = generate_rays(cam.params(), (20, 16), seed=2, sample=0,
                         model="thinlens")
    a = hit_legacy(wd_packet, rays)   # CPU path: lockstep walk either way
    b = hit_legacy(wd_brute, rays)
    assert np.array_equal(np.asarray(a.hit), np.asarray(b.hit))
    assert np.allclose(np.asarray(a.t), np.asarray(b.t), equal_nan=True)
