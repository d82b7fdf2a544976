"""Cohort integrator vs reference-mode render: identical RNG counters per
(pixel, sample, bounce), so per-sample radiance matches bitwise and only
the per-pixel f32 summation order differs (~1 ulp); traced-segment counts
match exactly (every path is traced exactly once in either integrator)."""

import warnings

import numpy as np
import pytest

from learn_path_tracing_tpu.camera import Camera
from learn_path_tracing_tpu.integrator.cohort import render_cohort
from learn_path_tracing_tpu.integrator.wavefront import render
from learn_path_tracing_tpu.models import stage6_scene, stage8_scene

RES = (28, 20)


def test_cohort_equals_wavefront_modern():
    world = stage8_scene()
    cam = Camera(RES)
    cam.set_position((0, 0.4, 4))
    wd = world.device()
    a_img, a_seg = render(wd, cam.params(), RES, spp=6, limit=8, seed=11)
    b_img, b_seg = render_cohort(wd, cam.params(), RES, spp=6, limit=8,
                                 seed=11, bsdf="modern", scene="spheres",
                                 camera_model="thinlens", chunk_spp=2)
    assert np.allclose(np.asarray(a_img), np.asarray(b_img),
                       rtol=0, atol=5e-7)
    assert float(a_seg) == float(b_seg)


def test_cohort_chunking_invariant():
    """The spp slab size is an implementation detail: any chunk_spp yields
    the same image (same RNG counters) and the same segment count."""
    world = stage6_scene()
    cam = Camera(RES)
    cam.set_position((0, 0, 4))
    wd = world.device()
    imgs, segs = [], []
    for chunk in (1, 2, 4):
        img, seg = render_cohort(wd, cam.params(), RES, spp=4, limit=16,
                                 seed=3, bsdf="diffuse", scene="spheres",
                                 camera_model="thinlens", chunk_spp=chunk)
        imgs.append(np.asarray(img))
        segs.append(float(seg))
    assert segs[0] == segs[1] == segs[2]
    assert np.allclose(imgs[0], imgs[1], rtol=0, atol=5e-7)
    assert np.allclose(imgs[0], imgs[2], rtol=0, atol=5e-7)


def _mini_legacy_world():
    from learn_path_tracing_tpu.io.obj import MeshData
    from learn_path_tracing_tpu.scene.legacy_world import LegacyWorld

    world = LegacyWorld()
    world.add_mesh(MeshData(
        positions=np.array([[-3, 0, -3], [3, 0, -3], [3, 0, 3], [-3, 0, 3]],
                           np.float32),
        normals=np.array([[0, 1, 0]], np.float32),
        uvs=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
        face_p=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        face_n=np.zeros((2, 3), np.int32),
        face_t=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        face_tex=np.zeros(2, np.int32),
    ))
    world.add_sphere((0, 1, 0), 0.8, transparency=0, texture_id=0)
    world.textures.add("missing", 0, size=(8, 8))
    world.set_environment(0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return world.build()


@pytest.mark.slow  # compiles two full legacy integrator graphs (~80 s/core)
def test_cohort_equals_wavefront_legacy():
    wd = _mini_legacy_world()
    cam = Camera(RES)
    cam.set_position((0, 2, 6))
    cam.look_at((0, 0.5, 0))
    a_img, a_seg = render(wd, cam.params(), RES, spp=3, limit=6, seed=7,
                          bsdf="legacy", scene="legacy")
    b_img, b_seg = render_cohort(wd, cam.params(), RES, spp=3, limit=6,
                                 seed=7, bsdf="legacy", scene="legacy",
                                 camera_model="thinlens", chunk_spp=1)
    assert np.allclose(np.asarray(a_img), np.asarray(b_img),
                       rtol=0, atol=5e-7)
    assert float(a_seg) == float(b_seg)


def test_cohort_primary_sort_override_legacy():
    """sort_rays=False primary traversal is a pure reordering — results
    must be identical to the default sorted path."""
    wd = _mini_legacy_world()
    cam = Camera(RES)
    cam.set_position((0, 2, 6))
    cam.look_at((0, 0.5, 0))
    a_img, a_seg = render_cohort(wd, cam.params(), RES, spp=2, limit=4,
                                 seed=5, bsdf="legacy", scene="legacy",
                                 camera_model="thinlens", chunk_spp=2)
    b_img, b_seg = render_cohort(wd, cam.params(), RES, spp=2, limit=4,
                                 seed=5, bsdf="legacy", scene="legacy",
                                 camera_model="thinlens", chunk_spp=2,
                                 primary_sort=False)
    assert np.allclose(np.asarray(a_img), np.asarray(b_img),
                       rtol=0, atol=5e-7)
    assert float(a_seg) == float(b_seg)


def test_cohort_defer_scatter_matches_default():
    """defer_scatter moves the bounce-0 scatter after the first compaction;
    same RNG counters, so results match the immediate-scatter path."""
    wd = _mini_legacy_world()
    cam = Camera(RES)
    cam.set_position((0, 6, 30))       # far view: hit fraction well under
    cam.look_at((0, 0.5, 0))           # 1/sec_start_div
    a_img, a_seg = render_cohort(wd, cam.params(), RES, spp=2, limit=4,
                                 seed=9, bsdf="legacy", scene="legacy",
                                 camera_model="thinlens", chunk_spp=2)
    b_img, b_seg = render_cohort(wd, cam.params(), RES, spp=2, limit=4,
                                 seed=9, bsdf="legacy", scene="legacy",
                                 camera_model="thinlens", chunk_spp=2,
                                 defer_scatter=True)
    assert np.isfinite(np.asarray(b_img)).all()
    assert np.allclose(np.asarray(a_img), np.asarray(b_img),
                       rtol=0, atol=5e-7)
    assert float(a_seg) == float(b_seg)


def test_cohort_defer_scatter_overflow_is_loud():
    """A slab whose survivors exceed the first cascade level cannot render
    under defer_scatter — the image must be NaN-poisoned, never silently
    missing paths."""
    wd = _mini_legacy_world()
    cam = Camera(RES)
    cam.set_position((0, 2.5, 0.5))    # looking straight down at the quad:
    cam.look_at((0, 0.0, 0.0))         # ~every primary ray hits
    img, _ = render_cohort(wd, cam.params(), RES, spp=2, limit=4, seed=9,
                           bsdf="legacy", scene="legacy",
                           camera_model="thinlens", chunk_spp=2,
                           defer_scatter=True)
    assert np.isnan(np.asarray(img)).any()
