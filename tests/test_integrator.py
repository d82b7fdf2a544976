"""Wavefront integrator semantics on tiny scenes."""

import jax.numpy as jnp
import numpy as np

from learn_path_tracing_tpu.camera import Camera
from learn_path_tracing_tpu.core.types import Material
from learn_path_tracing_tpu.integrator.wavefront import render, sky_background
from learn_path_tracing_tpu.models import stage6_scene
from learn_path_tracing_tpu.scene.world import Sphere, World

RES = (24, 16)


def test_empty_scene_returns_background_exactly():
    # One sphere behind the camera: nothing in front to hit.
    world = World([Sphere((0, 0, 50.0), 0.1)])
    cam = Camera(RES)
    img, segs = render(world.device(), cam.params(), RES, spp=2, limit=4, seed=1)
    img = np.asarray(img)
    assert img.shape == (RES[0], RES[1], 3)
    assert np.isfinite(img).all()
    assert img.min() >= 0.49  # sky gradient floor is 0.5 (blue channel 1.0)
    # segments: every ray alive exactly 1 bounce
    assert float(segs) == RES[0] * RES[1] * 2


def test_zero_albedo_kills_all_radiance():
    # A black diffuse sphere covering the full field of view: every primary
    # ray hits, throughput drops to 0, so any later escape contributes 0.
    world = World([Sphere((0, 0, -3), 2.5, Material(albedo=(0, 0, 0)))])
    cam = Camera(RES, fov=20)
    img, _ = render(world.device(), cam.params(), RES, spp=1, limit=3, seed=0,
                    bsdf="diffuse")
    assert np.allclose(np.asarray(img), 0.0, atol=1e-7)


def test_inside_opaque_sphere_misses_like_reference():
    # Reference semantics: the far root is only taken for transparent
    # spheres (8_refract/world.py:55-56), so rays starting inside an opaque
    # sphere escape — the image is pure sky.
    world = World([Sphere((0, 0, 0), 10.0, Material(albedo=(0, 0, 0)))])
    cam = Camera(RES)
    img, segs = render(world.device(), cam.params(), RES, spp=1, limit=3, seed=0)
    img = np.asarray(img)
    assert img.min() >= 0.49  # sky everywhere
    assert float(segs) == RES[0] * RES[1]  # one escape bounce per ray


def test_deterministic_across_calls():
    world = stage6_scene()
    cam = Camera(RES)
    cam.set_position((0, 0, 4))
    a, _ = render(world.device(), cam.params(), RES, spp=2, limit=4, seed=9, bsdf="diffuse")
    b, _ = render(world.device(), cam.params(), RES, spp=2, limit=4, seed=9, bsdf="diffuse")
    assert np.array_equal(np.asarray(a), np.asarray(b))
    c, _ = render(world.device(), cam.params(), RES, spp=2, limit=4, seed=10, bsdf="diffuse")
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_diffuse_scene_statistics():
    """Stage-6-like scene at low spp: sphere region darker than sky, image finite,
    and radiance bounded by the sky maximum."""
    world = stage6_scene()
    cam = Camera((48, 32))
    cam.set_position((0, 0, 4))
    img, segs = render(world.device(), cam.params(), (48, 32), spp=8, limit=8,
                       seed=2, bsdf="diffuse")
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img.max() <= 1.0 + 1e-4  # sky peak is 1.0, albedos < 1
    # center column hits the blue sphere: dimmer than top-of-frame sky
    center = img[24, 16].mean()
    sky = img[24, 30].mean()
    assert center < sky
    # segments grow beyond primary rays (some bounces happened)
    assert float(segs) > 48 * 32 * 8


def test_background_gradient_values():
    rd = jnp.array([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0], [1.0, 0.0, 0.0]])
    bg = np.asarray(sky_background(rd))
    assert np.allclose(bg[0], [0.5, 0.7, 1.0], atol=1e-6)
    assert np.allclose(bg[1], [1.0, 1.0, 1.0], atol=1e-6)
    assert np.allclose(bg[2], [0.75, 0.85, 1.0], atol=1e-6)
