"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from learn_path_tracing_tpu.camera import Camera
from learn_path_tracing_tpu.integrator.wavefront import render
from learn_path_tracing_tpu.models import stage6_scene, stage8_scene
from learn_path_tracing_tpu.parallel import make_mesh, render_multichip

RES = (40, 24)  # 960 pixels; not divisible by 8 tiles*? 960/8=120 — fine
SPP = 4
LIMIT = 6


@pytest.fixture(scope="module")
def devices():
    d = jax.devices()
    if len(d) < 8:
        pytest.skip("needs 8 virtual devices")
    return d


def _reference_image(world, cam, bsdf="modern"):
    img, segs = render(world.device(), cam.params(), RES, spp=SPP, limit=LIMIT,
                       seed=5, bsdf=bsdf)
    return np.asarray(img), float(segs)


def test_tile_sharding_bit_identical(devices):
    """Pixel-tile sharding does no cross-device math → bit-identical image."""
    world = stage8_scene()
    cam = Camera(RES)
    cam.set_position((0, 0.4, 4))
    ref, ref_segs = _reference_image(world, cam)

    mesh = make_mesh(n_tile=8, n_spp=1)
    img, segs = render_multichip(world.device(), cam.params(), RES, SPP, mesh,
                                 limit=LIMIT, seed=5)
    assert np.array_equal(np.asarray(img), ref)
    assert float(segs) == ref_segs


def test_spp_sharding_allclose(devices):
    """Sample sharding changes only the psum order → allclose, same count."""
    world = stage6_scene()
    cam = Camera(RES)
    cam.set_position((0, 0, 4))
    ref, ref_segs = _reference_image(world, cam, bsdf="diffuse")

    mesh = make_mesh(n_tile=2, n_spp=4)
    img, segs = render_multichip(world.device(), cam.params(), RES, SPP, mesh,
                                 limit=LIMIT, seed=5, bsdf="diffuse")
    assert np.allclose(np.asarray(img), ref, rtol=1e-5, atol=1e-6)
    assert float(segs) == ref_segs


def test_tile_padding_handled(devices):
    """Pixel count not divisible by tile count still renders correctly."""
    res = (17, 11)  # 187 pixels, pads to 192 over 8 tiles
    world = stage6_scene()
    cam = Camera(res)
    cam.set_position((0, 0, 4))
    ref, _ = render(world.device(), cam.params(), res, spp=2, limit=4,
                    seed=3, bsdf="diffuse")

    mesh = make_mesh(n_tile=8, n_spp=1)
    img, _ = render_multichip(world.device(), cam.params(), res, 2, mesh,
                              limit=4, seed=3, bsdf="diffuse")
    assert np.array_equal(np.asarray(img), np.asarray(ref))


def test_mesh_validation():
    with pytest.raises(ValueError):
        make_mesh(n_tile=3, n_spp=3)
