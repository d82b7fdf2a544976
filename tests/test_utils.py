"""Aux subsystems: config, checks, profiling, chunked render."""

import numpy as np
import pytest

from learn_path_tracing_tpu.camera import Camera
from learn_path_tracing_tpu.integrator.wavefront import render, render_chunked
from learn_path_tracing_tpu.models import stage6_scene
from learn_path_tracing_tpu.utils.checks import device_smoke_test, validate_image
from learn_path_tracing_tpu.utils.config import STAGE_CONFIGS, RenderConfig
from learn_path_tracing_tpu.utils.profiling import RayStats


def test_render_chunked_identical():
    w = stage6_scene().device()
    cam = Camera((20, 14))
    cam.set_position((0, 0, 4))
    a, sa = render(w, cam.params(), (20, 14), 7, 5, 2, bsdf="diffuse")
    b, sb = render_chunked(w, cam.params(), (20, 14), 7, 5, 2, chunk_spp=3,
                           bsdf="diffuse")
    # same math/order; different programs may contract FMAs differently
    assert np.allclose(np.asarray(a), np.asarray(b), rtol=0, atol=5e-7)
    assert float(sa) == float(sb)


def test_config():
    c = RenderConfig()
    assert c.resolution == (1280, 720)
    c2 = c.with_(spp=4)
    assert c2.spp == 4 and c.spp == 128
    assert STAGE_CONFIGS[10].propagate_limit == 32
    d = c.to_dict()
    assert d["bsdf"] == "modern"


def test_device_smoke():
    assert device_smoke_test()


def test_validate_image():
    validate_image(np.ones((4, 4, 3), np.float32))
    with pytest.raises(FloatingPointError):
        validate_image(np.array([[np.nan, 0, 0]], np.float32))
    with pytest.raises(FloatingPointError):
        validate_image(np.array([[-0.1, 0, 0]], np.float32))


def test_ray_stats():
    rs = RayStats()
    rs.add(label="x", seconds=2.0, segments=4e6, pixels=1000, spp=4)
    rep = rs.report()
    assert '"mrays_per_sec": 2.0' in rep
    assert '"avg_bounces": 1000.0' in rep


def test_progressive_resume_state():
    from learn_path_tracing_tpu.viewer import ProgressiveRenderer

    w = stage6_scene().device()
    cam = Camera((10, 8))
    cam.set_position((0, 0, 4))
    pr = ProgressiveRenderer(w, cam, (10, 8), spp_per_frame=2, limit=4,
                             bsdf="diffuse", scene="spheres")
    f1 = pr.render(moved=True)
    state = pr.state()
    f2 = pr.render(moved=False)

    pr2 = ProgressiveRenderer(w, cam, (10, 8), spp_per_frame=2, limit=4,
                              bsdf="diffuse", scene="spheres")
    pr2.restore(state)
    f2b = pr2.render(moved=False)
    assert np.array_equal(np.asarray(f2), np.asarray(f2b))
