"""Early-exit bounce loop must be bitwise-identical to the fixed scan."""

import numpy as np
import jax.numpy as jnp

from learn_path_tracing_tpu.camera import Camera
from learn_path_tracing_tpu.camera.camera import pixel_grid
from learn_path_tracing_tpu.integrator.wavefront import trace_sample_pixels
from learn_path_tracing_tpu.models import stage8_scene


def test_early_exit_bitwise_identical():
    world = stage8_scene()
    cam = Camera((32, 20))
    cam.set_position((0, 0.4, 4))
    wd = world.device()
    pix = pixel_grid((32, 20))
    a_rad, a_seg = trace_sample_pixels(wd, cam.params(), (32, 20), pix, 3, 1,
                                       limit=16, early_exit=True)
    b_rad, b_seg = trace_sample_pixels(wd, cam.params(), (32, 20), pix, 3, 1,
                                       limit=16, early_exit=False)
    assert np.array_equal(np.asarray(a_rad), np.asarray(b_rad))
    assert float(a_seg) == float(b_seg)
