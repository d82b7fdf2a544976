"""Camera ray-generation tests."""

import numpy as np

from learn_path_tracing_tpu.camera import Camera


def rays_grid(cam, model, seed=0, sample=0):
    r = cam.get_rays(seed=seed, sample=sample, model=model)
    w, h = cam.resolution
    return (np.asarray(r.ro).reshape(w, h, 3),
            np.asarray(r.rd).reshape(w, h, 3),
            np.asarray(r.throughput).reshape(w, h, 3))


def test_default_center_ray_looks_minus_z():
    cam = Camera((65, 65), fov=60)
    ro, rd, _ = rays_grid(cam, "center")
    center = rd[32, 32]
    assert np.allclose(center, [0, 0, -1], atol=1e-6)
    assert np.allclose(ro, 0.0)


def test_directions_are_unit():
    cam = Camera((64, 32))
    for model in ("center", "thinlens"):
        _, rd, _ = rays_grid(cam, model)
        assert np.allclose(np.linalg.norm(rd, axis=-1), 1.0, atol=1e-5)


def test_fov_edges_center_model():
    # Horizontal edge pixels (i=0, i=W-1) at the vertical midline span the fov.
    cam = Camera((101, 11), fov=90)
    _, rd, _ = rays_grid(cam, "center")
    left, right = rd[0, 5], rd[100, 5]
    # x-offsets at +-tan(45) before normalize
    assert np.isclose(left[0] / -left[2], -1.0, atol=2e-2)
    assert np.isclose(right[0] / -right[2], 1.0, atol=2e-2)


def test_look_at_points_to_target():
    cam = Camera((33, 33))
    cam.set_position((13.0, 2.0, 3.0))
    cam.look_at((0.0, 0.0, 0.0))
    _, rd, _ = rays_grid(cam, "center")
    center_dir = rd[16, 16]
    expect = -np.array([13.0, 2.0, 3.0])
    expect /= np.linalg.norm(expect)
    assert np.allclose(center_dir, expect, atol=1e-3)


def test_yaw_pitch_rotation():
    cam = Camera((33, 33))
    cam.set_direction(90, 0)  # yaw 90° about +y: -z → -x... check convention
    _, rd, _ = rays_grid(cam, "center")
    d = rd[16, 16]
    # R_yaw(90) @ [0,0,-1] = [sin(90)*-1 ... ] = [-1? ...]; assert unit & in xz-plane
    assert abs(d[1]) < 1e-6
    assert np.isclose(abs(d[0]), 1.0, atol=1e-5)

    cam.set_direction(0, 30)
    _, rd, _ = rays_grid(cam, "center")
    d = rd[16, 16]
    assert np.isclose(d[1], np.sin(np.deg2rad(30)), atol=1e-5)


def test_thinlens_zero_aperture_origin_fixed():
    cam = Camera((16, 16))
    cam.set_position((1.0, 2.0, 3.0))
    ro, _, tp = rays_grid(cam, "thinlens")
    assert np.allclose(ro, [1.0, 2.0, 3.0], atol=1e-6)
    assert np.allclose(tp, 1.0)


def test_thinlens_aperture_spreads_origins_and_focal_plane_converges():
    cam = Camera((9, 9), fov=60)
    cam.set_len(focal_length=5.0, aperture=0.4)
    r1 = cam.get_rays(seed=0, sample=0)
    cam.set_len(focal_length=5.0, aperture=0.0)
    r0 = cam.get_rays(seed=0, sample=0)  # same jitter draws, pinhole lens
    ro1, rd1 = np.asarray(r1.ro), np.asarray(r1.rd)
    ro0, rd0 = np.asarray(r0.ro), np.asarray(r0.rd)
    # origins spread within the aperture disk (diameter = aperture)
    d = np.linalg.norm(ro1 - ro0, axis=-1)
    assert d.max() > 0.0 and d.max() <= 0.2 + 1e-5
    # thin-lens invariant: both rays of each pixel hit the focal plane (z=-5,
    # camera looks -z) at the same point — defocus vanishes in focus.
    t1 = 5.0 / -rd1[:, 2]
    t0 = 5.0 / -rd0[:, 2]
    p1 = ro1 + rd1 * t1[:, None]
    p0 = ro0 + rd0 * t0[:, None]
    assert np.abs(p1 - p0).max() < 1e-4


def test_jitter_model_bit_identical_to_degenerate_thinlens():
    """model='jitter' must be BIT-identical to thinlens with aperture=0,
    focal=1 (it skips the disk sample but draws the same u0/u1 counters) —
    it is substituted on the legacy hot path, so any drift is a silent
    golden break."""
    cam = Camera((17, 9), fov=42.0, focal_length=1.0, aperture=0.0)
    cam.set_position((1.0, 2.0, 3.0))
    cam.look_at((0.0, 0.5, -4.0))
    for seed, sample in ((0, 0), (3, 7), (11, 200)):
        a = cam.get_rays(seed=seed, sample=sample, model="thinlens")
        b = cam.get_rays(seed=seed, sample=sample, model="jitter")
        assert np.array_equal(np.asarray(a.ro), np.asarray(b.ro))
        assert np.array_equal(np.asarray(a.rd), np.asarray(b.rd))


def test_jitter_deterministic_per_sample():
    cam = Camera((8, 8))
    a = np.asarray(cam.get_rays(seed=3, sample=4).rd)
    b = np.asarray(cam.get_rays(seed=3, sample=4).rd)
    c = np.asarray(cam.get_rays(seed=3, sample=5).rd)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_free_fly_moves():
    cam = Camera((4, 4))
    cam.set_direction(0, 0)
    cam.move_front(2.0)
    assert np.allclose(cam.position, (0, 0, -2), atol=1e-6)
    cam.move_right(1.0)
    assert np.allclose(cam.position, (1, 0, -2), atol=1e-6)
    cam.move_up(0.5)
    assert np.allclose(cam.position, (1, 0.5, -2), atol=1e-6)
    cam.rotate(0, 200.0)
    assert cam.pitch == 89.0  # clamped


def test_legacy_fov_convention():
    # The legacy camera's fov is the HALF horizontal angle
    # (view_width = 2*tan(fov), 12_free_view.py:216,231); the modern camera
    # uses the full angle (2*tan(fov/2), 9_dof/camera.py:81). A 30-degree
    # setting must frame ~2x wider on the legacy line.
    import math

    import jax.numpy as jnp
    import numpy as np

    from learn_path_tracing_tpu.camera import Camera, LegacyCamera
    from learn_path_tracing_tpu.camera.camera import generate_rays_for_pixels

    res = (9, 5)
    for cls, half_w in [(Camera, math.tan(math.radians(15.0))),
                        (LegacyCamera, math.tan(math.radians(30.0)))]:
        cam = cls(res, fov=30.0)
        cam.set_direction(0, 0)
        cam.set_position((0, 0, 0))
        # center-of-pixel rays; the rightmost column's direction encodes the
        # horizontal extent: x/(-z) = (i/(w-1) - 0.5) * view_width at i=w-1
        pix = jnp.arange(res[0] * res[1], dtype=jnp.uint32)
        rays = generate_rays_for_pixels(cam.params(), res, pix, 0, 0,
                                        model="center")
        rd = np.asarray(rays.rd).reshape(res[0], res[1], 3)
        edge = rd[-1, res[1] // 2]
        ratio = edge[0] / -edge[2]
        np.testing.assert_allclose(ratio, half_w, rtol=1e-5)
