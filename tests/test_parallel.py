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


def test_legacy_mesh_tile_sharding_bit_identical(devices):
    """The legacy scene pipeline (triangle BVH + atlas taps + environment)
    sharded over pixel tiles is bit-identical to single-device — the full
    mesh path, not just spheres."""
    import warnings

    import numpy as np_

    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.io.obj import MeshData
    from learn_path_tracing_tpu.scene.legacy_world import LegacyWorld

    world = LegacyWorld()
    world.add_mesh(MeshData(
        positions=np_.array([[-1, 0, 0], [1, 0, 0], [1, 2, 0], [-1, 2, 0]],
                            np_.float32),
        normals=np_.array([[0, 0, 1]], np_.float32),
        uvs=np_.array([[0, 0], [1, 0], [1, 1], [0, 1]], np_.float32),
        face_p=np_.array([[0, 1, 2], [0, 2, 3]], np_.int32),
        face_n=np_.array([[0, 0, 0], [0, 0, 0]], np_.int32),
        face_t=np_.array([[0, 1, 2], [0, 2, 3]], np_.int32),
        face_tex=np_.array([0, 0], np_.int32),
    ))
    world.add_sphere((0, 1, 2), 0.5, transparency=0, texture_id=0)
    world.textures.add("missing", 0, size=(8, 8))
    world.set_environment(0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        wd = world.build()

    cam = LegacyCamera(RES)
    cam.set_fov(30)
    cam.set_position((0, 1, 6))
    cam.look_at((0, 1, 0))

    ref, ref_segs = None, None
    img0, segs0 = render(wd, cam.params(), RES, spp=SPP, limit=LIMIT,
                         seed=5, bsdf="legacy", scene="legacy")
    ref, ref_segs = np.asarray(img0), float(segs0)

    mesh = make_mesh(n_tile=8, n_spp=1)
    img, segs = render_multichip(wd, cam.params(), RES, SPP, mesh,
                                 limit=LIMIT, seed=5, bsdf="legacy",
                                 scene="legacy")
    assert np.array_equal(np.asarray(img), ref)
    assert float(segs) == ref_segs


def _legacy_world_and_cam():
    import warnings

    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.io.obj import MeshData
    from learn_path_tracing_tpu.scene.legacy_world import LegacyWorld

    world = LegacyWorld()
    world.add_mesh(MeshData(
        positions=np.array([[-1, 0, 0], [1, 0, 0], [1, 2, 0], [-1, 2, 0]],
                           np.float32),
        normals=np.array([[0, 0, 1]], np.float32),
        uvs=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
        face_p=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        face_n=np.array([[0, 0, 0], [0, 0, 0]], np.int32),
        face_t=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        face_tex=np.array([0, 0], np.int32),
    ))
    world.add_sphere((0, 1, 2), 0.5, transparency=0, texture_id=0)
    world.textures.add("missing", 0, size=(8, 8))
    world.set_environment(0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        wd = world.build()
    cam = LegacyCamera(RES)
    cam.set_fov(30)
    cam.set_position((0, 1, 6))
    cam.look_at((0, 1, 0))
    return wd, cam


@pytest.mark.parametrize("n_tile,n_spp", [(8, 1), (4, 2), (2, 4)])
def test_persistent_sharding_matches_single_device(devices, n_tile, n_spp):
    """The persistent (fast-path) integrator sharded over tile/spp computes
    the same per-sample radiance as single-device: traced-segment counts
    match exactly; images differ only in f32 per-pixel sum association
    (the item schedule is range-local per shard)."""
    from learn_path_tracing_tpu.integrator.persistent import render_persistent
    from learn_path_tracing_tpu.parallel.mesh import render_persistent_multichip

    world = stage8_scene()
    cam = Camera(RES)
    cam.set_position((0, 0.4, 4))
    ref, ref_segs = render_persistent(world.device(), cam.params(), RES,
                                      spp=SPP, limit=LIMIT, seed=5)
    mesh = make_mesh(n_tile=n_tile, n_spp=n_spp)
    img, segs = render_persistent_multichip(world.device(), cam.params(),
                                            RES, SPP, mesh, limit=LIMIT,
                                            seed=5)
    assert float(segs) == float(ref_segs)
    assert np.allclose(np.asarray(img), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_persistent_sharding_legacy_scene(devices):
    """Sharded persistent over the full legacy mesh pipeline (triangle BVH,
    atlas taps, environment lookup)."""
    from learn_path_tracing_tpu.integrator.persistent import render_persistent
    from learn_path_tracing_tpu.parallel.mesh import render_persistent_multichip

    wd, cam = _legacy_world_and_cam()
    ref, ref_segs = render_persistent(wd, cam.params(), RES, spp=SPP,
                                      limit=LIMIT, seed=5, bsdf="legacy",
                                      scene="legacy")
    mesh = make_mesh(n_tile=8, n_spp=1)
    img, segs = render_persistent_multichip(wd, cam.params(), RES, SPP, mesh,
                                            limit=LIMIT, seed=5,
                                            bsdf="legacy", scene="legacy")
    assert float(segs) == float(ref_segs)
    assert np.allclose(np.asarray(img), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_persistent_sharding_validation(devices):
    from learn_path_tracing_tpu.parallel.mesh import render_persistent_multichip

    world = stage8_scene()
    cam = Camera((41, 7))  # 287 pixels: not divisible by 8 tiles
    mesh = make_mesh(n_tile=8, n_spp=1)
    with pytest.raises(ValueError, match="tile axis"):
        render_persistent_multichip(world.device(), cam.params(), (41, 7),
                                    SPP, mesh, limit=LIMIT, seed=5)


@pytest.mark.parametrize("n_tile,n_spp", [(8, 1), (2, 4)])
def test_hybrid_sharding_matches_single_device(devices, n_tile, n_spp):
    """The hybrid integrator sharded over tile/spp computes the same
    per-sample radiance as single-device (range-local phase-A slabs +
    survivor pool per shard): traced-segment counts match exactly; images
    differ only in f32 per-pixel sum association."""
    from learn_path_tracing_tpu.integrator.hybrid import render_hybrid
    from learn_path_tracing_tpu.parallel.mesh import render_hybrid_multichip

    wd, cam = _legacy_world_and_cam()
    ref, ref_segs = render_hybrid(wd, cam.params(), RES, spp=SPP,
                                  limit=LIMIT, seed=5, bsdf="legacy",
                                  scene="legacy", camera_model="jitter")
    mesh = make_mesh(n_tile=n_tile, n_spp=n_spp)
    img, segs = render_hybrid_multichip(wd, cam.params(), RES, SPP, mesh,
                                        limit=LIMIT, seed=5, bsdf="legacy",
                                        scene="legacy",
                                        camera_model="jitter")
    assert float(segs) == float(ref_segs)
    assert np.allclose(np.asarray(img), np.asarray(ref), rtol=1e-5, atol=1e-6)
