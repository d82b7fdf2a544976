"""Multi-mesh worlds: the merged global BVH (one traversal launch per
wavefront, scene/legacy_world._merge_mesh_geometry) must produce exactly
the hits the reference's per-mesh World.hit composition produces
(15_module.py:838-848) — same t/point/normal/uv/material everywhere, with
merged prim ids equal to per-mesh ids plus the mesh's global triangle
offset."""

import warnings

import numpy as np

from learn_path_tracing_tpu.camera import Camera
from learn_path_tracing_tpu.core.types import Rays
from learn_path_tracing_tpu.io.obj import MeshData
from learn_path_tracing_tpu.scene.legacy_world import LegacyWorld, hit_legacy

RES = (24, 18)


def _quad(y, tex, x0=-3.0, x1=3.0):
    return MeshData(
        positions=np.array([[x0, y, -3], [x1, y, -3], [x1, y, 3],
                            [x0, y, 3]], np.float32),
        normals=np.array([[0, 1, 0]], np.float32),
        uvs=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
        face_p=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        face_n=np.zeros((2, 3), np.int32),
        face_t=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        face_tex=np.full(2, tex, np.int32),
    )


def _three_mesh_world(merge):
    world = LegacyWorld()
    world.add_mesh(_quad(0.0, 0))
    world.add_mesh(_quad(1.0, 1, x0=-1.0, x1=1.0))   # floating slab above
    world.add_mesh(_quad(2.0, 0, x0=0.2, x1=2.2))
    world.textures.add("missing", 0, size=(8, 8))
    world.textures.add("missing2", 1, size=(8, 8))
    world.set_environment(0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return world.build(merge_meshes=merge)


def _probe_rays():
    cam = Camera(RES)
    cam.set_position((0, 4, 6))
    cam.look_at((0, 0.5, 0))
    from learn_path_tracing_tpu.camera.camera import generate_rays

    return generate_rays(cam.params(), RES, seed=2, sample=0,
                         model="thinlens")


def test_merged_equals_per_mesh_hits():
    wd_merged = _three_mesh_world(merge=True)
    wd_multi = _three_mesh_world(merge=False)
    assert len(wd_merged.meshes) == 1
    assert len(wd_multi.meshes) == 3

    rays = _probe_rays()
    a = hit_legacy(wd_merged, rays)
    b = hit_legacy(wd_multi, rays)
    for field in ("hit", "t", "point", "normal", "uv"):
        av, bv = np.asarray(getattr(a, field)), np.asarray(getattr(b, field))
        assert np.array_equal(av, bv), field
    for field in ("albedo", "roughness", "metallic", "ior", "transparency",
                  "absorptivity"):
        av = np.asarray(getattr(a.material, field))
        bv = np.asarray(getattr(b.material, field))
        assert np.array_equal(av, bv), field

    # merged prim = per-mesh prim + global triangle offset of its mesh
    offsets = np.cumsum([0] + [int(m.tex.shape[0])
                               for m in wd_multi.meshes])[:-1]
    hit = np.asarray(a.hit)
    pa = np.asarray(a.obj)[hit]
    # recover per-mesh src from the multi path: re-run trace to get src ids
    from learn_path_tracing_tpu.scene.legacy_world import trace_legacy

    _, pb, src = (np.asarray(x) for x in trace_legacy(wd_multi, rays))
    pb, src = pb[hit], src[hit]
    assert np.array_equal(pa, pb + offsets[src - 1])


def test_merged_render_equals_per_mesh_render():
    from learn_path_tracing_tpu.integrator.wavefront import render

    cam = Camera(RES)
    cam.set_position((0, 4, 6))
    cam.look_at((0, 0.5, 0))
    imgs = []
    for merge in (True, False):
        wd = _three_mesh_world(merge=merge)
        img, segs = render(wd, cam.params(), RES, spp=2, limit=4, seed=5,
                           bsdf="legacy", scene="legacy")
        imgs.append((np.asarray(img), float(segs)))
    assert imgs[0][1] == imgs[1][1]
    assert np.array_equal(imgs[0][0], imgs[1][0])
