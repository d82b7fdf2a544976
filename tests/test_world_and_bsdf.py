"""World hit-record semantics and BSDF scatter behavior."""

import jax.numpy as jnp
import numpy as np

from learn_path_tracing_tpu.bsdf.bsdf import scatter_diffuse, scatter_modern
from learn_path_tracing_tpu.core import rng
from learn_path_tracing_tpu.core.types import Material, Rays
from learn_path_tracing_tpu.scene.world import Sphere, World, hit


def _rays(ro, rd):
    ro = jnp.asarray(ro, jnp.float32).reshape(-1, 3)
    rd = jnp.asarray(rd, jnp.float32).reshape(-1, 3)
    n = ro.shape[0]
    return Rays(ro=ro, rd=rd, throughput=jnp.ones((n, 3), jnp.float32),
                alive=jnp.ones((n,), bool))


def test_hit_record_fields():
    world = World([Sphere((0, 0, -3), 1.0, Material(albedo=(0.2, 0.4, 0.6), ior=1.5))])
    h = hit(world.device(), _rays([0, 0, 0], [0, 0, -1]))
    assert bool(h.hit[0])
    assert np.isclose(float(h.t[0]), 2.0, atol=1e-5)
    assert np.allclose(np.asarray(h.point[0]), [0, 0, -2], atol=1e-5)
    assert np.allclose(np.asarray(h.normal[0]), [0, 0, 1], atol=1e-5)
    assert np.allclose(np.asarray(h.material.albedo[0]), [0.2, 0.4, 0.6])
    assert int(h.obj[0]) == 0


def test_backface_flips_normal_and_inverts_ior():
    # Ray from inside a glass sphere: hit the far wall from within.
    world = World([Sphere((0, 0, 0), 1.0, Material(ior=1.5, transparency=1.0))])
    h = hit(world.device(), _rays([0, 0, 0], [0, 0, -1]))
    assert bool(h.hit[0])
    # geometric (outward) normal at (0,0,-1) is (0,0,-1); flipped → (0,0,1)
    assert np.allclose(np.asarray(h.normal[0]), [0, 0, 1], atol=1e-5)
    assert np.isclose(float(h.material.ior[0]), 1.0 / 1.5, atol=1e-6)


def test_miss_is_masked():
    world = World([Sphere((0, 0, -3), 1.0)])
    h = hit(world.device(), _rays([0, 0, 0], [0, 1, 0]))
    assert not bool(h.hit[0])
    assert int(h.obj[0]) == -1
    assert np.isinf(float(h.t[0]))


def _scatter_setup(mat, n=4096):
    world = World([Sphere((0, 0, -3), 1.0, mat)])
    ro = np.tile([0, 0, 0], (n, 1)).astype(np.float32)
    rd = np.tile([0, 0, -1], (n, 1)).astype(np.float32)
    rays = _rays(ro, rd)
    hits = hit(world.device(), rays)
    base = rng.base(rng.stream(0, 0, 0), jnp.arange(n, dtype=jnp.uint32))
    return rays, hits, base


def test_diffuse_scatter():
    rays, hits, base = _scatter_setup(Material(albedo=(0.5, 0.25, 0.125)))
    out = scatter_diffuse(rays, hits, base)
    assert np.allclose(np.asarray(out.throughput), [0.5, 0.25, 0.125])
    assert np.allclose(np.asarray(out.ro), [0, 0, -2], atol=1e-5)
    d = np.asarray(out.rd)
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # all directions in the normal's hemisphere, cosine-distributed
    assert d[:, 2].min() > -1e-5
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.02


def test_metal_scatter_mirror():
    rays, hits, base = _scatter_setup(
        Material(albedo=(0.9, 0.8, 0.7), roughness=0.0, metallic=1.0))
    out = scatter_modern(rays, hits, base)
    d = np.asarray(out.rd)
    # perfect mirror at normal incidence: reflect straight back
    assert np.allclose(d, [0, 0, 1], atol=1e-5)
    # normal incidence: fresnel = F0 = albedo
    assert np.allclose(np.asarray(out.throughput), [0.9, 0.8, 0.7], atol=1e-5)


def test_dielectric_fresnel_split_fractions():
    rays, hits, base = _scatter_setup(
        Material(albedo=(1, 1, 1), roughness=0.0, metallic=0.0, ior=1.5,
                 transparency=1.0))
    out = scatter_modern(rays, hits, base)
    d = np.asarray(out.rd)
    reflected = d[:, 2] > 0.5
    transmitted = d[:, 2] < -0.5
    assert reflected.sum() + transmitted.sum() == d.shape[0]
    # F0 at normal incidence for ior 1.5 = 0.04
    frac = reflected.mean()
    assert abs(frac - 0.04) < 0.01
    # straight-through transmission at normal incidence
    assert np.allclose(d[transmitted], [0, 0, -1], atol=1e-5)


def test_dielectric_opaque_diffuse_branch_uses_geometric_normal():
    rays, hits, base = _scatter_setup(
        Material(albedo=(0.5, 0.5, 0.5), roughness=1.0, metallic=0.0, ior=1.5,
                 transparency=0.0))
    out = scatter_modern(rays, hits, base)
    d = np.asarray(out.rd)
    nonspec = np.asarray(out.throughput)[:, 0] < 0.9  # tinted ⇒ diffuse branch
    # diffuse bounces stay in the geometric normal hemisphere
    assert d[nonspec, 2].min() > -1e-5


def test_energy_never_amplified():
    rays, hits, base = _scatter_setup(
        Material(albedo=(1, 1, 1), roughness=0.3, metallic=1.0))
    out = scatter_modern(rays, hits, base)
    assert np.asarray(out.throughput).max() <= 1.0 + 1e-5
