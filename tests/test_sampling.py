"""Distribution and identity tests for sampling primitives."""

import jax.numpy as jnp
import numpy as np

from learn_path_tracing_tpu.bsdf import sampling as sp
from learn_path_tracing_tpu.core import rng


def _uniforms(n, dims, seed=11):
    b = rng.base(rng.stream(seed, 0, 0), jnp.arange(n, dtype=jnp.uint32))
    return [np.asarray(rng.uniform(b, d)) for d in range(dims)]


N = 1 << 16


def test_sample_at_sphere_is_unit_and_uniform():
    u1, u2 = _uniforms(N, 2)
    v = np.asarray(sp.sample_at_sphere(jnp.asarray(u1), jnp.asarray(u2)))
    norms = np.linalg.norm(v, axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-5)
    # Uniform on sphere: each coordinate has mean 0, var 1/3.
    assert np.all(np.abs(v.mean(axis=0)) < 0.02)
    assert np.all(np.abs(v.var(axis=0) - 1.0 / 3.0) < 0.01)


def test_sample_in_sphere_radius_distribution():
    u1, u2, u3 = _uniforms(N, 3)
    v = np.asarray(sp.sample_in_sphere(*map(jnp.asarray, (u1, u2, u3))))
    r = np.linalg.norm(v, axis=-1)
    assert r.max() <= 1.0 + 1e-6
    # Uniform in ball: E[r] = 3/4, E[r^2] = 3/5.
    assert abs(r.mean() - 0.75) < 0.01
    assert abs((r ** 2).mean() - 0.6) < 0.01


def test_sample_in_disk_distribution():
    u1, u2 = _uniforms(N, 2)
    d = np.asarray(sp.sample_in_disk(jnp.asarray(u1), jnp.asarray(u2)))
    r2 = (d ** 2).sum(-1)
    assert r2.max() <= 1.0 + 1e-6
    assert abs(r2.mean() - 0.5) < 0.01  # uniform disk: E[r^2] = 1/2


def test_lambertian_cosine_weighted():
    u1, u2 = _uniforms(N, 2)
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (N, 3))
    d = np.asarray(sp.sample_lambertian(n, jnp.asarray(u1), jnp.asarray(u2)))
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    cos = d[:, 2]
    assert cos.min() > -1e-6  # always in upper hemisphere
    assert abs(cos.mean() - 2.0 / 3.0) < 0.01  # cosine-weighted: E[cosθ]=2/3


def test_slerp_endpoints_and_midpoint():
    a = jnp.array([[1.0, 0.0, 0.0]])
    b = jnp.array([[0.0, 1.0, 0.0]])
    s0 = np.asarray(sp.slerp(a, b, jnp.array([0.0])))
    s1 = np.asarray(sp.slerp(a, b, jnp.array([1.0])))
    sm = np.asarray(sp.slerp(a, b, jnp.array([0.5])))
    assert np.allclose(s0, [[1, 0, 0]], atol=1e-6)
    assert np.allclose(s1, [[0, 1, 0]], atol=1e-6)
    assert np.allclose(sm, [[2 ** -0.5, 2 ** -0.5, 0]], atol=1e-6)


def test_slerp_parallel_fallback():
    a = jnp.array([[0.0, 0.0, 1.0]])
    out = np.asarray(sp.slerp(a, a, jnp.array([0.37])))
    assert np.allclose(out, [[0, 0, 1]], atol=1e-6)


def test_reflect_law():
    d = jnp.array([[1.0, -1.0, 0.0]]) / np.sqrt(2.0)
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = np.asarray(sp.reflect(d, n))
    assert np.allclose(r, [[2 ** -0.5, 2 ** -0.5, 0]], atol=1e-6)


def test_refract_snell():
    # 45-degree incidence into ior=1.5: sinθt = sin45/1.5
    d = jnp.array([[np.sin(np.pi / 4), -np.cos(np.pi / 4), 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = np.asarray(sp.refract(d, n, jnp.array([1.5])))
    assert np.allclose(np.linalg.norm(r, axis=-1), 1.0, atol=1e-5)
    sin_t = np.abs(r[0, 0])
    assert abs(sin_t - np.sin(np.pi / 4) / 1.5) < 1e-6
    assert r[0, 1] < 0  # transmitted into the surface


def test_refract_total_internal_reflection():
    # Grazing exit from dense medium (relative ior < 1): TIR → reflection.
    ang = np.deg2rad(80.0)
    d = jnp.array([[np.sin(ang), -np.cos(ang), 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = np.asarray(sp.refract(d, n, jnp.array([1.0 / 1.5])))
    expect = np.asarray(sp.reflect(d, n))
    assert np.allclose(r, expect, atol=1e-6)


def test_schlick_values():
    f = np.asarray(sp.schlick(jnp.array([1.0, 0.0]), jnp.array([0.04, 0.04])))
    assert abs(f[0] - 0.04) < 1e-6
    assert abs(f[1] - 1.0) < 1e-6


def test_sample_normal_zero_roughness_is_halfway_mirror():
    """roughness=0 ⇒ perturbed normal equals the geometric normal direction
    for mirror reflection (r - d bisector)."""
    d = jnp.array([[np.sin(0.6), -np.cos(0.6), 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    u = jnp.array([0.3])
    out = np.asarray(sp.sample_normal(d, n, jnp.array([0.0]), u, u))
    assert np.allclose(out, [[0, 1, 0]], atol=1e-5)
