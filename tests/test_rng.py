"""Statistical + determinism tests for the counter-based RNG."""

import jax.numpy as jnp
import numpy as np

from learn_path_tracing_tpu.core import rng


def _uniform_block(seed=7, sample=3, bounce=2, n=1 << 16, dim=0):
    b = rng.base(rng.stream(seed, sample, bounce), jnp.arange(n, dtype=jnp.uint32))
    return np.asarray(rng.uniform(b, dim))


def test_range_and_dtype():
    u = _uniform_block()
    assert u.dtype == np.float32
    assert u.min() >= 0.0 and u.max() < 1.0


def test_mean_and_variance():
    u = _uniform_block(n=1 << 18)
    assert abs(u.mean() - 0.5) < 2e-3
    assert abs(u.var() - 1.0 / 12.0) < 1e-3


def test_histogram_uniformity():
    u = _uniform_block(n=1 << 18)
    counts, _ = np.histogram(u, bins=64, range=(0, 1))
    expected = len(u) / 64
    # chi-square-ish sanity bound: every bin within 5% of expectation
    assert np.all(np.abs(counts - expected) < 0.05 * expected)


def test_dims_decorrelated():
    a = _uniform_block(dim=0, n=1 << 16)
    b = _uniform_block(dim=1, n=1 << 16)
    r = np.corrcoef(a, b)[0, 1]
    assert abs(r) < 0.01


def test_adjacent_pixels_decorrelated():
    u = _uniform_block(n=1 << 16)
    r = np.corrcoef(u[:-1], u[1:])[0, 1]
    assert abs(r) < 0.01


def test_streams_and_counters_distinct():
    n = 4096
    pix = jnp.arange(n, dtype=jnp.uint32)
    u_cam = np.asarray(rng.uniform(rng.base(rng.stream(1, 0, 0, rng.STREAM_CAMERA), pix), 0))
    u_bsdf = np.asarray(rng.uniform(rng.base(rng.stream(1, 0, 0, rng.STREAM_BSDF), pix), 0))
    u_s1 = np.asarray(rng.uniform(rng.base(rng.stream(1, 1, 0, rng.STREAM_BSDF), pix), 0))
    u_b1 = np.asarray(rng.uniform(rng.base(rng.stream(1, 0, 1, rng.STREAM_BSDF), pix), 0))
    assert not np.allclose(u_cam, u_bsdf)
    assert not np.allclose(u_bsdf, u_s1)
    assert not np.allclose(u_bsdf, u_b1)


def test_deterministic():
    assert np.array_equal(_uniform_block(), _uniform_block())


def test_traced_bounce_matches_python_bounce():
    """Bounce index arriving as a traced array (lax.scan) must produce the
    same stream as a python int — the reshard-invariance cornerstone."""
    import jax

    n = 1024
    pix = jnp.arange(n, dtype=jnp.uint32)

    def f(b):
        return rng.uniform(rng.base(rng.stream(3, 5, b), pix), 2)

    traced = jax.jit(f)(jnp.uint32(7))
    direct = f(7)
    assert np.array_equal(np.asarray(traced), np.asarray(direct))
