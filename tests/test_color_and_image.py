"""ACES/gamma pipeline and PNG raster conventions."""

import numpy as np
import jax.numpy as jnp

from learn_path_tracing_tpu.core import color, image


def _aces_oracle(c):
    """Scalar transcription of 6_diffuse/postprocessing.py:5-24."""
    m_in = np.array([[0.59719, 0.35458, 0.04823],
                     [0.07600, 0.90834, 0.01566],
                     [0.02840, 0.13383, 0.83777]])
    m_out = np.array([[1.60475, -0.53108, -0.07367],
                      [-0.10208, 1.10813, -0.00605],
                      [-0.00327, -0.07276, 1.07602]])
    v = m_in @ c
    a = v * (v + 0.0245786) - 0.000090537
    b = v * (0.983729 * v + 0.4329510) + 0.238081
    return np.maximum(m_out @ (a / b), 0.0)


def test_aces_matches_reference_math():
    rng = np.random.default_rng(0)
    cols = rng.uniform(0, 4, size=(64, 3)).astype(np.float32)
    ours = np.asarray(color.aces_tonemap(jnp.asarray(cols)))
    for k in range(64):
        assert np.allclose(ours[k], _aces_oracle(cols[k].astype(np.float64)),
                           rtol=1e-4, atol=1e-5)


def test_gamma():
    c = jnp.array([[0.25, 1.0, 0.0]])
    out = np.asarray(color.gamma_correct(c, 2.2))
    assert np.allclose(out, [[0.25 ** (1 / 2.2), 1.0, 0.0]], atol=1e-6)


def test_post_process_monotone_and_bounded():
    c = jnp.linspace(0, 10, 300).reshape(100, 3)
    out = np.asarray(color.post_process(c))
    assert out.min() >= 0.0 and out.max() <= 1.2


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, size=(7, 5, 3)).astype(np.float32)
    p = str(tmp_path / "x.png")
    image.write_png(img, p)
    back = image.read_png(p)
    assert back.shape == img.shape
    assert np.abs(back - np.clip(img, 0, 1)).max() <= 1.0 / 255.0 + 1e-6


def test_raster_orientation():
    # img[i, j]: i = column from left, j = row from bottom.
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 1] = 1.0  # left-top in image space
    raster = image.to_raster(img)
    assert raster[0, 0].max() == 255  # top row first in raster
    assert raster[1, 0].max() == 0
