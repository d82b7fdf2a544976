"""EXR codec + HDR environment (IBL) path.

The reference's flagship character renders are lit by an equirect HDR
environment EXR (15_module.py:118-132, lookup :970-977). The reference
assets are stripped from this snapshot, so these tests build synthetic EXR
fixtures with io/exr.py and prove the full decode → atlas → equirect
lookup chain executes with real HDR data (no sky-gradient fallback).
"""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from learn_path_tracing_tpu.io.exr import read_exr, write_exr
from learn_path_tracing_tpu.io.texture import build_environment_atlas
from learn_path_tracing_tpu.scene.legacy_world import (
    LegacyWorld,
    environment_color,
)


@pytest.mark.parametrize("compression", ["none", "zips", "zip"])
def test_roundtrip_float(tmp_path, compression, np_rng):
    img = (np_rng.random((21, 33, 3)).astype(np.float32) * 8.0)  # HDR range
    p = str(tmp_path / f"rt_{compression}.exr")
    write_exr(p, img, half=False, compression=compression)
    back = read_exr(p)
    np.testing.assert_array_equal(back, img)


def test_roundtrip_half(tmp_path, np_rng):
    img = np_rng.random((16, 16, 3)).astype(np.float32) * 100.0
    p = str(tmp_path / "half.exr")
    write_exr(p, img, half=True, compression="zip")
    back = read_exr(p)
    np.testing.assert_array_equal(back, img.astype(np.float16).astype(np.float32))


def test_roundtrip_gray_and_rgba(tmp_path, np_rng):
    gray = np_rng.random((9, 7)).astype(np.float32)
    p = str(tmp_path / "gray.exr")
    write_exr(p, gray, half=False)
    assert read_exr(p).shape == (9, 7)
    np.testing.assert_array_equal(read_exr(p), gray)

    rgba = np_rng.random((5, 11, 4)).astype(np.float32)
    p = str(tmp_path / "rgba.exr")
    write_exr(p, rgba, half=False)
    back = read_exr(p)
    assert back.shape == (5, 11, 4)  # returned R,G,B,A regardless of
    np.testing.assert_array_equal(back, rgba)  # alphabetical file order


def test_zip_multiblock(tmp_path, np_rng):
    # >16 rows exercises multi-scanline ZIP chunking + the last short block
    img = np_rng.random((37, 8, 3)).astype(np.float32)
    p = str(tmp_path / "multi.exr")
    write_exr(p, img, half=False, compression="zip")
    np.testing.assert_array_equal(read_exr(p), img)


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "nope.exr"
    p.write_bytes(b"not an exr at all")
    with pytest.raises(ValueError, match="not an EXR"):
        read_exr(str(p))


def _env_exr(tmp_path, data):
    p = str(tmp_path / "env.exr")
    write_exr(p, data, half=False, compression="zip")
    return p


def test_environment_atlas_from_exr(tmp_path):
    # constant HDR color (value > 1 proves no LDR clamp anywhere)
    color = np.array([3.0, 0.5, 0.25], np.float32)
    env = np.broadcast_to(color, (16, 32, 3)).copy()
    p = _env_exr(tmp_path, env)
    cfg = [{"file_path": p, "size": (32, 16), "id": 0,
            "area": {"low": (0, 0), "high": (32, 16)}}]
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any fallback warning = failure
        atlas, grad_ids = build_environment_atlas(cfg, (32, 16))
    assert atlas.shape == (32, 16, 3)
    assert not grad_ids  # the EXR decoded; nothing fell back
    np.testing.assert_allclose(atlas, np.broadcast_to(color, (32, 16, 3)))


def test_ibl_render_end_to_end(tmp_path):
    """An EXR flows through TextureManager → build_environment_atlas →
    pack_strips → environment_color with correct equirect orientation."""
    h, w = 32, 64
    env = np.zeros((h, w, 3), np.float32)
    env[: h // 2] = [5.0, 0.0, 0.0]   # upper hemisphere: HDR red
    env[h // 2:] = [0.0, 0.0, 2.0]    # lower hemisphere: blue
    p = _env_exr(tmp_path, env)

    world = LegacyWorld(environment_size=(128, 64))
    world.textures.add("missing", 0, size=(4, 4))
    world.environments.add(p, 0)      # size probed from the EXR header
    world.set_environment(0)
    with warnings.catch_warnings():
        warnings.simplefilter("always")
        caught = warnings.catch_warnings(record=True)
        with caught as rec:
            warnings.simplefilter("always")
            world.build()
    msgs = [str(r.message) for r in rec]
    assert not any("sky gradient" in m or "EXR decode failed" in m
                   for m in msgs), msgs

    wd = world.device()
    # near-pole rather than exactly v=1.0/0.0 (the bilinear tap wraps
    # across the seam at the exact pole, averaging top+bottom rows)
    rd = jnp.array([[0.1, 1.0, 0.0],    # nearly up -> image top
                    [0.1, -1.0, 0.0],   # nearly down -> image bottom
                    [1.0, 0.5, 0.0]])
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    col = np.asarray(environment_color(wd.envs, wd.env_id, rd))
    np.testing.assert_allclose(col[0], [5.0, 0.0, 0.0], atol=0.2)
    np.testing.assert_allclose(col[1], [0.0, 0.0, 2.0], atol=0.2)
    np.testing.assert_allclose(col[2], [5.0, 0.0, 0.0], atol=0.5)  # upper
