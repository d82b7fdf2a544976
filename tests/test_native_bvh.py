"""Native (C++) SAH builder must produce arrays identical to the numpy one."""

import numpy as np
import pytest

from learn_path_tracing_tpu.accel.bvh import build_bvh
from learn_path_tracing_tpu.accel.native import native_available

needs_native = pytest.mark.skipif(not native_available(),
                                  reason="native builder unavailable")


def _random_prims(np_rng, n):
    base = np_rng.normal(size=(n, 3)).astype(np.float32) * 5
    ext = np_rng.uniform(0.05, 1.0, size=(n, 3)).astype(np.float32)
    return base - ext, base + ext


@needs_native
def test_native_matches_numpy_exactly(np_rng):
    for n in (5, 64, 1000):
        plow, phigh = _random_prims(np_rng, n)
        a = build_bvh(plow, phigh, max_depth=12, max_leaf=4, backend="numpy")
        b = build_bvh(plow, phigh, max_depth=12, max_leaf=4, backend="native")
        for field in ("left", "right", "data", "cut", "prim"):
            assert np.array_equal(np.asarray(getattr(a, field)),
                                  np.asarray(getattr(b, field))), (field, n)
        for field in ("low", "high"):
            assert np.array_equal(np.asarray(getattr(a, field)),
                                  np.asarray(getattr(b, field))), (field, n)
        assert a.max_leaf == b.max_leaf


@needs_native
def test_native_yoimiya_scale(np_rng):
    import os
    obj = "/root/reference/assets/models/Yoimiya/Yoimiya_ShapeChange.obj"
    if not os.path.exists(obj):
        pytest.skip("reference mesh unavailable")
    import time

    from learn_path_tracing_tpu.io.obj import load_obj

    mesh = load_obj(obj, 1, flip_z=True, flip_textcoord=True)
    tri = mesh.positions[mesh.face_p]
    t0 = time.time()
    b = build_bvh(tri.min(1), tri.max(1), centroid=tri.mean(1),
                  max_depth=16, max_leaf=4, backend="native")
    t_native = time.time() - t0
    a = build_bvh(tri.min(1), tri.max(1), centroid=tri.mean(1),
                  max_depth=16, max_leaf=4, backend="numpy")
    assert np.array_equal(np.asarray(a.left), np.asarray(b.left))
    assert np.array_equal(np.asarray(a.prim), np.asarray(b.prim))
    assert t_native < 5.0
