"""Cross-validate the two timing methodologies on the axon tunnel.

Times the packet traversal (a kernel whose ~7.7 ms cost is corroborated by
end-to-end renders) and the bary math with BOTH:
  - time_fn (iters=4, readback-subtraction)
  - async loop (iters=32, single force at end)
If they agree on the traversal but disagree on the small kernels, the
readback subtraction is the artifact. If the async loop reads absurdly low
on the traversal too, the relay is collapsing duplicate dispatches.

Usage:  python scripts/profile_timecheck.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from learn_path_tracing_tpu.bsdf.bsdf import scatter_legacy
    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.camera.camera import generate_rays_for_pixels
    from learn_path_tracing_tpu.core import rng
    from learn_path_tracing_tpu.core.pytree import tree_where
    from learn_path_tracing_tpu.ops.packet_traverse import packet_traverse
    from learn_path_tracing_tpu.scene.legacy_world import hit_legacy
    from learn_path_tracing_tpu.utils.benchlib import time_fn

    res = (640, 360)
    n = res[0] * res[1]
    from worldcache import load_world
    wd = load_world()
    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))
    cp = cam.params()
    pix = jnp.arange(n, dtype=jnp.uint32)
    rays = jax.jit(lambda s: generate_rays_for_pixels(cp, res, pix, s, 0))(0)

    @jax.jit
    def mk_secondary(wd, rays):
        hits = hit_legacy(wd, rays)
        base = rng.base(rng.stream(0, 0, 0, rng.STREAM_BSDF), pix)
        sc = scatter_legacy(rays, hits, base)
        return tree_where(hits.hit, sc, rays)

    sec = mk_secondary(wd, rays)
    nodes, entries, runs = wd.meshes[0].packet
    t_inf = jnp.full((n,), jnp.inf, jnp.float32)
    alive = jnp.ones((n,), bool)
    trav = jax.jit(functools.partial(packet_traverse, sort_rays=True))

    key = jax.random.PRNGKey(0)
    row = jax.random.normal(key, (n, 32), jnp.float32)
    point = jax.random.normal(jax.random.PRNGKey(1), (n, 3), jnp.float32)

    @jax.jit
    def bary(row, point):
        from learn_path_tracing_tpu.geometry.triangle import (
            triangle_barycentrics)
        p1, p2, p3 = row[:, 0:3], row[:, 3:6], row[:, 6:9]
        n0, n1, n2 = row[:, 9:12], row[:, 12:15], row[:, 15:18]
        w1, w2, w3 = triangle_barycentrics(p1, p2, p3, point)
        sm_n = w1[:, None] * n0 + w2[:, None] * n1 + w3[:, None] * n2
        return sm_n

    def bench_async(f, fargs, iters=32):
        out = f(*fargs)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = f(*fargs)
        jax.block_until_ready(out)
        return (time.time() - t0) / iters

    cases = [
        ("packet_sec", trav, (nodes, entries, runs, sec.ro, sec.rd,
                              t_inf, alive)),
        ("bary", bary, (row, point)),
    ]
    for name, f, fargs in cases:
        dt4, _ = time_fn(f, *fargs, iters=4)
        dta = bench_async(f, fargs)
        print(f"{name:12s} time_fn(4): {dt4 * 1e3:8.2f} ms   "
              f"async(32): {dta * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
