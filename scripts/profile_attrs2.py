"""Attribute/tap decomposition with async timing and REALISTIC indices.

hit_legacy_sec - trav_sec measured ~8 ms at 230k lanes; this isolates which
part (tri-row gather, bary math, strip tap, selects) actually costs, using
the true post-traversal hit pattern (2-9% hit lanes, miss lanes collapsed
to row 0 / texel 0.5) rather than profile_attrs.py's uniform-random indices.

Usage:  python scripts/profile_attrs2.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from learn_path_tracing_tpu.bsdf.bsdf import scatter_legacy
    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.camera.camera import generate_rays_for_pixels
    from learn_path_tracing_tpu.core import rng
    from learn_path_tracing_tpu.core.pytree import tree_where
    from learn_path_tracing_tpu.io.texture import sample_bilinear_strips
    from learn_path_tracing_tpu.ops.packet_traverse import packet_traverse
    from learn_path_tracing_tpu.scene.legacy_world import hit_legacy
    from learn_path_tracing_tpu.utils.benchlib import time_fn_async

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
    t_sec, prim_sec = trav(nodes, entries, runs, sec.ro, sec.rd, t_inf, alive)
    hitm = jnp.isfinite(t_sec)
    pidx = jnp.where(hitm, jnp.maximum(prim_sec, 0), 0)
    point = sec.ro + jnp.where(hitm, t_sec, 0.0)[:, None] * sec.rd

    @jax.jit
    def tri_gather(pidx):
        return jnp.take(wd.tri_attr, pidx, axis=0)

    row = tri_gather(pidx)

    @jax.jit
    def bary_interp(row, point):
        from learn_path_tracing_tpu.geometry.triangle import (
            triangle_barycentrics)
        p1, p2, p3 = row[:, 0:3], row[:, 3:6], row[:, 6:9]
        n0, n1, n2 = row[:, 9:12], row[:, 12:15], row[:, 15:18]
        uv0, uv1, uv2 = row[:, 18:20], row[:, 20:22], row[:, 22:24]
        w1, w2, w3 = triangle_barycentrics(p1, p2, p3, point)
        sm_n = w1[:, None] * n0 + w2[:, None] * n1 + w3[:, None] * n2
        sm_n = sm_n / jnp.maximum(
            jnp.sqrt(jnp.sum(sm_n * sm_n, -1, keepdims=True)), 1e-20)
        sm_uv = w1[:, None] * uv0 + w2[:, None] * uv1 + w3[:, None] * uv2
        return sm_n, sm_uv

    sm_n, sm_uv = bary_interp(row, point)
    u_tap = jnp.where(hitm, sm_uv[:, 0], 0.5)
    v_tap = jnp.where(hitm, sm_uv[:, 1], 0.5)
    tex0 = jnp.zeros((n,), jnp.int32)

    @jax.jit
    def tap(atlas, tex, u, v):
        return sample_bilinear_strips(atlas, tex, u, v, channels=8)

    @jax.jit
    def hitfull(wd, rays):
        return hit_legacy(wd, rays)

    @jax.jit
    def trav_only(ro, rd):
        return trav(nodes, entries, runs, ro, rd, t_inf, alive)

    for name, f, fargs in [
        ("trav_sec", trav_only, (sec.ro, sec.rd)),
        ("hit_legacy_sec", hitfull, (wd, sec)),
        ("tri_row_gather(real)", tri_gather, (pidx,)),
        ("bary_interp", bary_interp, (row, point)),
        ("strip_tap(real)", tap, (wd.atlas, tex0, u_tap, v_tap)),
    ]:
        dt, _ = time_fn_async(f, *fargs, iters=24)
        print(f"{name:22s} {dt * 1e3:8.2f} ms  ({n / dt / 1e6:8.1f} Mlanes/s)",
              flush=True)


if __name__ == "__main__":
    main()
