"""Packet-kernel telemetry: per-block traversal lengths (union sizes) for
primary vs bounce wavefronts, sorted vs unsorted, on the Yoimiya mesh.

Turns the ns/iteration and union-size questions into measured numbers.

Usage:  python scripts/profile_packet_stats.py
"""

import os
import sys
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from learn_path_tracing_tpu.bsdf.bsdf import scatter_legacy
    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.camera.camera import generate_rays_for_pixels
    from learn_path_tracing_tpu.core import rng
    from learn_path_tracing_tpu.core.pytree import tree_where
    from learn_path_tracing_tpu.ops import packet_traverse as pt
    from learn_path_tracing_tpu.scene.legacy_world import (
        LegacyWorld, hit_legacy)
    from learn_path_tracing_tpu.stages.legacy_common import make_asset_path_map
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
    m = int(nodes.shape[0])
    r = int(runs.shape[0])
    print(f"wide nodes={m} leaf runs={r} block={pt.RAY_BLOCK}", flush=True)

    t_inf = jnp.full((n,), jnp.inf, jnp.float32)
    alive = jnp.ones((n,), bool)

    import functools
    stats_fn = jax.jit(functools.partial(
        pt.packet_traverse, sort_rays=False, with_stats=True))

    def presort(ro, rd, ti, al):
        order, _ = pt._coherence_order(nodes, entries, ro, rd)
        tk = lambda x: jnp.take(x, order, axis=0)
        return tk(ro), tk(rd), tk(ti), tk(al)

    presort_j = jax.jit(presort)

    for name, (ro, rd) in [("primary", (rays.ro, rays.rd)),
                           ("secondary", (sec.ro, sec.rd))]:
        for sorted_, args in [
                (False, (ro, rd, t_inf, alive)),
                (True, presort_j(ro, rd, t_inf, alive))]:
            dt, (t, prim, iters) = time_fn(stats_fn, nodes, entries, runs,
                                           *args, iters=3)
            it = np.asarray(iters)
            total_it = int(it.sum())
            print(f"{name:9s} sorted={int(sorted_)}  {dt*1e3:7.2f} ms  "
                  f"iters: sum={total_it} mean={it.mean():.0f} "
                  f"p50={np.percentile(it,50):.0f} max={it.max()}  "
                  f"ns/iter/block={dt/max(total_it,1)*1e9:.0f}",
                  flush=True)


if __name__ == "__main__":
    main()
