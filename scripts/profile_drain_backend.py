"""Which traversal backend should drain passes use?

The drain cascade's narrow passes cost ~6 ms regardless of width (packet
cost = per-block node-UNION walk; incoherent deep-bounce stragglers union
to ~the whole tree). A per-lane lockstep walk's cost is bounded by the max
per-lane path length instead — plausibly far cheaper at width 256/1024.
Measures packet vs wide-lockstep vs binary-lockstep on depth-k bounce rays
at the cascade's widths.

Usage:  python scripts/profile_drain_backend.py [--depth 6]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--depth", type=int, default=6)
    p.add_argument("--iters", type=int, default=32)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from learn_path_tracing_tpu.accel.traverse import (
        make_triangle_leaf_test, traverse)
    from learn_path_tracing_tpu.accel.wide import traverse_wide
    from learn_path_tracing_tpu.bsdf.bsdf import scatter_legacy
    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.camera.camera import generate_rays_for_pixels
    from learn_path_tracing_tpu.core import rng
    from learn_path_tracing_tpu.core.pytree import tree_where
    from learn_path_tracing_tpu.ops.packet_traverse import packet_traverse
    from learn_path_tracing_tpu.scene.legacy_world import hit_legacy
    from learn_path_tracing_tpu.utils.benchlib import time_fn_async
    from worldcache import load_world

    res = (640, 360)
    n_full = res[0] * res[1]
    wd = load_world()
    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))
    cp = cam.params()

    mesh = wd.meshes[0]
    nodes, entries, runs = mesh.packet
    lt = make_triangle_leaf_test(mesh.v0, mesh.v1, mesh.v2)

    # depth-k bounce rays: iterate hit+scatter, keep lanes still alive&hit
    pix = jnp.arange(n_full, dtype=jnp.uint32)

    @jax.jit
    def gen(seed):
        return generate_rays_for_pixels(cp, res, pix, seed, 0)

    @jax.jit
    def bounce(wd, rays, d):
        hits = hit_legacy(wd, rays)
        base = rng.base(rng.stream(0, 0, d, rng.STREAM_BSDF), pix)
        sc = scatter_legacy(rays, hits, base)
        out = tree_where(hits.hit & rays.alive, sc, rays)
        alive = rays.alive & hits.hit
        return type(out)(ro=out.ro, rd=out.rd, throughput=out.throughput,
                         alive=alive)

    rays = gen(0)
    for d in range(args.depth):
        rays = bounce(wd, rays, d)
    n_alive = int(jnp.sum(rays.alive))
    print(f"depth-{args.depth} survivors: {n_alive}/{n_full}", flush=True)

    # drain-style compaction: alive lanes to the front (scrambled order,
    # like the cascade's stable argsort over the pool)
    order = jnp.argsort(jnp.logical_not(rays.alive), stable=True)

    for w in (256, 1024, 7424):
        sel = order[:w]
        ro = jnp.take(rays.ro, sel, axis=0)
        rd = jnp.take(rays.rd, sel, axis=0)
        alive = jnp.take(rays.alive, sel, axis=0)
        t_inf = jnp.full((w,), jnp.inf, jnp.float32)

        pkt = functools.partial(packet_traverse, sort_rays=True)
        pkt_ns = functools.partial(packet_traverse, sort_rays=False)

        cases = [
            ("packet_sorted", lambda r, d_, a, t:
                pkt(nodes, entries, runs, r, d_, t_init=t, active=a)),
            ("packet_nosort", lambda r, d_, a, t:
                pkt_ns(nodes, entries, runs, r, d_, t_init=t, active=a)),
            ("wide_lockstep", lambda r, d_, a, t:
                traverse_wide(mesh.wide, r, d_, lt, t_init=t)),
            ("bin_lockstep", lambda r, d_, a, t:
                traverse(mesh.bvh, r, d_, lt, t_init=t)),
        ]
        for name, fn in cases:
            jf = jax.jit(fn)
            try:
                dt, _ = time_fn_async(jf, ro, rd, alive, t_inf,
                                      iters=args.iters)
            except Exception as e:  # noqa: BLE001
                print(f"  w={w:5d} {name:15s} FAILED {type(e).__name__}: "
                      f"{e}"[:200], flush=True)
                continue
            print(f"  w={w:5d} {name:15s} {dt * 1e3:7.3f} ms/pass",
                  flush=True)


if __name__ == "__main__":
    main()
