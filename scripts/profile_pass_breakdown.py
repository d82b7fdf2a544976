"""Per-component cost of one persistent-integrator pass on the Yoimiya mesh
at the ACTUAL pool width (the auto policy picks n/4 = 57.6k lanes at
640x360), so fixed/latency costs are weighted the way the integrator pays
them. Components are timed as separate jits — XLA fusion across them in the
real pass body can only make the total cheaper.

Usage:  python scripts/profile_pass_breakdown.py [--lanes 57600]
"""

import argparse
import functools
import os
import sys
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lanes", type=int, default=57600)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from learn_path_tracing_tpu.bsdf.bsdf import scatter_legacy
    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.camera.camera import generate_rays_for_pixels
    from learn_path_tracing_tpu.core import rng
    from learn_path_tracing_tpu.core.pytree import tree_where
    from learn_path_tracing_tpu.ops.packet_traverse import packet_traverse
    from learn_path_tracing_tpu.scene.legacy_world import (
        LegacyWorld, environment_color, hit_legacy)
    from learn_path_tracing_tpu.stages.legacy_common import make_asset_path_map
    from learn_path_tracing_tpu.utils.benchlib import time_fn

    res = (640, 360)
    n_full = res[0] * res[1]
    lanes = args.lanes
    from worldcache import load_world
    wd = load_world()
    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))
    cp = cam.params()
    # lanes spread over the full pixel range, like the persistent item algebra
    pix = (jnp.arange(lanes, dtype=jnp.uint32)
           * jnp.uint32(max(n_full // lanes, 1)))

    @jax.jit
    def gen(seed):
        return generate_rays_for_pixels(cp, res, pix, seed, 0)

    rays = gen(0)

    @jax.jit
    def mk_secondary(wd, rays):
        hits = hit_legacy(wd, rays)
        base = rng.base(rng.stream(0, 0, 0, rng.STREAM_BSDF), pix)
        sc = scatter_legacy(rays, hits, base)
        return tree_where(hits.hit, sc, rays), hits

    sec, hits_prim = mk_secondary(wd, rays)
    mesh = wd.meshes[0]
    nodes, entries, runs = mesh.packet
    t_inf = jnp.full((lanes,), jnp.inf, jnp.float32)
    alive = jnp.ones((lanes,), bool)

    trav = jax.jit(functools.partial(packet_traverse, sort_rays=True))
    hit_full = jax.jit(hit_legacy)
    hits_sec = hit_full(wd, sec)

    @jax.jit
    def env_only(wd, rays):
        return environment_color(wd.envs, wd.env_id, rays.rd, rays.alive)

    @jax.jit
    def scatter_only(rays, hits):
        base = rng.base(rng.stream(0, 0, 0, rng.STREAM_BSDF), pix)
        return scatter_legacy(rays, hits, base)

    parts = [
        ("camera regen", gen, (1,)),
        ("packet trav (sec, sorted)", trav,
         (nodes, entries, runs, sec.ro, sec.rd, t_inf, alive)),
        ("hit_legacy full (sec)", hit_full, (wd, sec)),
        ("env tap", env_only, (wd, sec)),
        ("scatter_legacy", scatter_only, (sec, hits_sec)),
    ]
    for name, f, fa in parts:
        dt, _ = time_fn(f, *fa, iters=5)
        print(f"{name:28s} {dt*1e3:7.2f} ms  "
              f"({lanes/dt/1e6:6.1f} Mlanes/s)", flush=True)


if __name__ == "__main__":
    main()
