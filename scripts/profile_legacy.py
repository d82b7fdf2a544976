"""Per-component timing of one legacy (mesh) bounce pass on the live chip.

Times the yoimiya-workload pieces independently so mesh-path optimization
targets the measured bottleneck: packet traversal (sorted/unsorted), the
full hit_legacy (traversal + attribute gathers + atlas taps), the legacy
BSDF, the environment tap, and the end-to-end persistent render.

Usage:  python scripts/profile_legacy.py [--width 640 --height 360]
"""

import argparse
import os
import sys
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--spp", type=int, default=16)
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
    from learn_path_tracing_tpu.ops.packet_traverse import packet_traverse
    from learn_path_tracing_tpu.scene.legacy_world import (
        LegacyWorld,
        environment_color,
        hit_legacy,
    )
    from learn_path_tracing_tpu.stages.legacy_common import make_asset_path_map
    from learn_path_tracing_tpu.utils.benchlib import time_fn

    res = (args.width, args.height)
    n = res[0] * res[1]

    world = LegacyWorld()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        wd = world.load("/root/reference/legacy/Yoimiya.world.npy",
                        path_map=make_asset_path_map())
    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))
    cp = cam.params()
    pix = jnp.arange(n, dtype=jnp.uint32)

    @jax.jit
    def gen(seed):
        return generate_rays_for_pixels(cp, res, pix, seed, 0)

    rays = gen(0)
    mesh = wd.meshes[0]
    nodes, entries, runs = mesh.packet
    t_inf = jnp.full((n,), jnp.inf, jnp.float32)
    alive = jnp.ones((n,), bool)

    import functools

    trav_sorted = jax.jit(functools.partial(packet_traverse, sort_rays=True))
    trav_unsorted = jax.jit(functools.partial(packet_traverse, sort_rays=False))

    @jax.jit
    def hit_full(wd, rays):
        return hit_legacy(wd, rays)

    hits = hit_full(wd, rays)

    @jax.jit
    def bsdf(rays, hits, seed):
        base = rng.base(rng.stream(seed, 0, 0, rng.STREAM_BSDF), pix)
        return scatter_legacy(rays, hits, base)

    @jax.jit
    def env(envs, env_id, rays):
        return environment_color(envs, env_id, rays.rd)

    parts = [
        ("camera_gen", gen, (0,)),
        ("packet_sorted", trav_sorted,
         (nodes, entries, runs, rays.ro, rays.rd, t_inf, alive)),
        ("packet_unsorted", trav_unsorted,
         (nodes, entries, runs, rays.ro, rays.rd, t_inf, alive)),
        ("hit_legacy_full", hit_full, (wd, rays)),
        ("bsdf_legacy", bsdf, (rays, hits, 0)),
        ("environment", env, (wd.envs, wd.env_id, rays)),
    ]
    total = 0.0
    for name, f, fargs in parts:
        dt, _ = time_fn(f, *fargs, iters=4)
        total += dt
        print(f"{name:20s} {dt * 1e3:8.2f} ms  ({n / dt / 1e6:8.1f} Mlanes/s)",
              flush=True)

    from learn_path_tracing_tpu.integrator.persistent import render_persistent

    def run(seed):
        return render_persistent(wd, cp, res, spp=args.spp, limit=32,
                                 seed=seed, bsdf="legacy", scene="legacy")

    dt, (img, segs) = time_fn(run, 0, iters=2)
    avg_path = float(segs) / (n * args.spp)
    print(f"render: {dt:.3f} s   segments={float(segs):.3e}  "
          f"avg_path={avg_path:.2f}  mrays={float(segs) / dt / 1e6:.2f}")


if __name__ == "__main__":
    main()
