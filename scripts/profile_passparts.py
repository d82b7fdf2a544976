"""Stage-by-stage timing of the REAL persistent pass body on Yoimiya,
with realistic escape/hit masks (profile_attrs.py times the tap/env
gathers unmasked, which overstates them — the real pass collapses unused
lanes' tap coords to one texel).

Usage:  python scripts/profile_passparts.py [--width 640 --height 360]
"""

import argparse
import functools
import os
import sys
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
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
        environment_color, hit_legacy)
    from learn_path_tracing_tpu.utils.benchlib import time_fn

    res = (args.width, args.height)
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

    hit_j = jax.jit(hit_legacy)
    hits_sec = hit_j(wd, sec)
    esc = sec.alive & ~hits_sec.hit
    print(f"secondary: hit {float(jnp.mean(hits_sec.hit)):.2f} "
          f"escaped {float(jnp.mean(esc)):.2f}", flush=True)

    trav = jax.jit(functools.partial(packet_traverse, sort_rays=True))

    @jax.jit
    def env_masked(wd, rd, esc):
        return environment_color(wd.envs, wd.env_id, rd, esc)

    @jax.jit
    def env_unmasked(wd, rd):
        return environment_color(wd.envs, wd.env_id, rd)

    @jax.jit
    def scat(rays, hits):
        base = rng.base(rng.stream(0, 0, 0, rng.STREAM_BSDF), pix)
        return scatter_legacy(rays, hits, base)

    @jax.jit
    def regen(seed):
        return generate_rays_for_pixels(cp, res, pix, seed, 1)

    @jax.jit
    def acc(contrib):
        spp = 16
        k = (pix % spp).astype(jnp.uint32)
        groups = n // spp
        k_g = k.reshape(groups, spp)
        c_g = contrib.reshape(groups, spp, 3)
        onehot = (k_g[:, :, None]
                  == jnp.arange(spp, dtype=jnp.uint32)).astype(jnp.float32)
        return jax.lax.dot_general(onehot, c_g, (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)

    contrib = jnp.where(esc[:, None], jnp.ones((n, 3), jnp.float32), 0.0)

    parts = [
        ("traversal_sec", trav,
         (nodes, entries, runs, sec.ro, sec.rd, t_inf, alive)),
        ("hit_legacy_sec (trav+attrs+tap)", hit_j, (wd, sec)),
        ("env_masked", env_masked, (wd, sec.rd, esc)),
        ("env_unmasked", env_unmasked, (wd, sec.rd)),
        ("scatter_legacy", scat, (sec, hits_sec)),
        ("regen_rays", regen, (3,)),
        ("acc_onehot", acc, (contrib,)),
    ]
    for name, f, fargs in parts:
        dt, _ = time_fn(f, *fargs, iters=4)
        print(f"{name:34s} {dt * 1e3:8.2f} ms  "
              f"({n / dt / 1e6:8.1f} Mlanes/s)", flush=True)


if __name__ == "__main__":
    main()
