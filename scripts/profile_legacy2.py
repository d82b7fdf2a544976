"""Second-level mesh-path profiling: the fused pass body, argsort cost,
attribute/tap pipeline in isolation, and packet-block-size sweep.

Usage:  python scripts/profile_legacy2.py
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
    from learn_path_tracing_tpu.ops.packet_traverse import (
        _coherence_order,
        packet_traverse,
    )
    from learn_path_tracing_tpu.scene.legacy_world import (
        LegacyWorld,
        environment_color,
        hit_legacy,
    )
    from learn_path_tracing_tpu.stages.legacy_common import make_asset_path_map
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

    @jax.jit
    def gen(seed):
        return generate_rays_for_pixels(cp, res, pix, seed, 0)

    rays = gen(0)
    mesh = wd.meshes[0]
    nodes, entries, runs = mesh.packet

    # secondary-style rays: scatter once so directions are incoherent
    @jax.jit
    def mk_secondary(wd, rays):
        hits = hit_legacy(wd, rays)
        base = rng.base(rng.stream(0, 0, 0, rng.STREAM_BSDF), pix)
        sc = scatter_legacy(rays, hits, base)
        return tree_where(hits.hit, sc, rays)

    sec = mk_secondary(wd, rays)

    @jax.jit
    def argsort_key(ro, rd):
        order, inv = _coherence_order(nodes, entries, ro, rd)
        return inv

    t_inf = jnp.full((n,), jnp.inf, jnp.float32)
    alive = jnp.ones((n,), bool)
    trav_sorted = jax.jit(functools.partial(packet_traverse, sort_rays=True))
    trav_unsorted = jax.jit(functools.partial(packet_traverse, sort_rays=False))

    @jax.jit
    def full_pass(wd, rays, seed):
        """The persistent body: hit + env + scatter + regen + accumulate."""
        hits = hit_legacy(wd, rays)
        escaped = rays.alive & ~hits.hit
        contrib = jnp.where(
            escaped[:, None],
            environment_color(wd.envs, wd.env_id, rays.rd, escaped)
            * rays.throughput, 0.0)
        base = rng.base(rng.stream(seed, 0, 0, rng.STREAM_BSDF), pix)
        sc = scatter_legacy(rays, hits, base)
        fresh = generate_rays_for_pixels(cp, res, pix, seed + 1, 1)
        out = tree_where(hits.hit, sc, fresh)
        spp = 16
        k = (pix % spp).astype(jnp.uint32)
        groups = n // spp
        k_g = k.reshape(groups, spp)
        c_g = contrib.reshape(groups, spp, 3)
        onehot = (k_g[:, :, None]
                  == jnp.arange(spp, dtype=jnp.uint32)).astype(jnp.float32)
        acc = jax.lax.dot_general(onehot, c_g, (((1,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        return out, acc

    parts = [
        ("argsort_inv", argsort_key, (rays.ro, rays.rd)),
        ("packet_prim_sort", trav_sorted,
         (nodes, entries, runs, rays.ro, rays.rd, t_inf, alive)),
        ("packet_prim_nosort", trav_unsorted,
         (nodes, entries, runs, rays.ro, rays.rd, t_inf, alive)),
        ("packet_sec_sort", trav_sorted,
         (nodes, entries, runs, sec.ro, sec.rd, t_inf, alive)),
        ("packet_sec_nosort", trav_unsorted,
         (nodes, entries, runs, sec.ro, sec.rd, t_inf, alive)),
        ("full_pass_prim", full_pass, (wd, rays, 0)),
        ("full_pass_sec", full_pass, (wd, sec, 0)),
    ]
    for name, f, fargs in parts:
        dt, _ = time_fn(f, *fargs, iters=4)
        print(f"{name:20s} {dt * 1e3:8.2f} ms  ({n / dt / 1e6:8.1f} Mlanes/s)",
              flush=True)


if __name__ == "__main__":
    main()
