"""Mesh-path breakdown with trustworthy (async-loop) timing.

Rebuilds the profile_legacy2/profile_passparts picture using
``time_fn_async`` — the readback-subtraction numbers those scripts printed
vary by more than the kernels cost on a busy tunnel (profile_timecheck.py).
Measures at full-resolution lane count AND at the persistent pool width the
bench actually runs (auto policy: 57.6k lanes), with the env path the bench
uses (analytic sky gradient — the reference EXR is stripped).

Usage:  python scripts/profile_legacy3.py [--width 640 --height 360]
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
    p.add_argument("--iters", type=int, default=32)
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
    from learn_path_tracing_tpu.integrator.wavefront import _scene_fns
    from learn_path_tracing_tpu.ops.packet_traverse import packet_traverse
    from learn_path_tracing_tpu.scene.legacy_world import (
        environment_color, hit_legacy)
    from learn_path_tracing_tpu.utils.benchlib import time_fn_async

    res = (args.width, args.height)
    n_full = res[0] * res[1]
    from worldcache import load_world
    wd = load_world()
    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))
    cp = cam.params()
    hit_fn, background_fn = _scene_fns("legacy")

    nodes, entries, runs = wd.meshes[0].packet
    spp = 64

    def make_cases(n):
        pix = jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(n_full)

        @jax.jit
        def gen(seed):
            return generate_rays_for_pixels(cp, res, pix, seed, 0)

        rays = gen(0)

        @jax.jit
        def mk_secondary(wd, rays):
            hits = hit_legacy(wd, rays)
            base = rng.base(rng.stream(0, 0, 0, rng.STREAM_BSDF), pix)
            sc = scatter_legacy(rays, hits, base)
            return tree_where(hits.hit, sc, rays)

        sec = mk_secondary(wd, rays)
        t_inf = jnp.full((n,), jnp.inf, jnp.float32)
        alive = jnp.ones((n,), bool)
        trav = jax.jit(functools.partial(packet_traverse, sort_rays=True))

        @jax.jit
        def hitfull(wd, rays):
            return hit_legacy(wd, rays)

        @jax.jit
        def env_real(wd, rd, mask):
            return background_fn(wd, rd, mask)

        @jax.jit
        def scat(wd, rays, hits):
            base = rng.base(rng.stream(0, 0, 0, rng.STREAM_BSDF), pix)
            return scatter_legacy(rays, hits, base)

        @jax.jit
        def regen(seed):
            return generate_rays_for_pixels(cp, res, pix, seed, 1)

        @jax.jit
        def full_pass(wd, rays, seed):
            hits = hit_legacy(wd, rays)
            escaped = rays.alive & ~hits.hit
            contrib = jnp.where(
                escaped[:, None],
                background_fn(wd, rays.rd, escaped) * rays.throughput, 0.0)
            base = rng.base(rng.stream(seed, 0, 0, rng.STREAM_BSDF), pix)
            sc = scatter_legacy(rays, hits, base)
            fresh = generate_rays_for_pixels(cp, res, pix, seed + 1, 1)
            out = tree_where(hits.hit, sc, fresh)
            k = (pix % spp).astype(jnp.uint32)
            groups = n // spp
            k_g = k.reshape(groups, spp)
            c_g = contrib.reshape(groups, spp, 3)
            onehot = (k_g[:, :, None]
                      == jnp.arange(spp, dtype=jnp.uint32)).astype(jnp.float32)
            acc = jax.lax.dot_general(
                onehot, c_g, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            return out, acc

        hits_p = hitfull(wd, rays)
        hits_s = hitfull(wd, sec)
        esc = sec.alive & ~hits_s.hit
        return [
            (f"trav_prim@{n}", trav,
             (nodes, entries, runs, rays.ro, rays.rd, t_inf, alive)),
            (f"trav_sec@{n}", trav,
             (nodes, entries, runs, sec.ro, sec.rd, t_inf, alive)),
            (f"hit_legacy_sec@{n}", hitfull, (wd, sec)),
            (f"env_real@{n}", env_real, (wd, sec.rd, esc)),
            (f"scatter@{n}", scat, (wd, sec, hits_s)),
            (f"regen@{n}", regen, (3,)),
            (f"full_pass_prim@{n}", full_pass, (wd, rays, 0)),
            (f"full_pass_sec@{n}", full_pass, (wd, sec, 0)),
        ], hits_p, hits_s

    for n in (n_full, 57600):
        cases, hits_p, hits_s = make_cases(n)
        if n == n_full:
            import numpy as np
            print(f"hit fraction: prim {float(jnp.mean(hits_p.hit)):.3f} "
                  f"sec {float(jnp.mean(hits_s.hit)):.3f}", flush=True)
        for name, f, fargs in cases:
            dt, _ = time_fn_async(f, *fargs, iters=args.iters)
            print(f"{name:24s} {dt * 1e3:8.2f} ms  "
                  f"({n / dt / 1e6:8.1f} Mlanes/s)", flush=True)


if __name__ == "__main__":
    main()
