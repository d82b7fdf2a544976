"""Why does a narrow drain pass cost ~7 ms?

profile_mesh_passes shows the yoimiya bench spends ~53% of wall time in
115 drain passes covering 1.7% of the lane-work (0.3 M lanes in ~835 ms,
vs 19.5 M lanes in ~740 ms of full passes). This times each component of
a drain-level pass body at the cascade widths so the cost is attributable:
hit_legacy (packet traversal + attrs), scatter, camera regen, scatter-add
accumulation, and the fully composed step.

Usage:  python scripts/profile_drain_cost.py
"""

import os
import sys
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from learn_path_tracing_tpu.bsdf.bsdf import scatter_legacy
    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.camera.camera import generate_rays_for_pixels
    from learn_path_tracing_tpu.core import rng
    from learn_path_tracing_tpu.core.pytree import tree_where
    from learn_path_tracing_tpu.scene.legacy_world import (
        environment_color, hit_legacy)
    from learn_path_tracing_tpu.utils.benchlib import time_fn
    from worldcache import load_world

    res = (640, 360)
    n_full = res[0] * res[1]
    wd = load_world()
    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))
    cp = cam.params()

    # Build a realistic "deep tail" ray population: trace primaries, keep
    # scattering; bounce-3 survivors on the character are the drain rays.
    full_pix = jnp.arange(57600, dtype=jnp.uint32) * jnp.uint32(n_full // 57600)

    @jax.jit
    def gen(pix, seed):
        return generate_rays_for_pixels(cp, res, pix, seed, 0)

    @jax.jit
    def bounce(wd, rays, pix, b):
        hits = hit_legacy(wd, rays)
        base = rng.base(rng.stream(0, 0, b, rng.STREAM_BSDF), pix)
        sc = scatter_legacy(rays, hits, base)
        alive = rays.alive & hits.hit
        sc = type(sc)(ro=sc.ro, rd=sc.rd, throughput=sc.throughput,
                      alive=alive)
        return tree_where(hits.hit, sc, rays), alive

    rays = gen(full_pix, 0)
    alive = jnp.ones((57600,), bool)
    for b in range(3):
        rays, alive = bounce(wd, rays, full_pix, b)
    n_alive = int(jnp.sum(alive.astype(jnp.int32)))
    print(f"bounce-3 survivors: {n_alive} / 57600", flush=True)

    order = jnp.argsort(jnp.logical_not(alive), stable=True)
    for width in (7424, 1024, 256):
        sel = order[:width]
        pix = jnp.take(full_pix, sel, axis=0)
        r = type(rays)(ro=jnp.take(rays.ro, sel, axis=0),
                       rd=jnp.take(rays.rd, sel, axis=0),
                       throughput=jnp.take(rays.throughput, sel, axis=0),
                       alive=jnp.take(alive, sel, axis=0))

        hit_j = jax.jit(hit_legacy)
        hits = hit_j(wd, r)

        @jax.jit
        def scat(r, hits, pix):
            base = rng.base(rng.stream(0, 0, 5, rng.STREAM_BSDF), pix)
            return scatter_legacy(r, hits, base)

        @jax.jit
        def regen(pix):
            return generate_rays_for_pixels(cp, res, pix, 0, 3,
                                            model="jitter")

        acc0 = jnp.zeros((n_full, 3), jnp.float32)

        @jax.jit
        def scatter_add(acc, pix, contrib):
            return acc.at[pix].add(contrib)

        @jax.jit
        def env(wd, r):
            return environment_color(wd.envs, wd.env_id, r.rd,
                                     gradient_h=wd.env_gradient_h)

        @jax.jit
        def full_step(wd, r, pix, acc):
            hits = hit_legacy(wd, r)
            esc = r.alive & ~hits.hit
            contrib = jnp.where(
                esc[:, None],
                environment_color(wd.envs, wd.env_id, r.rd,
                                  gradient_h=wd.env_gradient_h)
                * r.throughput, 0.0)
            base = rng.base(rng.stream(0, 0, 5, rng.STREAM_BSDF), pix)
            sc = scatter_legacy(r, hits, base)
            survived = r.alive & hits.hit
            fresh = generate_rays_for_pixels(cp, res, pix, 0, 7,
                                             model="jitter")
            out = tree_where(survived, sc, fresh)
            acc = acc.at[pix].add(contrib)
            return out, acc

        contrib = jnp.zeros((width, 3), jnp.float32)
        parts = [
            ("hit_legacy", hit_j, (wd, r)),
            ("scatter_legacy", scat, (r, hits, pix)),
            ("camera regen", regen, (pix,)),
            ("scatter_add", scatter_add, (acc0, pix, contrib)),
            ("env tap", env, (wd, r)),
            ("FULL STEP", full_step, (wd, r, pix, acc0)),
        ]
        print(f"--- width {width} ---", flush=True)
        for name, f, fa in parts:
            dt, _ = time_fn(f, *fa, iters=10)
            print(f"  {name:16s} {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
