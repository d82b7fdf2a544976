"""In-loop (chained, dispatch-free) drain-pass component costs.

Complements profile_inloop.py (full-width pass) with the drain levels:
hit_legacy and the composed drain body chained inside one fori_loop at the
cascade widths, fed with REAL bounce survivors (compacted, incoherent).

Usage:  python scripts/profile_drain_inloop.py [--k 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=50)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from learn_path_tracing_tpu.bsdf.bsdf import scatter_legacy
    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.camera.camera import generate_rays_for_pixels
    from learn_path_tracing_tpu.core import rng
    from learn_path_tracing_tpu.core.pytree import tree_where
    from learn_path_tracing_tpu.scene.legacy_world import (
        environment_color, hit_legacy)
    from worldcache import load_world

    res = (640, 360)
    w, h = res
    n = w * h
    K = args.k
    wd = load_world()
    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))
    cp = cam.params()

    pool = 57600
    full_pix = jnp.arange(pool, dtype=jnp.uint32) * jnp.uint32(n // pool)

    @jax.jit
    def gen(pix, seed):
        return generate_rays_for_pixels(cp, res, pix, seed, 0, model="jitter")

    @jax.jit
    def bounce(wd, rays, pix, b):
        hits = hit_legacy(wd, rays)
        base = rng.base(rng.stream(0, 0, b, rng.STREAM_BSDF), pix)
        sc = scatter_legacy(rays, hits, base)
        alive = rays.alive & hits.hit
        sc = type(sc)(ro=sc.ro, rd=sc.rd, throughput=sc.throughput,
                      alive=alive)
        return tree_where(hits.hit, sc, rays), alive

    rays, alive = bounce(wd, gen(full_pix, 0), full_pix, 0)
    n_alive = int(jnp.sum(alive.astype(jnp.int32)))
    print(f"bounce-1 survivors: {n_alive} / {pool}", flush=True)
    order = jnp.argsort(jnp.logical_not(alive), stable=True)

    def timed(name, fn, *fa):
        # NB: world data must be passed as an argument, not closed over —
        # closure capture bakes the scene tables into the HLO as literals
        # and the tunneled remote_compile rejects the oversized program.
        f = jax.jit(fn)
        out = f(*fa)
        float(sum(jnp.sum(x).astype(jnp.float32) for x in
                  jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")))
        t0 = time.time()
        out = f(*fa)
        float(sum(jnp.sum(x).astype(jnp.float32) for x in
                  jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")))
        dt = (time.time() - t0) / K
        print(f"{name:34s} {dt*1e3:7.3f} ms/pass", flush=True)

    acc0 = jnp.zeros((n, 3), jnp.float32)
    for width in (7424, 1024, 256):
        sel = order[:width]
        pix_d = jnp.take(full_pix, sel, axis=0)
        r0 = type(rays)(ro=jnp.take(rays.ro, sel, axis=0),
                        rd=jnp.take(rays.rd, sel, axis=0),
                        throughput=jnp.take(rays.throughput, sel, axis=0),
                        alive=jnp.take(alive, sel, axis=0))

        def hit_chain(wd, r):
            def body(i, r):
                hits = hit_legacy(wd, r)
                ro = r.ro + 1e-30 * hits.t[:, None]
                return type(r)(ro=ro, rd=r.rd, throughput=r.throughput,
                               alive=r.alive)
            return lax.fori_loop(0, K, body, r)

        def drain_body_chain(wd, carry):
            def body(i, carry):
                r, acc = carry
                hits = hit_legacy(wd, r)
                esc = r.alive & ~hits.hit
                contrib = jnp.where(
                    esc[:, None],
                    environment_color(wd.envs, wd.env_id, r.rd,
                                      gradient_h=wd.env_gradient_h)
                    * r.throughput, 0.0)
                base = rng.base(
                    rng.stream(0, 0, i.astype(jnp.uint32), rng.STREAM_BSDF),
                    pix_d)
                sc = scatter_legacy(r, hits, base)
                survived = r.alive & hits.hit
                fresh = generate_rays_for_pixels(
                    cp, res, pix_d, 0, i.astype(jnp.uint32) + 1,
                    model="jitter")
                out = tree_where(survived, sc, fresh)
                out = type(out)(ro=out.ro, rd=out.rd,
                                throughput=out.throughput, alive=r.alive)
                acc = acc.at[pix_d].add(contrib)
                return out, acc
            return lax.fori_loop(0, K, body, carry)

        print(f"--- width {width} ---", flush=True)
        timed("hit_legacy (incoherent)", hit_chain, wd, r0)
        timed("FULL drain body", drain_body_chain, wd, (r0, acc0))


if __name__ == "__main__":
    main()
