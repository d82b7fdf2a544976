"""Dispatch-free in-situ attribution of the persistent full-width pass.

profile_insitu.py timed one jitted body per dispatch; the axon tunnel adds a
per-dispatch constant that inflates every such number (solving the
sweep_drain_floor walls linearly gives a REAL full-pass cost of ~3.8 ms vs
the 2.58 ms that script reported). This version times a lax.scan of K exact
body iterations inside ONE jit call, from a steady-state starting point, so
per-pass numbers carry no dispatch overhead. Also prints the measured
per-dispatch overhead so older numbers can be reinterpreted.

Usage:  python scripts/profile_insitu2.py [--lanes 57600 --spp 64 --k 64]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lanes", type=int, default=57600)
    p.add_argument("--spp", type=int, default=64)
    p.add_argument("--k", type=int, default=64)
    p.add_argument("--steady", type=int, default=40)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from learn_path_tracing_tpu.bsdf.bsdf import SCATTERERS
    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.camera.camera import generate_rays_for_pixels
    from learn_path_tracing_tpu.core import rng
    from learn_path_tracing_tpu.core.pytree import tree_where
    from learn_path_tracing_tpu.integrator.wavefront import _scene_fns
    from learn_path_tracing_tpu.utils.benchlib import time_fn, time_fn_async
    from worldcache import load_world

    res = (640, 360)
    n = res[0] * res[1]
    spp, pool, K = args.spp, args.lanes, args.k
    groups = pool // spp
    items_per = -(-(n * spp) // pool)
    seed = 0

    wd = load_world()
    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))
    cp = cam.params()

    scatter = SCATTERERS["legacy"]
    hit_fn, background_fn = _scene_fns("legacy")

    lanes = jnp.arange(pool, dtype=jnp.uint32)
    sample_const = lanes % jnp.uint32(spp)
    group_const = lanes // jnp.uint32(spp)
    karange = jnp.arange(items_per, dtype=jnp.uint32)
    limit = 32

    def item_of(k):
        pixel = group_const + k * jnp.uint32(groups)
        valid = (k < jnp.uint32(items_per)) & (pixel < jnp.uint32(n))
        pixel = jnp.minimum(pixel, jnp.uint32(n - 1))
        return valid, pixel, sample_const

    def primary(pixel, sample):
        return generate_rays_for_pixels(cp, res, pixel, seed, sample)

    def accumulate(acc, k, contrib):
        k_g = k.reshape(groups, spp)
        c_g = contrib.reshape(groups, spp, 3)
        onehot = (k_g[:, :, None] == karange).astype(jnp.float32)
        return acc + lax.dot_general(
            onehot, c_g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    def make_body(do_hit=True, env="real", do_scatter=True, do_regen=True,
                  do_acc=True):
        def body(wd, cached_hits, state):
            rays, k, bounce, acc, segments = state
            _, pixel, sample = item_of(k)
            hits = hit_fn(wd, rays, "auto") if do_hit else cached_hits
            live = jnp.sum(rays.alive.astype(jnp.float32))

            escaped = rays.alive & ~hits.hit
            if env == "real":
                bg = background_fn(wd, rays.rd, escaped)
            elif env == "linear":
                # candidate: exact-linear gradient in arcsin(y) minus the
                # texel blend machinery (edge rows ignored for the probe)
                phi = jnp.arcsin(jnp.clip(rays.rd[:, 1], -1.0, 1.0))
                v = phi / jnp.pi + 0.5
                top = jnp.asarray([0.5, 0.7, 1.0], jnp.float32)
                bottom = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
                bg = bottom[None] * (1.0 - v)[:, None] + top[None] * v[:, None]
            elif env == "ylinear":
                # candidate: modern sky gradient straight in rd.y (no arcsin)
                t = (0.5 * (rays.rd[:, 1] + 1.0))[:, None]
                top = jnp.asarray([0.5, 0.7, 1.0], jnp.float32)
                bottom = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
                bg = bottom[None] * (1.0 - t) + top[None] * t
            else:
                bg = 1.0
            contrib = jnp.where(escaped[:, None], bg * rays.throughput, 0.0)

            base = rng.base(rng.stream(seed, sample, bounce, rng.STREAM_BSDF),
                            pixel)
            scattered = scatter(rays, hits, base) if do_scatter else rays
            survived = rays.alive & hits.hit & (bounce + 1 < limit)

            ended = rays.alive & ~survived
            next_k = k + ended.astype(jnp.uint32)
            nvalid, npix, nsamp = item_of(next_k)
            need_regen = ended & nvalid
            fresh = primary(npix, nsamp) if do_regen else rays
            rays = tree_where(survived, scattered,
                              tree_where(need_regen, fresh, rays))
            alive = survived | need_regen
            rays = type(rays)(ro=rays.ro, rd=rays.rd,
                              throughput=rays.throughput, alive=alive)
            bounce = jnp.where(survived, bounce + 1, jnp.uint32(0))
            if do_acc:
                acc = accumulate(acc, k, contrib)
            return rays, next_k, bounce, acc, segments + live
        return body

    def scanned(body):
        @jax.jit
        def many(wd, cached, state):
            def sbody(st, _):
                return body(wd, cached, st), None
            st, _ = lax.scan(sbody, state, None, length=K)
            return st
        return many

    # steady state: run the true body args.steady passes inside one jit
    valid0, pix0, samp0 = item_of(jnp.uint32(0))
    rays0 = primary(pix0, samp0)
    rays0 = type(rays0)(ro=rays0.ro, rd=rays0.rd,
                        throughput=rays0.throughput, alive=valid0)
    state = (rays0, jnp.zeros((pool,), jnp.uint32),
             jnp.zeros((pool,), jnp.uint32),
             jnp.zeros((groups, items_per, 3), jnp.float32),
             jnp.float32(0.0))
    body_full = make_body()

    @jax.jit
    def advance(wd, state):
        def sbody(st, _):
            return body_full(wd, None, st), None
        st, _ = lax.scan(sbody, state, None, length=args.steady)
        return st

    state = advance(wd, state)
    state = jax.tree.map(lambda x: x.block_until_ready(), state)
    occ = float(jnp.mean(state[0].alive))
    depth_mean = float(jnp.mean(state[2]))
    print(f"pool {pool} items_per {items_per} after {args.steady} passes: "
          f"occupancy {occ:.3f} mean bounce depth {depth_mean:.2f}",
          flush=True)

    cached_hits = jax.jit(lambda w, r: hit_fn(w, r, "auto"))(wd, state[0])
    cached_hits = jax.tree.map(lambda x: x.block_until_ready(), cached_hits)

    # per-dispatch tunnel overhead, for reinterpreting older profiles
    one = jnp.float32(1.0)
    triv = jax.jit(lambda x: x + 1.0)
    dt0, _ = time_fn_async(triv, one, iters=64)
    print(f"per-dispatch overhead (trivial jit): {dt0 * 1e3:.3f} ms",
          flush=True)

    variants = [
        ("full", make_body()),
        ("no_acc", make_body(do_acc=False)),
        ("no_regen*", make_body(do_regen=False)),
        ("no_scatter", make_body(do_scatter=False)),
        ("env_const", make_body(env="const")),
        ("env_linear", make_body(env="linear")),
        ("env_ylinear", make_body(env="ylinear")),
        ("no_hit (cached)", make_body(do_hit=False)),
    ]
    base_dt = None
    for name, body in variants:
        f = scanned(body)
        dt, _ = time_fn(f, wd, cached_hits, state, iters=2)
        per = dt / K
        note = ""
        if name == "full":
            base_dt = per
        elif base_dt:
            note = f"  (saves {1e3 * (base_dt - per):+.2f} ms)"
        print(f"{name:18s} {per * 1e3:7.2f} ms/pass{note}", flush=True)
    print("(* no_regen also drains occupancy across the scan — lower bound "
          "on regen cost)", flush=True)


if __name__ == "__main__":
    main()
