"""In-loop (dispatch-free) per-pass component costs at ANY pool width.

Same idea as profile_inloop.py (chain each component K times inside one
jitted fori_loop so tunnel dispatch latency cancels), but the world is
passed as a jit ARGUMENT: closing over it bakes the mesh tables into the
HLO as constants, and at 230k-lane widths the serialized remote-compile
request exceeds the tunnel's body limit (HTTP 413).

Usage:  python scripts/profile_inloop2.py [--lanes 230400] [--k 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=16)
    p.add_argument("--lanes", type=int, default=230400)
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
    spp = 64
    pool = args.lanes
    groups = pool // spp
    items_per = max(n * spp // pool, 1)
    K = args.k
    wd = load_world()
    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))
    cp = cam.params()

    lanes = jnp.arange(pool, dtype=jnp.uint32)
    sample_const = lanes % jnp.uint32(spp)
    group_const = lanes // jnp.uint32(spp)
    k0 = jnp.full((pool,), 3, jnp.uint32)
    pix = jnp.minimum(group_const + k0 * jnp.uint32(groups), jnp.uint32(n - 1))

    @jax.jit
    def gen(pix, samp, seed):
        return generate_rays_for_pixels(cp, res, pix, seed, samp,
                                        model="jitter")

    @jax.jit
    def mix(wd, rays):
        hits = hit_legacy(wd, rays)
        base = rng.base(rng.stream(0, sample_const, 0, rng.STREAM_BSDF), pix)
        sc = scatter_legacy(rays, hits, base)
        return tree_where(hits.hit, sc, rays), hits

    rays0, hits0 = mix(wd, gen(pix, sample_const, 0))
    rays0 = type(rays0)(ro=rays0.ro, rd=rays0.rd, throughput=rays0.throughput,
                        alive=jnp.ones((pool,), bool))
    acc0 = jnp.zeros((groups, items_per, 3), jnp.float32)
    contrib0 = jnp.abs(rays0.throughput) * 0.25
    karange = jnp.arange(items_per, dtype=jnp.uint32)

    def timed(name, fn, *fa):
        f = jax.jit(fn)
        out = f(*fa)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
            else x, out)
        float(sum(jnp.sum(x).astype(jnp.float32) for x in
                  jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")))
        t0 = time.time()
        out = f(*fa)
        float(sum(jnp.sum(x).astype(jnp.float32) for x in
                  jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")))
        dt = (time.time() - t0) / K
        print(f"{name:24s} {dt*1e3:7.3f} ms/pass", flush=True)

    def hit_chain(wd, rays):
        def body(i, r):
            hits = hit_legacy(wd, r)
            ro = r.ro + 1e-30 * hits.t[:, None]
            return type(r)(ro=ro, rd=r.rd, throughput=r.throughput,
                           alive=r.alive)
        return lax.fori_loop(0, K, body, rays)

    def scat_chain(wd, rays):
        def body(i, r):
            base = rng.base(rng.stream(0, sample_const, i.astype(jnp.uint32),
                                       rng.STREAM_BSDF), pix)
            sc = scatter_legacy(r, hits0, base)
            return type(sc)(ro=sc.ro, rd=sc.rd, throughput=sc.throughput,
                            alive=r.alive)
        return lax.fori_loop(0, K, body, rays)

    def regen_chain(_):
        def body(i, r):
            fresh = gen(pix, sample_const, i)
            return fresh
        return lax.fori_loop(0, K, body, rays0)

    def env_chain(wd, rays):
        def body(i, acc):
            e = environment_color(wd.envs, wd.env_id,
                                  rays.rd + 1e-30 * acc[:, :3],
                                  gradient_h=wd.env_gradient_h)
            return acc.at[:, :3].set(e)
        return lax.fori_loop(0, K, body, jnp.zeros((pool, 3)))

    def acc_chain_f32(acc):
        def body(i, acc):
            kk = k0 + (i % 2).astype(jnp.uint32)
            k_g = kk.reshape(groups, spp)
            c_g = contrib0.reshape(groups, spp, 3)
            onehot = (k_g[:, :, None] == karange).astype(jnp.float32)
            return acc + lax.dot_general(
                onehot, c_g, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST)
        return lax.fori_loop(0, K, body, acc)

    timed("hit_legacy", hit_chain, wd, rays0)
    timed("scatter_legacy", scat_chain, wd, rays0)
    timed("camera regen", regen_chain, 0)
    timed("env tap", env_chain, wd, rays0)
    timed("acc onehot f32 HIGHEST", acc_chain_f32, acc0)


if __name__ == "__main__":
    main()
