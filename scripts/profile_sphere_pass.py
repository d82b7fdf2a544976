"""Component costs of the HEADLINE (10_final) persistent pass at the auto
pool (n/16 = 57.6k lanes), measured as chained in-loop fori chains so
tunnel dispatch cancels. Attributes the honest-timer headline number
(97.6 Mrays/s, 2026-08-19) to its parts — in particular whether the
one-hot accumulate's [groups, spp, items] operand is materialized through
HBM (236 MB/pass at items=1024 would be ~0.58 ms, i.e. the whole budget).

Usage: python scripts/profile_sphere_pass.py [--k 64]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import worldcache  # noqa: F401  (compile cache side effect)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=64)
    p.add_argument("--pool", type=int, default=57600)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from learn_path_tracing_tpu.bsdf.bsdf import scatter_modern
    from learn_path_tracing_tpu.camera.camera import generate_rays_for_pixels
    from learn_path_tracing_tpu.core import rng
    from learn_path_tracing_tpu.core.pytree import tree_where
    from learn_path_tracing_tpu.models import random_scene, stage10_camera
    from learn_path_tracing_tpu.integrator.wavefront import _scene_fns

    res = (1280, 720)
    n = res[0] * res[1]
    pool, spp = args.pool, 64
    groups = pool // spp
    items = -(-(n * spp) // pool)
    K = args.k
    wd = random_scene(seed=20230328).device()
    cp = stage10_camera(res).params()
    hit_fn, background_fn = _scene_fns("spheres")

    lanes = jnp.arange(pool, dtype=jnp.uint32)
    pix = lanes // jnp.uint32(spp) * jnp.uint32(16)  # spread over the frame
    samp = lanes % jnp.uint32(spp)
    k0 = jnp.zeros((pool,), jnp.uint32)

    rays = jax.jit(lambda s: generate_rays_for_pixels(cp, res, pix, s, samp)
                   )(0)

    def timed(name, fn, *fa):
        f = jax.jit(fn)
        out = f(*fa)
        float(sum(jnp.sum(x).astype(jnp.float32) for x in
                  jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")))
        t0 = time.time()
        out = f(*fa)
        float(sum(jnp.sum(x).astype(jnp.float32) for x in
                  jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")))
        dt = (time.time() - t0) / K
        print(f"{name:28s} {dt*1e3:7.3f} ms/pass", flush=True)

    def chain(body):
        def outer(wd_, r):
            return lax.fori_loop(0, K, functools.partial(body, wd_), r)
        return outer

    # (a) hit only
    def hit_body(wd_, i, r):
        hits = hit_fn(wd_, r, "auto")
        return type(r)(ro=r.ro + 1e-30 * hits.t[:, None], rd=r.rd,
                       throughput=r.throughput, alive=r.alive)
    timed("hit (sphere scan + attrs)",
          lambda wd_, r: lax.fori_loop(
              0, K, lambda i, rr: hit_body(wd_, i, rr), r), wd, rays)

    # (b) hit + scatter
    def hs_body(wd_, i, r):
        hits = hit_fn(wd_, r, "auto")
        base = rng.base(rng.stream(0, 0, i.astype(jnp.uint32),
                                   rng.STREAM_BSDF), pix)
        sc = scatter_modern(r, hits, base)
        return tree_where(hits.hit, sc, r)
    timed("hit + scatter_modern",
          lambda wd_, r: lax.fori_loop(
              0, K, lambda i, rr: hs_body(wd_, i, rr), r), wd, rays)

    # (c) camera regen alone (chained through ro)
    def regen_body(i, r):
        fresh = generate_rays_for_pixels(cp, res, pix, 0,
                                         samp + i.astype(jnp.uint32))
        return type(r)(ro=fresh.ro + 1e-30 * r.ro, rd=fresh.rd,
                       throughput=fresh.throughput, alive=r.alive)
    timed("camera regen",
          lambda wd_, r: lax.fori_loop(0, K, regen_body, r), wd, rays)

    # (d) one-hot accumulate alone (chained through acc)
    karr = jnp.arange(items, dtype=jnp.uint32)

    def acc_body(i, carry):
        acc, k = carry
        contrib = acc[:, 0, :] * 0.0 + 1.0            # [groups, 3]-ish dep
        c_g = jnp.broadcast_to(contrib[:, None, :], (groups, spp, 3))
        k_g = (k.reshape(groups, spp) + i.astype(jnp.uint32)) % items
        onehot = (k_g[:, :, None] == karr).astype(jnp.float32)
        acc = acc + lax.dot_general(
            onehot, c_g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)
        return acc, k
    acc0 = jnp.zeros((groups, items, 3), jnp.float32)
    timed(f"one-hot accumulate [g={groups},spp={spp},items={items}]",
          lambda wd_, c: lax.fori_loop(0, K, acc_body, c), wd, (acc0, k0))

    # (e) full body: hit + scatter + env + regen + accumulate
    def full_body(wd_, i, carry):
        r, acc, k = carry
        hits = hit_fn(wd_, r, "auto")
        escaped = r.alive & ~hits.hit
        contrib = jnp.where(escaped[:, None],
                            background_fn(wd_, r.rd, escaped) * r.throughput,
                            0.0)
        base = rng.base(rng.stream(0, 0, i.astype(jnp.uint32),
                                   rng.STREAM_BSDF), pix)
        sc = scatter_modern(r, hits, base)
        survived = r.alive & hits.hit
        fresh = generate_rays_for_pixels(cp, res, pix, 0,
                                         samp + i.astype(jnp.uint32))
        out = tree_where(survived, sc, fresh)
        k = k + (~survived).astype(jnp.uint32)
        k_g = (k.reshape(groups, spp)) % items
        c_g = contrib.reshape(groups, spp, 3)
        onehot = (k_g[:, :, None] == karr).astype(jnp.float32)
        acc = acc + lax.dot_general(
            onehot, c_g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)
        return out, acc, k
    timed("FULL pass body",
          lambda wd_, c: lax.fori_loop(
              0, K, lambda i, cc: full_body(wd_, i, cc), c),
          wd, (rays, acc0, k0))


if __name__ == "__main__":
    main()
