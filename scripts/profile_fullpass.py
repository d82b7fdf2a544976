"""Time the REAL persistent full-width pass body (yoimiya, pool 57600),
component by component, including the one-hot accumulate the older pass rig
left out. profile_mesh_passes implies ~3.5 ms per in-loop pass while the
old rig measured 2.19 — this attributes the gap.

Usage:  python scripts/profile_fullpass.py
"""

import os
import sys

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
    w, h = res
    n = w * h
    spp = 64
    pool = 57600
    groups = pool // spp
    items_per = n * spp // pool  # 256
    wd = load_world()
    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))
    cp = cam.params()

    lanes = jnp.arange(pool, dtype=jnp.uint32)
    sample_const = lanes % jnp.uint32(spp)
    group_const = lanes // jnp.uint32(spp)

    # steady-state-ish pool: item k=3, one bounce applied to lanes that hit
    k = jnp.full((pool,), 3, jnp.uint32)
    pix = group_const + k * jnp.uint32(groups)

    @jax.jit
    def gen(pix, samp, seed):
        return generate_rays_for_pixels(cp, res, pix, seed, samp,
                                        model="jitter")

    @jax.jit
    def mix(wd, rays):
        hits = hit_legacy(wd, rays)
        base = rng.base(rng.stream(0, sample_const, 0, rng.STREAM_BSDF), pix)
        sc = scatter_legacy(rays, hits, base)
        return tree_where(hits.hit, sc, rays)

    rays = mix(wd, gen(pix, sample_const, 0))
    rays = type(rays)(ro=rays.ro, rd=rays.rd, throughput=rays.throughput,
                      alive=jnp.ones((pool,), bool))

    hit_j = jax.jit(hit_legacy)
    hits = hit_j(wd, rays)

    @jax.jit
    def scat(rays, hits):
        base = rng.base(rng.stream(0, sample_const, 1, rng.STREAM_BSDF), pix)
        return scatter_legacy(rays, hits, base)

    acc0 = jnp.zeros((groups, items_per, 3), jnp.float32)
    contrib = jnp.abs(rays.throughput) * 0.25
    karange = jnp.arange(items_per, dtype=jnp.uint32)

    @jax.jit
    def acc_onehot(acc, k, contrib):
        k_g = k.reshape(groups, spp)
        c_g = contrib.reshape(groups, spp, 3)
        onehot = (k_g[:, :, None] == karange).astype(jnp.float32)
        return acc + jax.lax.dot_general(
            onehot, c_g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    @jax.jit
    def acc_onehot_default(acc, k, contrib):
        k_g = k.reshape(groups, spp)
        c_g = contrib.reshape(groups, spp, 3)
        onehot = (k_g[:, :, None] == karange).astype(jnp.float32)
        return acc + jax.lax.dot_general(
            onehot, c_g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    @jax.jit
    def acc_split(acc, k, contrib):
        # exact f32 via 2 bf16 matmuls: onehot is exactly representable in
        # bf16; split contrib into hi + lo bf16 parts
        k_g = k.reshape(groups, spp)
        c_g = contrib.reshape(groups, spp, 3)
        onehot = (k_g[:, :, None] == karange).astype(jnp.bfloat16)
        hi = c_g.astype(jnp.bfloat16)
        lo = (c_g - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((0,), (0,)))
        out = (jax.lax.dot_general(onehot, hi, dn,
                                   preferred_element_type=jnp.float32)
               + jax.lax.dot_general(onehot, lo, dn,
                                     preferred_element_type=jnp.float32))
        return acc + out

    @jax.jit
    def acc_scatter(acc_flat, k, contrib):
        idx = group_const * jnp.uint32(items_per) + k
        return acc_flat.at[idx].add(contrib)

    @jax.jit
    def full_body(wd, rays, k, acc):
        """the real step() + accumulate composition."""
        hits = hit_legacy(wd, rays, )
        escaped = rays.alive & ~hits.hit
        contrib = jnp.where(
            escaped[:, None],
            environment_color(wd.envs, wd.env_id, rays.rd,
                              gradient_h=wd.env_gradient_h)
            * rays.throughput, 0.0)
        base = rng.base(rng.stream(0, sample_const, 1, rng.STREAM_BSDF), pix)
        sc = scatter_legacy(rays, hits, base)
        survived = rays.alive & hits.hit
        ended = rays.alive & ~survived
        next_k = k + ended.astype(jnp.uint32)
        npix = group_const + next_k * jnp.uint32(groups)
        fresh = gen(jnp.minimum(npix, jnp.uint32(n - 1)), sample_const, 0)
        out = tree_where(survived, sc, tree_where(ended, fresh, rays))
        k_g = k.reshape(groups, spp)
        c_g = contrib.reshape(groups, spp, 3)
        onehot = (k_g[:, :, None] == karange).astype(jnp.float32)
        acc = acc + jax.lax.dot_general(
            onehot, c_g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        return out, next_k, acc

    acc_flat0 = jnp.zeros((groups * items_per, 3), jnp.float32)
    parts = [
        ("hit_legacy", hit_j, (wd, rays)),
        ("scatter_legacy", scat, (rays, hits)),
        ("camera regen", gen, (pix, sample_const, 0)),
        ("acc onehot HIGHEST", acc_onehot, (acc0, k, contrib)),
        ("acc onehot default", acc_onehot_default, (acc0, k, contrib)),
        ("acc bf16-split", acc_split, (acc0, k, contrib)),
        ("acc scatter", acc_scatter, (acc_flat0, k, contrib)),
        ("FULL BODY", full_body, (wd, rays, k, acc0)),
    ]
    for name, f, fa in parts:
        dt, _ = time_fn(f, *fa, iters=10)
        print(f"{name:20s} {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
