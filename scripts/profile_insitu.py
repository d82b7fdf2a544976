"""In-situ attribution of ONE persistent full-width pass on Yoimiya.

profile_pass_breakdown times components as separate jits (2.19 ms total at
57.6k lanes), but profile_mesh_passes shows the real integrator pays
~4.4 ms per full pass. This times the EXACT body (state -> state, same ops
as integrator/persistent._persistent_core) as one jit, then re-times with
individual components disabled, so the gap is attributed inside the real
fusion context. State-dependent chaining (async, iters>=32) matches how the
while_loop pays the cost.

Usage:  python scripts/profile_insitu.py [--lanes 57600 --spp 64]
"""

import argparse
import os
import sys
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lanes", type=int, default=57600)
    p.add_argument("--spp", type=int, default=64)
    p.add_argument("--iters", type=int, default=32)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from learn_path_tracing_tpu.bsdf.bsdf import SCATTERERS
    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.camera.camera import generate_rays_for_pixels
    from learn_path_tracing_tpu.core import rng
    from learn_path_tracing_tpu.core.pytree import tree_where
    from learn_path_tracing_tpu.integrator.wavefront import _scene_fns
    from learn_path_tracing_tpu.utils.benchlib import time_fn_async

    res = (640, 360)
    n = res[0] * res[1]
    spp = args.spp
    pool = args.lanes
    groups = pool // spp
    items_per = -(-(n * spp) // pool)
    seed = 0

    from worldcache import load_world
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

    def item_of(k):
        pixel = group_const + k * jnp.uint32(groups)
        valid = (k < jnp.uint32(items_per)) & (pixel < jnp.uint32(n))
        pixel = jnp.minimum(pixel, jnp.uint32(n - 1))
        return valid, pixel, sample_const

    def primary(pixel, sample):
        return generate_rays_for_pixels(cp, res, pixel, seed, sample)

    karange = jnp.arange(items_per, dtype=jnp.uint32)

    def accumulate(acc, k, contrib):
        k_g = k.reshape(groups, spp)
        c_g = contrib.reshape(groups, spp, 3)
        onehot = (k_g[:, :, None] == karange).astype(jnp.float32)
        return acc + jax.lax.dot_general(
            onehot, c_g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    limit = 32

    def make_body(do_hit=True, do_env=True, do_scatter=True, do_regen=True,
                  do_acc=True, cached_hits=None):
        # wd must be a jit ARG, not a closure constant: closing over it bakes
        # the atlas/BVH tables into the HLO as literals and the remote
        # compile service rejects the upload (HTTP 413).
        def body(wd, state):
            rays, k, bounce, acc, segments = state
            _, pixel, sample = item_of(k)
            if do_hit:
                hits = hit_fn(wd, rays, "auto")
            else:
                hits = cached_hits
            live = jnp.sum(rays.alive.astype(jnp.float32))

            escaped = rays.alive & ~hits.hit
            if do_env:
                contrib = jnp.where(
                    escaped[:, None],
                    background_fn(wd, rays.rd, escaped) * rays.throughput, 0.0)
            else:
                contrib = jnp.where(escaped[:, None], rays.throughput, 0.0)

            base = rng.base(rng.stream(seed, sample, bounce, rng.STREAM_BSDF),
                            pixel)
            if do_scatter:
                scattered = scatter(rays, hits, base)
            else:
                scattered = rays
            survived = rays.alive & hits.hit & (bounce + 1 < limit)

            ended = rays.alive & ~survived
            next_k = k + ended.astype(jnp.uint32)
            nvalid, npix, nsamp = item_of(next_k)
            need_regen = ended & nvalid
            if do_regen:
                fresh = primary(npix, nsamp)
            else:
                fresh = rays
            rays = tree_where(survived, scattered,
                              tree_where(need_regen, fresh, rays))
            alive = survived | need_regen
            rays = type(rays)(ro=rays.ro, rd=rays.rd,
                              throughput=rays.throughput, alive=alive)
            bounce = jnp.where(survived, bounce + 1, jnp.uint32(0))
            if do_acc:
                acc = accumulate(acc, k, contrib)
            return rays, next_k, bounce, acc, segments + live
        return jax.jit(body)

    # realistic mid-render state: run the true body a few passes
    valid0, pix0, samp0 = item_of(jnp.uint32(0))
    rays0 = primary(pix0, samp0)
    rays0 = type(rays0)(ro=rays0.ro, rd=rays0.rd,
                        throughput=rays0.throughput, alive=valid0)
    state = (rays0, jnp.zeros((pool,), jnp.uint32),
             jnp.zeros((pool,), jnp.uint32),
             jnp.zeros((groups, items_per, 3), jnp.float32),
             jnp.float32(0.0))
    full = make_body()
    for _ in range(6):
        state = full(wd, state)
    state = jax.tree.map(lambda x: x.block_until_ready(), state)
    occ = float(jnp.mean(state[0].alive))
    print(f"pool {pool} groups {groups} items_per {items_per} "
          f"occupancy after 6 passes {occ:.2f}", flush=True)

    cached_hits = jax.jit(lambda w, r: hit_fn(w, r, "auto"))(wd, state[0])
    cached_hits = jax.tree.map(lambda x: x.block_until_ready(), cached_hits)

    variants = [
        ("full", make_body()),
        ("no_acc", make_body(do_acc=False)),
        ("no_regen", make_body(do_regen=False)),
        ("no_scatter", make_body(do_scatter=False)),
        ("no_env", make_body(do_env=False)),
        ("no_hit (cached)", make_body(do_hit=False, cached_hits=cached_hits)),
    ]
    base_dt = None
    for name, f in variants:
        dt, _ = time_fn_async(f, wd, state, iters=args.iters)
        note = ""
        if name == "full":
            base_dt = dt
        elif base_dt:
            note = f"  (saves {1e3 * (base_dt - dt):+.2f} ms)"
        print(f"{name:18s} {dt * 1e3:7.2f} ms/pass{note}", flush=True)


if __name__ == "__main__":
    main()
