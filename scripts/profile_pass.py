"""Per-component timing of one persistent-integrator pass on the live chip.

Times each stage of the bounce-pass body independently (dependent-chain
jitted calls, scalar-readback completion per utils/benchlib) so round-over-
round optimization targets the measured bottleneck, not a guess.

Usage:  python scripts/profile_pass.py [--width 1280 --height 720]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from learn_path_tracing_tpu.bsdf.bsdf import scatter_modern
    from learn_path_tracing_tpu.camera.camera import generate_rays_for_pixels
    from learn_path_tracing_tpu.core import rng
    from learn_path_tracing_tpu.core.types import Rays
    from learn_path_tracing_tpu.integrator.wavefront import sky_background
    from learn_path_tracing_tpu.models import random_scene, stage10_camera
    from learn_path_tracing_tpu.scene import world as world_mod
    from learn_path_tracing_tpu.utils.benchlib import time_fn

    res = (args.width, args.height)
    n = res[0] * res[1]
    spp = 64
    wd = random_scene(seed=20230328).device()
    cp = stage10_camera(res).params()
    pix = jnp.arange(n, dtype=jnp.uint32)

    @jax.jit
    def gen(seed):
        return generate_rays_for_pixels(cp, res, pix, seed, 0)

    rays = gen(0)

    @jax.jit
    def intersect(rays):
        return world_mod.hit(wd, rays, backend="auto")

    hits = intersect(rays)

    @jax.jit
    def bsdf(rays, hits, seed):
        base = rng.base(rng.stream(seed, 0, 0, rng.STREAM_BSDF), pix)
        return scatter_modern(rays, hits, base)

    @jax.jit
    def background(rays):
        return sky_background(rays.rd) * rays.throughput

    k = (pix % spp).astype(jnp.uint32)
    contrib = jnp.ones((n, 3), jnp.float32)
    groups = n // spp
    acc0 = jnp.zeros((groups, spp, 3), jnp.float32)

    @jax.jit
    def accumulate(acc, k, contrib):
        k_g = k.reshape(groups, spp)
        c_g = contrib.reshape(groups, spp, 3)
        onehot = (k_g[:, :, None]
                  == jnp.arange(spp, dtype=jnp.uint32)).astype(jnp.float32)
        return acc + jax.lax.dot_general(
            onehot, c_g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    parts = [
        ("camera_gen", gen, (0,)),
        ("intersect", intersect, (rays,)),
        ("bsdf_scatter", bsdf, (rays, hits, 0)),
        ("background", background, (rays,)),
        ("accumulate_matmul", accumulate, (acc0, k, contrib)),
    ]
    total = 0.0
    for name, f, fargs in parts:
        dt, _ = time_fn(f, *fargs, iters=8)
        total += dt
        print(f"{name:20s} {dt * 1e3:8.2f} ms  ({n / dt / 1e6:8.1f} Mlanes/s)")
    print(f"{'sum of parts':20s} {total * 1e3:8.2f} ms")

    # end-to-end single-pass estimate: run the real integrator and divide
    from learn_path_tracing_tpu.integrator.persistent import render_persistent

    def run(seed):
        return render_persistent(wd, cp, res, spp=spp, limit=32, seed=seed,
                                 bsdf="modern", scene="spheres")

    dt, (img, segs) = time_fn(run, 0, iters=2)
    # total work items = n*spp; average path length = segs/(n*spp)
    avg_path = float(segs) / (n * spp)
    print(f"render: {dt:.3f} s   segments={float(segs):.3e}  "
          f"avg_path={avg_path:.2f}  mrays={float(segs) / dt / 1e6:.2f}")


if __name__ == "__main__":
    main()
