"""Shared plumbing for the staged tutorial scripts.

Each stage module mirrors one reference stage
(/root/reference/taichi_pathtracer/<stage>/__main__.py): same scene, camera,
resolution and spp defaults, same output filename under ``outputs/``.
Run as ``python -m learn_path_tracing_tpu.stages.s06_diffuse [--spp N] ...``.
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp

from ..camera.camera import CameraParams, generate_rays
from ..core import color, image
from ..integrator.persistent import render_persistent
from ..integrator.wavefront import sky_background
from ..scene import world as world_mod


def parse_args(default_res, default_spp=None, description=""):
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--width", type=int, default=default_res[0])
    p.add_argument("--height", type=int, default=default_res[1])
    if default_spp is not None:
        p.add_argument("--spp", type=int, default=default_spp)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--limit", type=int, default=32, help="bounce limit")
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. cpu)")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    return args


@functools.partial(jax.jit, static_argnames=("resolution", "camera_model"))
def render_normal_shaded(world_data, cam: CameraParams, resolution,
                         camera_model: str = "center"):
    """Primary-ray visualization used by stages 3-5: hit → 0.5*(normal+1),
    miss → sky gradient (3_adding_a_sphere/__main__.py:27-40)."""
    rays = generate_rays(cam, resolution, 0, 0, model=camera_model)
    hits = world_mod.hit(world_data, rays)
    col = jnp.where(
        hits.hit[:, None], 0.5 * (hits.normal + 1.0), sky_background(rays.rd)
    )
    w, h = resolution
    return col.reshape(w, h, 3)


@functools.partial(jax.jit, static_argnames=("resolution", "spp", "camera_model"))
def render_normal_shaded_aa(world_data, cam: CameraParams, resolution, spp: int,
                            camera_model: str = "thinlens"):
    """Stage 5: jittered primary rays accumulated over spp."""

    def body(s, acc):
        rays = generate_rays(cam, resolution, 0, s, model=camera_model)
        hits = world_mod.hit(world_data, rays)
        col = jnp.where(
            hits.hit[:, None], 0.5 * (hits.normal + 1.0), sky_background(rays.rd)
        )
        return acc + col

    w, h = resolution
    acc = jax.lax.fori_loop(0, spp, body, jnp.zeros((w * h, 3), jnp.float32))
    return (acc / spp).reshape(w, h, 3)


def run_path_traced(world, camera, args, out_name, bsdf="modern",
                    camera_model="thinlens", seed=0, post=True):
    """Timed full render + post-process + PNG write (the render() pattern of
    10_final/__main__.py:99-118)."""
    res = (args.width, args.height)
    wd = world.device()
    cp = camera.params()

    start = time.time()
    img, segs = render_persistent(wd, cp, res, spp=args.spp, limit=args.limit,
                                  seed=seed, bsdf=bsdf,
                                  camera_model=camera_model)
    if post:
        # keep post-processing inside jit — eager op dispatch is expensive
        img = jax.jit(color.post_process)(img)
    img = jax.block_until_ready(img)
    elapsed = time.time() - start
    mrays = float(segs) / max(elapsed, 1e-9) / 1e6
    print(f"Time elapsed: {elapsed:.2f}s  ({float(segs):.3e} ray segments, "
          f"{mrays:.1f} Mrays/s)")

    out = args.out or f"outputs/{out_name}"
    image.write_png(img, out)
    print(f"wrote {out}")
    return img
