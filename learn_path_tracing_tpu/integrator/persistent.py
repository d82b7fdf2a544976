"""Persistent-wavefront integrator with path regeneration.

The reference's wavefront relies on Taichi's sparse bitmasked pools to skip
dead rays (15_module.py:56-57,1032-1034). On TPU, masked lanes still burn
VPU cycles, so a fixed bounce loop wastes ~(limit / avg_bounces)x of the
intersection work. This integrator keeps every lane busy instead:

- lane i permanently owns pixel i (no atomics, no scatter);
- when a lane's path ends (escape, or bounce budget exhausted), it
  immediately regenerates the *next sample's* primary ray for its pixel;
- the single while_loop runs until every lane has finished all ``spp``
  samples — occupancy stays near 100% until the final tail.

Because the RNG is counter-based on (pixel, sample, bounce) and each pixel's
samples are accumulated in ascending order by its one owning lane, the
result matches integrator.wavefront.render to 1 ulp (identical math;
XLA may contract FMAs differently between the two programs) with exactly
equal traced-segment counts — verified in tests/test_persistent.py. This is the TPU-native replacement for the
reference's bitmasked-pool compaction: instead of compacting rays toward
lanes, work is regenerated in place.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..bsdf.bsdf import SCATTERERS
from ..camera.camera import CameraParams, generate_rays_for_pixels
from ..core import rng
from ..core.pytree import tree_where
from .wavefront import _scene_fns


@partial(jax.jit, static_argnames=("resolution", "spp", "limit", "bsdf",
                                   "camera_model", "scene", "hit_backend"))
def render_persistent(world_data, cam: CameraParams, resolution, spp: int,
                      limit: int = 32, seed=0, bsdf: str = "modern",
                      camera_model: str = "thinlens", scene: str = "spheres",
                      hit_backend: str = "auto"):
    """Returns (image f32[W,H,3], segments f32) — numerically identical to
    wavefront.render with the same arguments (same counters, same order)."""
    w, h = resolution
    n = w * h
    pix = jnp.arange(n, dtype=jnp.uint32)
    scatter = SCATTERERS[bsdf]
    hit_fn, background_fn = _scene_fns(scene)

    rays0 = generate_rays_for_pixels(cam, resolution, pix, seed,
                                     jnp.zeros((n,), jnp.uint32),
                                     model=camera_model)

    def cond(state):
        rays = state[0]
        return jnp.any(rays.alive)

    def body(state):
        rays, sample_idx, bounce, acc, segments = state
        hits = hit_fn(world_data, rays, hit_backend)
        segments = segments + jnp.sum(rays.alive.astype(jnp.float32))

        escaped = rays.alive & ~hits.hit
        acc = acc + jnp.where(
            escaped[:, None],
            background_fn(world_data, rays.rd) * rays.throughput, 0.0)

        base = rng.base(rng.stream(seed, sample_idx, bounce, rng.STREAM_BSDF),
                        pix)
        scattered = scatter(rays, hits, base)
        survived = rays.alive & hits.hit & (bounce + 1 < limit)

        # paths that ended this pass regenerate their pixel's next sample
        ended = rays.alive & ~survived
        next_sample = sample_idx + ended.astype(jnp.uint32)
        need_regen = ended & (next_sample < spp)
        fresh = generate_rays_for_pixels(cam, resolution, pix, seed,
                                         next_sample, model=camera_model)

        rays = tree_where(survived, scattered, tree_where(need_regen, fresh, rays))
        alive = survived | need_regen
        rays = type(rays)(ro=rays.ro, rd=rays.rd, throughput=rays.throughput,
                          alive=alive)
        bounce = jnp.where(survived, bounce + 1, jnp.uint32(0))
        return rays, next_sample, bounce, acc, segments

    state0 = (
        rays0,
        jnp.zeros((n,), jnp.uint32),
        jnp.zeros((n,), jnp.uint32),
        jnp.zeros((n, 3), jnp.float32),
        jnp.float32(0.0),
    )
    _, _, _, acc, segments = jax.lax.while_loop(cond, body, state0)
    return (acc / spp).reshape(w, h, 3), segments
