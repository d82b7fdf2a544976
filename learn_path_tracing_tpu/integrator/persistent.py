"""Persistent-wavefront integrator with path regeneration.

The reference's wavefront relies on Taichi's sparse bitmasked pools to skip
dead rays (15_module.py:56-57,1032-1034). On TPU, masked lanes still burn
VPU cycles, so a fixed bounce loop wastes ~(limit / avg_bounces)x of the
intersection work. This integrator keeps every lane busy instead:

- the render is a list of ``N*spp`` work items; item ``w`` is
  (pixel = w // spp, sample = w % spp); lane ``i`` processes items
  ``i, i+N, i+2N, ...`` — successive items on a lane land on *different*
  pixels, so per-lane total path length concentrates around the mean and
  the straggler tail stays small (unlike binding a lane to one pixel,
  where a single glassy pixel serializes spp * max_bounce passes);
- when a lane's path ends (escape or bounce budget), it immediately starts
  its next work item's primary ray;
- escaped radiance accumulation exploits the work-item algebra: with
  ``witem = lane + k*n`` and ``spp | n``, the target pixel decomposes as
  ``pixel = group + k*(n/spp)`` where ``group = lane // spp`` is *static*
  per lane and only ``k`` (the per-lane item counter, < spp) is dynamic.
  The per-pixel scatter-add (measured 42 ms/pass in round 1 — XLA
  serializes TPU scatters) therefore becomes a batched one-hot matmul
  over the tiny spp axis into an ``[n/spp, spp, 3]`` accumulator, plus a
  single transpose at the end. When ``spp`` does not divide ``n`` the
  scatter fallback is used.

RNG streams are counter-based on absolute (pixel, sample, bounce), so this
computes exactly the same per-sample radiance values as
integrator.wavefront.render — only the per-pixel summation order differs
(f32 reassociation ~1 ulp). Traced-segment counts match exactly
(tests/test_persistent.py).
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
    """Returns (image f32[W,H,3], segments f32). Same sample values as
    wavefront.render; per-pixel sum order differs (~1 ulp)."""
    w, h = resolution
    n = w * h
    total = n * spp
    lanes = jnp.arange(n, dtype=jnp.uint32)
    scatter = SCATTERERS[bsdf]
    hit_fn, background_fn = _scene_fns(scene)
    matmul_acc = (n % spp == 0)
    groups = n // spp if matmul_acc else 0

    def item_of(k):
        """k-th work item of each lane → (valid, pixel u32[N], sample u32[N])."""
        witem = lanes + k * jnp.uint32(n)
        valid = witem < total
        pixel = jnp.minimum(witem // jnp.uint32(spp), jnp.uint32(n - 1))
        sample = witem % jnp.uint32(spp)
        return valid, pixel, sample

    def primary(pixel, sample):
        return generate_rays_for_pixels(cam, resolution, pixel, seed, sample,
                                        model=camera_model)

    valid0, pix0, samp0 = item_of(jnp.uint32(0))
    rays0 = primary(pix0, samp0)
    rays0 = type(rays0)(ro=rays0.ro, rd=rays0.rd, throughput=rays0.throughput,
                        alive=valid0)

    def cond(state):
        return jnp.any(state[0].alive)

    def accumulate(acc, k, pixel, contrib):
        """Add per-lane contributions to the accumulator.

        matmul path: ``acc`` is ``f32[groups, spp, 3]`` indexed by
        (lane//spp, k); one-hot over k rides the MXU as a batched
        ``[spp,spp]x[spp,3]`` contraction — no scatter.
        """
        if not matmul_acc:
            return acc.at[pixel].add(contrib)
        k_g = k.reshape(groups, spp)
        c_g = contrib.reshape(groups, spp, 3)
        onehot = (k_g[:, :, None]
                  == jnp.arange(spp, dtype=jnp.uint32)).astype(jnp.float32)
        return acc + jax.lax.dot_general(
            onehot, c_g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    def body(state):
        rays, k, pixel, sample, bounce, acc, segments = state
        hits = hit_fn(world_data, rays, hit_backend)
        segments = segments + jnp.sum(rays.alive.astype(jnp.float32))

        escaped = rays.alive & ~hits.hit
        contrib = jnp.where(
            escaped[:, None],
            background_fn(world_data, rays.rd) * rays.throughput, 0.0)
        acc = accumulate(acc, k, pixel, contrib)

        base = rng.base(rng.stream(seed, sample, bounce, rng.STREAM_BSDF),
                        pixel)
        scattered = scatter(rays, hits, base)
        survived = rays.alive & hits.hit & (bounce + 1 < limit)

        # lanes whose path ended advance to their next work item
        ended = rays.alive & ~survived
        next_k = k + ended.astype(jnp.uint32)
        nvalid, npix, nsamp = item_of(next_k)
        need_regen = ended & nvalid
        fresh = primary(npix, nsamp)

        rays = tree_where(survived, scattered,
                          tree_where(need_regen, fresh, rays))
        alive = survived | need_regen
        rays = type(rays)(ro=rays.ro, rd=rays.rd, throughput=rays.throughput,
                          alive=alive)
        bounce = jnp.where(survived, bounce + 1, jnp.uint32(0))
        pixel = jnp.where(survived, pixel, npix)
        sample = jnp.where(survived, sample, nsamp)
        return rays, next_k, pixel, sample, bounce, acc, segments

    acc0 = (jnp.zeros((groups, spp, 3), jnp.float32) if matmul_acc
            else jnp.zeros((n, 3), jnp.float32))
    state0 = (
        rays0,
        jnp.zeros((n,), jnp.uint32),
        pix0,
        samp0,
        jnp.zeros((n,), jnp.uint32),
        acc0,
        jnp.float32(0.0),
    )
    _, _, _, _, _, acc, segments = jax.lax.while_loop(cond, body, state0)
    if matmul_acc:
        # acc[g, k] holds pixel g + k*groups → transpose to pixel-major.
        acc = acc.transpose(1, 0, 2).reshape(n, 3)
    return (acc / spp).reshape(w, h, 3), segments
