"""Cohort integrator: dense primary mega-pass + compacted secondary cascade.

Motivation (BASELINE.md round-3): on the reference's mesh workloads most
path segments are PRIMARY rays — at 640x360 on Yoimiya the mean path length
is ~1.4 segments, so ~85% of all traversal work is camera rays, which the
persistent integrator (integrator/persistent.py) nevertheless routes
through the full wavefront pass body: treelet coherence sort, one-hot
matmul accumulation, work-item regen. This integrator splits the render by
bounce cohort instead, the way the workload is actually shaped:

- **phase A (primaries)**: all ``n * chunk_spp`` camera rays of an spp-slab
  are traced in ONE dense pass in pixel-major lane order. Escape radiance
  accumulates with a reshape-sum over the sample axis — no one-hot matmul,
  no scatter — occupancy is 100% by construction, and the BVH packet kernel
  sees maximally coherent scanline-ordered rays (which traverse ~2.5x
  faster than a sorted incoherent mix, scene/legacy_world.py sort note).
- **phase B (secondaries)**: the ~hit-fraction of lanes whose primary ray
  scattered are sort-compacted once and walked by a narrowing cascade (the
  persistent drain's shape), with per-lane radiance CARRIED through the
  compaction sorts and deposited by ONE scatter per cascade level instead
  of one scatter (or one-hot matmul) per pass. A lane deposits exactly
  once: when a level transition drops it, or in the final flush.

Because there is no path regeneration, every live lane in phase B is at the
same bounce index — the bounce counter is a loop SCALAR, not a per-lane
vector, and each lane traces exactly one path.

Per-sample radiance is bit-identical to integrator.persistent /
integrator.wavefront: the counter RNG streams are keyed on absolute
(pixel, sample, bounce) (camera rays draw STREAM_CAMERA at bounce 0, the
k-th scatter draws STREAM_BSDF at bounce k), so every path consumes exactly
the same uniforms. Only the per-pixel f32 summation order differs (~1 ulp,
the integrator family's documented freedom); traced-segment counts match
exactly (tests/test_cohort.py).

Reference semantics covered: the wavefront propagate/scatter split of
15_module.py:980-1036 with its 32-bounce budget (:1031) — phase A is the
``camera.get_rays`` + first ``propagate_once`` pair, phase B the remaining
bounce passes over the compacted live set (the sparse-SNode compaction of
:1032-1034, realized as sort-compaction).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..bsdf.bsdf import SCATTERERS
from ..camera.camera import CameraParams, generate_rays_for_pixels
from ..core import rng
from ..core.types import Rays
from .wavefront import _scene_fns


def _r256(v):
    return -(-v // 256) * 256


@partial(jax.jit, static_argnames=("resolution", "spp", "limit", "bsdf",
                                   "camera_model", "scene", "hit_backend",
                                   "chunk_spp", "sec_ratio", "sec_start_div",
                                   "primary_sort", "defer_scatter", "stats"))
def render_cohort(world_data, cam: CameraParams, resolution, spp: int,
                  limit: int = 32, seed=0, bsdf: str = "legacy",
                  camera_model: str = "jitter", scene: str = "legacy",
                  hit_backend: str = "auto", chunk_spp: int = 0,
                  sec_ratio: int = 4, sec_start_div: int = 0,
                  primary_sort: bool | None = None,
                  defer_scatter: bool = False,
                  stats: bool = False):
    """Returns (image f32[W,H,3], segments f32) — same sample values as
    persistent/wavefront render; per-pixel sum order differs (~1 ulp).

    ``chunk_spp``: samples per dense primary slab (0 = auto: largest
    power-of-two divisor of spp keeping the slab under ~2M lanes).
    ``sec_ratio``: cascade narrowing ratio for the secondary phase.
    ``sec_start_div``: first cascade level = L0 // sec_start_div (0 = use
    sec_ratio); set it near 1/hit-fraction so the first level hugs the
    real survivor count.
    ``primary_sort``: coherence-sort override for the PRIMARY pass only
    (legacy scenes; None = the hit path's default). Camera rays are already
    scanline-coherent, so the sort usually costs more than it saves there.
    ``defer_scatter``: run the bounce-0 BSDF scatter AFTER the first
    compaction (at first-level width instead of full slab width) by
    carrying the scatter's hit inputs through the compaction sort. This
    removes the full-width pre-cascade loop, so a slab whose survivor
    count exceeds the first level CANNOT be rendered — that case poisons
    the image with NaNs (loud, never silent) instead of dropping paths;
    use defer_scatter=False (default, always correct) for close-up scenes
    with hit fractions above ~1/sec_start_div. CONTRACT: the Hits rebuilt
    after the sort zero t/uv/obj — safe for the three current SCATTERERS,
    which read only point/normal/material (bsdf/bsdf.py); a BSDF reading
    uv or obj would shade wrong here and must extend the sort payload.
    (integrator/hybrid.py supersedes this path: it regenerates primaries
    from (pixel, sample) instead of carrying hit state through the sort.)
    """
    w, h = resolution
    n = w * h
    if chunk_spp <= 0:
        chunk_spp = 1
        while spp % (chunk_spp * 2) == 0 and n * (chunk_spp * 2) <= (1 << 21):
            chunk_spp *= 2
    if spp % chunk_spp != 0:
        raise ValueError(f"chunk_spp={chunk_spp} must divide spp={spp}")
    if n * spp >= (1 << 32):
        raise ValueError("n*spp must fit u32 (work-item id packing)")
    n_chunks = spp // chunk_spp
    L0 = n * chunk_spp
    scatter = SCATTERERS[bsdf]
    hit_fn, background_fn = _scene_fns(scene)
    if scene == "legacy" and primary_sort is not None:
        from ..scene.legacy_world import hit_legacy

        def hit_primary(wd, r, hb):
            return hit_legacy(wd, r, sort_rays=primary_sort)
    else:
        hit_primary = hit_fn

    # Static cascade widths for phase B. The first level sits at
    # L0/sec_start_div (default sec_ratio): with typical mesh hit fractions
    # below 1/sec_start_div the full-width secondary loop runs ZERO passes
    # and the first compaction happens immediately after phase A (when rad
    # is still all-zero, so no deposit is needed there).
    if sec_start_div <= 0:
        sec_start_div = sec_ratio
    levels = []
    lw = _r256(L0 // sec_start_div)
    while 256 <= lw < (levels[-1] if levels else L0):
        levels.append(lw)
        lw = _r256(lw // sec_ratio)
    if defer_scatter and not levels:
        raise ValueError("defer_scatter needs at least one cascade level "
                         f"(slab {L0} too small for sec_start_div="
                         f"{sec_start_div})")

    def step_b(rays, rad, pixel, sample, bounce):
        """One secondary bounce pass at the current width."""
        hits = hit_fn(world_data, rays, hit_backend)
        live = jnp.sum(rays.alive.astype(jnp.float32))
        escaped = rays.alive & ~hits.hit
        rad = rad + jnp.where(
            escaped[:, None],
            background_fn(world_data, rays.rd, escaped) * rays.throughput,
            0.0)
        base = rng.base(rng.stream(seed, sample, bounce, rng.STREAM_BSDF),
                        pixel)
        scattered = scatter(rays, hits, base)
        survived = rays.alive & hits.hit & (bounce + 1 < jnp.uint32(limit))
        rays = Rays(
            ro=jnp.where(survived[:, None], scattered.ro, rays.ro),
            rd=jnp.where(survived[:, None], scattered.rd, rays.rd),
            throughput=jnp.where(survived[:, None], scattered.throughput,
                                 rays.throughput),
            alive=survived)
        live_after = jnp.sum(survived.astype(jnp.float32))
        return rays, rad, live, live_after

    def compact(rays, rad, pixel, sample, width):
        """Sort alive lanes to the front; keep ``width``; return the
        dropped suffix's (pixel, rad) for deposit. Any permutation is
        radiance-exact: every lane carries its own path state. (pixel,
        sample) ride the sort packed as one u32 work-item id
        (pixel * spp + sample — exact while n*spp fits u32, checked at
        trace time), one sort operand instead of two."""
        wid = pixel * jnp.uint32(spp) + sample
        key = (~rays.alive).astype(jnp.uint32)
        (_, a, ro0, ro1, ro2, rd0, rd1, rd2, th0, th1, th2,
         ra0, ra1, ra2, wid_s) = jax.lax.sort(
            (key, rays.alive, rays.ro[:, 0], rays.ro[:, 1], rays.ro[:, 2],
             rays.rd[:, 0], rays.rd[:, 1], rays.rd[:, 2],
             rays.throughput[:, 0], rays.throughput[:, 1],
             rays.throughput[:, 2], rad[:, 0], rad[:, 1], rad[:, 2],
             wid), num_keys=1)
        rays = Rays(ro=jnp.stack([ro0[:width], ro1[:width], ro2[:width]], -1),
                    rd=jnp.stack([rd0[:width], rd1[:width], rd2[:width]], -1),
                    throughput=jnp.stack(
                        [th0[:width], th1[:width], th2[:width]], -1),
                    alive=a[:width])
        rad_k = jnp.stack([ra0[:width], ra1[:width], ra2[:width]], -1)
        rad_d = jnp.stack([ra0[width:], ra1[width:], ra2[width:]], -1)
        return (rays, rad_k, wid_s[:width] // jnp.uint32(spp),
                wid_s[:width] % jnp.uint32(spp),
                wid_s[width:] // jnp.uint32(spp), rad_d)

    def chunk_body(ci, carry):
        acc, segments, passes_b = carry
        sample_base = jnp.uint32(ci) * jnp.uint32(chunk_spp)
        lanes = jnp.arange(L0, dtype=jnp.uint32)
        pixel = lanes // jnp.uint32(chunk_spp)
        sample = sample_base + lanes % jnp.uint32(chunk_spp)

        # ---- phase A: dense primaries, pixel-major ----
        rays = generate_rays_for_pixels(cam, resolution, pixel, seed, sample,
                                        model=camera_model)
        hits = hit_primary(world_data, rays, hit_backend)
        segments = segments + jnp.float32(L0)
        escaped = ~hits.hit
        contrib = jnp.where(
            escaped[:, None],
            background_fn(world_data, rays.rd, escaped) * rays.throughput,
            0.0)
        acc = acc + contrib.reshape(n, chunk_spp, 3).sum(axis=1)

        survived = hits.hit & (1 < limit)
        live = jnp.sum(survived.astype(jnp.float32))
        bounce0 = jnp.uint32(1)

        def run_level(state, next_width):
            def cond(s):
                return s[-1] > jnp.float32(next_width)

            def body(s):
                rays, rad, pixel, sample, bounce, acc, segs, p, _ = s
                rays, rad, live_in, live_out = step_b(rays, rad, pixel,
                                                      sample, bounce)
                return (rays, rad, pixel, sample, bounce + 1, acc,
                        segs + live_in, p + 1.0, live_out)

            return jax.lax.while_loop(cond, body, state)

        if defer_scatter:
            # Bounce-0 scatter AFTER the first compaction: carry the
            # scatter's inputs (rd/throughput + hit point/normal/material)
            # through the sort and shade only the first-level prefix. If
            # live > levels[0] this formulation cannot proceed (there is no
            # scattered full-width pool to fall back to) — poison the image
            # with NaNs so the failure is loud, never a silent path drop.
            from ..core.types import Hits, Materials

            lvl0 = levels[0]
            mat = hits.material
            wid = pixel * jnp.uint32(spp) + sample
            key = (~survived).astype(jnp.uint32)
            (_, a, rd0, rd1, rd2, th0, th1, th2, pt0, pt1, pt2,
             nm0, nm1, nm2, al0, al1, al2, rgh, met, ior_, tra, ab,
             wid_s) = jax.lax.sort(
                (key, survived,
                 rays.rd[:, 0], rays.rd[:, 1], rays.rd[:, 2],
                 rays.throughput[:, 0], rays.throughput[:, 1],
                 rays.throughput[:, 2],
                 hits.point[:, 0], hits.point[:, 1], hits.point[:, 2],
                 hits.normal[:, 0], hits.normal[:, 1], hits.normal[:, 2],
                 mat.albedo[:, 0], mat.albedo[:, 1], mat.albedo[:, 2],
                 mat.roughness, mat.metallic, mat.ior, mat.transparency,
                 mat.absorptivity, wid), num_keys=1)
            alive_p = a[:lvl0]
            pix_p = wid_s[:lvl0] // jnp.uint32(spp)
            smp_p = wid_s[:lvl0] % jnp.uint32(spp)
            rays_p = Rays(
                ro=jnp.zeros((lvl0, 3), jnp.float32),
                rd=jnp.stack([rd0[:lvl0], rd1[:lvl0], rd2[:lvl0]], -1),
                throughput=jnp.stack(
                    [th0[:lvl0], th1[:lvl0], th2[:lvl0]], -1),
                alive=alive_p)
            hits_p = Hits(
                t=jnp.zeros((lvl0,), jnp.float32),
                point=jnp.stack([pt0[:lvl0], pt1[:lvl0], pt2[:lvl0]], -1),
                normal=jnp.stack([nm0[:lvl0], nm1[:lvl0], nm2[:lvl0]], -1),
                uv=jnp.zeros((lvl0, 2), jnp.float32),
                obj=jnp.zeros((lvl0,), jnp.int32),
                hit=alive_p,
                material=Materials(
                    albedo=jnp.stack([al0[:lvl0], al1[:lvl0], al2[:lvl0]],
                                     -1),
                    roughness=rgh[:lvl0], metallic=met[:lvl0],
                    ior=ior_[:lvl0], transparency=tra[:lvl0],
                    absorptivity=ab[:lvl0]))
            base = rng.base(rng.stream(seed, smp_p, 0, rng.STREAM_BSDF),
                            pix_p)
            sc = scatter(rays_p, hits_p, base)
            # sanitize dead lanes: sorted-in garbage must not feed NaN/inf
            # origins into the traversal kernels
            unit_z = jnp.broadcast_to(
                jnp.array([0.0, 0.0, 1.0], jnp.float32), (lvl0, 3))
            m = alive_p[:, None]
            rays_b = Rays(ro=jnp.where(m, sc.ro, 0.0),
                          rd=jnp.where(m, sc.rd, unit_z),
                          throughput=jnp.where(m, sc.throughput, 0.0),
                          alive=alive_p)
            acc = acc + jnp.where(live > jnp.float32(lvl0), jnp.nan, 0.0)
            state = (rays_b, jnp.zeros((lvl0, 3), jnp.float32), pix_p,
                     smp_p, bounce0, acc, segments, passes_b, live)
            state = run_level(
                state, levels[1] if len(levels) > 1 else 0)
            tail_levels = list(enumerate(levels))[1:]
        else:
            base = rng.base(rng.stream(seed, sample, 0, rng.STREAM_BSDF),
                            pixel)
            scattered = scatter(rays, hits, base)
            # Scatter output is adopted WHOLESALE — miss lanes included. It
            # is finite there only because every hit path clamps miss t to 0
            # before computing hits.point (legacy_world._assemble_hits,
            # world.hit's t_safe), so the BSDF sees point=ro / default
            # normal on misses. Mask dead lanes to inert values so a future
            # hit backend returning inf/NaN on miss cannot feed NaN origins
            # into the next full-width traversal pass.
            m = survived[:, None]
            unit_z0 = jnp.broadcast_to(
                jnp.array([0.0, 0.0, 1.0], jnp.float32), (L0, 3))
            rays = Rays(ro=jnp.where(m, scattered.ro, 0.0),
                        rd=jnp.where(m, scattered.rd, unit_z0),
                        throughput=jnp.where(m, scattered.throughput, 0.0),
                        alive=survived)
            rad = jnp.zeros((L0, 3), jnp.float32)

            state = (rays, rad, pixel, sample, bounce0, acc, segments,
                     passes_b, live)
            state = run_level(state, levels[0] if levels else 0)
            tail_levels = list(enumerate(levels))

        fw_passes0 = passes_b
        for li, lw in tail_levels:
            rays, rad, pixel_c, sample_c, bounce, acc, segments, passes_b, \
                live = state
            rays, rad, pixel_c, sample_c, pix_d, rad_d = compact(
                rays, rad, pixel_c, sample_c, lw)
            if li == 0:
                # In the common case (hit fraction < 1/sec_start_div) ZERO
                # full-width secondary passes ran before this compaction, so
                # the dropped suffix's carried radiance is identically zero —
                # skip its deposit (an L0-wide scatter-add, the single most
                # expensive op in the naive formulation) unless a full-width
                # pass actually accumulated something.
                acc = jax.lax.cond(
                    passes_b > fw_passes0,
                    lambda a: a.at[pix_d].add(rad_d),
                    lambda a: a, acc)
            else:
                acc = acc.at[pix_d].add(rad_d)
            state = (rays, rad, pixel_c, sample_c, bounce, acc, segments,
                     passes_b, live)
            state = run_level(
                state, levels[li + 1] if li + 1 < len(levels) else 0)
        rays, rad, pixel_c, sample_c, bounce, acc, segments, passes_b, live \
            = state
        acc = acc.at[pixel_c].add(rad)   # final flush (all lanes dead)
        return acc, segments, passes_b

    acc0 = jnp.zeros((n, 3), jnp.float32)
    acc, segments, passes_b = jax.lax.fori_loop(
        0, n_chunks, chunk_body, (acc0, jnp.float32(0.0), jnp.float32(0.0)))
    img = (acc / spp).reshape(w, h, 3)
    if stats:
        return img, segments, {"chunk_spp": chunk_spp, "n_chunks": n_chunks,
                               "levels": tuple(levels),
                               "passes_b": passes_b}
    return img, segments
