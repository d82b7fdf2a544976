"""Hybrid integrator: dense primary mega-passes feeding ONE shared
persistent secondary pool.

The round-3 cohort experiment (integrator/cohort.py) proved the workload
decomposition right and the amortization wrong: on the reference's mesh
scenes (legacy/PT_in_one_weekend/15_module.py:36-44) the mean path length
is ~1.4 segments, so ~71% of all traversal work is scanline-coherent camera
rays that traverse ~12x faster dense and unsorted (147 Mrays/s at 1.84M
lanes, scripts/profile_cohort.py) — but the cohort's per-CHUNK secondary
cascade re-paid full-slab fixed costs (full-width env+scatter+acc 26.3 ms,
15-operand compaction sort 20.8 ms) once per spp chunk, sinking it to 8.40
Mrays/s against the persistent integrator's 12.22. This integrator keeps
the cohort's phase A and replaces its phase B with the persistent pool's
shape, shared across ALL chunks:

- **phase A (per spp-chunk)**: all ``n * chunk_spp`` camera rays traced in
  ONE dense, unsorted, pixel-major traversal-only pass
  (scene.legacy_world.trace_legacy — no attribute gathers, no atlas taps).
  Escape radiance accumulates with a reshape-sum over the sample axis.
- **survivor extraction**: primaries are fully regenerable from
  (pixel, sample), so the compaction sort carries only
  ``(key, work_item_id, t, prim, src)`` — 5 operands instead of the
  cohort's 15-22 — and ray state + hit attributes + the bounce-0 BSDF
  scatter are all recomputed at the compacted batch width (cap lanes,
  typically L0/8) instead of slab width.
- **phase B (shared pool)**: survivor batches from every chunk merge into
  one fixed-width persistent pool of secondary rays (mixed bounce depths,
  per-lane bounce counters). The pool drains only enough to make room for
  each incoming batch ("make room" passes), so its occupancy stays high
  for the whole render instead of decaying once per chunk; after the last
  chunk a narrowing cascade (the persistent drain's shape) finishes the
  stragglers. A batch whose survivors exceed the batch width spills into
  multiple merge rounds — always correct, no overflow poisoning (the
  fallback VERDICT round-3 asked for).

Escape radiance in phase B is CARRIED per lane (``rad``) and deposited by
scatter-add only when a lane's slot is evicted (merge overwrite, cascade
narrowing, final flush) — each work item deposits at most once across the
whole render.

Per-sample radiance is bit-identical to integrator.persistent /
integrator.wavefront: the counter RNG streams are keyed on absolute
(pixel, sample, bounce) (camera rays draw STREAM_CAMERA at bounce 0, the
k-th scatter draws STREAM_BSDF at bounce k), so every path consumes exactly
the same uniforms. Only the per-pixel f32 summation order differs (~1 ulp,
the integrator family's documented freedom); traced-segment counts match
exactly (tests/test_hybrid.py).

Reference semantics covered: the wavefront propagate/scatter split of
15_module.py:980-1036 with its 32-bounce budget (:1031); phase A is the
``camera.get_rays`` + first ``propagate_once`` pair, phase B the remaining
bounce passes over the live set (the sparse-SNode compaction of
:1032-1034, realized as a sort-compacted persistent pool).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..bsdf.bsdf import SCATTERERS
from ..camera.camera import CameraParams, generate_rays_for_pixels
from ..core import rng
from ..core.types import Rays
from .wavefront import _scene_fns


def _r256(v):
    return max(-(-v // 256) * 256, 256)


@partial(jax.jit, static_argnames=("resolution", "spp", "limit", "bsdf",
                                   "camera_model", "scene", "hit_backend",
                                   "chunk_spp", "cap", "pool_w",
                                   "drain_ratio", "stats"))
def render_hybrid(world_data, cam: CameraParams, resolution, spp: int,
                  limit: int = 32, seed=0, bsdf: str = "legacy",
                  camera_model: str = "jitter", scene: str = "legacy",
                  hit_backend: str = "auto", chunk_spp: int = 0,
                  cap: int = 0, pool_w: int = 0, drain_ratio: int = 8,
                  sample_base=0, stats: bool = False):
    """Returns (image f32[W,H,3], segments f32) — same sample values as
    persistent/wavefront render; per-pixel sum order differs (~1 ulp).

    ``chunk_spp``: samples per dense primary slab (0 = auto: largest
    power-of-two divisor of spp keeping the slab under ~2M lanes).
    ``cap``: survivor batch width (0 = auto: slab/8). Batches larger than
    ``cap`` spill into multiple merge rounds — no overflow failure mode.
    ``pool_w``: secondary pool width (0 = auto: slab/4).
    ``drain_ratio``: narrowing ratio of the end-of-render cascade.
    ``sample_base`` (traced u32): absolute sample index of this call's
    first sample — progressive accumulation renders samples
    [sample_base, sample_base + spp) with the same RNG counters the
    one-shot render draws for them (viewer/progressive.py).
    """
    if scene != "legacy":
        raise ValueError("render_hybrid targets legacy mesh scenes; use "
                         "render_persistent for sphere scenes (measured "
                         "fastest there, BASELINE.md)")
    w, h = resolution
    n = w * h
    out = _hybrid_core(world_data, cam, resolution, n, 0, sample_base, spp,
                       limit, seed, bsdf, camera_model, scene, hit_backend,
                       chunk_spp, cap, pool_w, drain_ratio, stats)
    if stats:
        acc, segments, st = out
        return (acc / spp).reshape(w, h, 3), segments, st
    acc, segments = out
    return (acc / spp).reshape(w, h, 3), segments


def _hybrid_core(world_data, cam: CameraParams, resolution, n: int,
                 pixel_base, sample_base, spp: int, limit: int, seed,
                 bsdf: str, camera_model: str, scene: str, hit_backend: str,
                 chunk_spp: int = 0, cap: int = 0, pool_w: int = 0,
                 drain_ratio: int = 8, stats: bool = False):
    """Hybrid render over a pixel range and sample range.

    Traces samples ``[sample_base, sample_base + spp)`` of pixels
    ``[pixel_base, pixel_base + n)`` of the full ``resolution`` image and
    returns ``(acc f32[n, 3] radiance sums, segments f32)``. The shard body
    for parallel.mesh's tile/spp-sharded hybrid path: phase A slabs, the
    survivor pool, merges and deposits are all local to the range — no
    cross-chip traffic until the final image gather. RNG streams key on
    absolute (pixel, sample), so per-sample radiance is reshard-invariant
    (same contract as integrator.persistent._persistent_core)."""
    from ..scene.legacy_world import shade_from_trace, trace_legacy

    pixel_base = jnp.uint32(pixel_base)
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
    if cap <= 0:
        cap = _r256(L0 // 8)
    cap = min(cap, _r256(L0))
    if pool_w <= 0:
        pool_w = _r256(L0 // 4)
    pool_w = max(pool_w, cap)
    W = pool_w

    scatter = SCATTERERS[bsdf]
    hit_fn, background_fn = _scene_fns(scene)
    uspp = jnp.uint32(spp)
    sample_base = jnp.uint32(sample_base)
    cam_res = resolution

    # ---------------------------------------------------- pool machinery --
    # Pool state tuple P = (ro, rd, thp, rad, wid, bounce, alive); every
    # function below is width-polymorphic (drain levels reuse them).
    def pool_pass(P, segments):
        """One secondary bounce pass over the pool. Escape radiance goes to
        the carried per-lane ``rad`` (deposited on eviction), not to acc."""
        ro, rd, thp, rad, wid, bounce, alive = P
        rays = Rays(ro=ro, rd=rd, throughput=thp, alive=alive)
        hits = hit_fn(world_data, rays, hit_backend)
        live = jnp.sum(alive.astype(jnp.float32))
        escaped = alive & ~hits.hit
        rad = rad + jnp.where(
            escaped[:, None],
            background_fn(world_data, rd, escaped) * thp, 0.0)
        pix = wid // uspp + pixel_base
        smp = wid % uspp + sample_base
        base = rng.base(rng.stream(seed, smp, bounce, rng.STREAM_BSDF), pix)
        sc = scatter(rays, hits, base)
        survived = alive & hits.hit & (bounce + 1 < jnp.uint32(limit))
        # dead lanes keep their previous (finite) ray state: hit_legacy
        # clamps miss t to 0 before hits.point, so sc is finite everywhere,
        # but keeping old values is free and independent of that invariant
        m = survived[:, None]
        P = (jnp.where(m, sc.ro, ro), jnp.where(m, sc.rd, rd),
             jnp.where(m, sc.throughput, thp), rad, wid,
             jnp.where(survived, bounce + 1, bounce), survived)
        return P, segments + live, jnp.sum(survived.astype(jnp.float32))

    def sort_pool(P, dead_first: bool):
        """Payload-through-sort of the whole pool by aliveness (argsort +
        per-field gather measured ~4x slower for this shape, see
        ops.packet_traverse._sort_fwd)."""
        ro, rd, thp, rad, wid, bounce, alive = P
        key = alive if dead_first else ~alive
        (_, a, ro0, ro1, ro2, rd0, rd1, rd2, th0, th1, th2,
         ra0, ra1, ra2, wid_s, bnc) = lax.sort(
            (key.astype(jnp.uint32), alive,
             ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
             thp[:, 0], thp[:, 1], thp[:, 2], rad[:, 0], rad[:, 1],
             rad[:, 2], wid, bounce), num_keys=1)
        return (jnp.stack([ro0, ro1, ro2], -1), jnp.stack([rd0, rd1, rd2], -1),
                jnp.stack([th0, th1, th2], -1),
                jnp.stack([ra0, ra1, ra2], -1), wid_s, bnc, a)

    def merge(P, batch, batch_n, acc):
        """Place a survivor batch (cap-wide, valid prefix ``batch_n``) into
        the pool's dead slots. Caller guarantees live <= W - batch_n, so
        after a dead-first sort the prefix rows [0, batch_n) are all dead;
        their pending rad deposits and the batch overwrites them."""
        bro, brd, bth, bwid, balive = batch
        ro, rd, thp, rad, wid, bounce, alive = sort_pool(P, dead_first=True)
        over = jnp.arange(cap, dtype=jnp.uint32) < batch_n        # [cap]
        acc = acc.at[wid[:cap] // uspp].add(
            jnp.where(over[:, None], rad[:cap], 0.0))
        m = over[:, None]

        def splice(pool_f, batch_f, msk):
            return jnp.concatenate(
                [jnp.where(msk, batch_f, pool_f[:cap]), pool_f[cap:]], axis=0)

        P = (splice(ro, bro, m), splice(rd, brd, m), splice(thp, bth, m),
             splice(rad, jnp.zeros((cap, 3), jnp.float32), m),
             splice(wid, bwid, over),
             splice(bounce, jnp.ones((cap,), jnp.uint32), over),
             splice(alive, balive, over))
        return P, acc

    def run_until(P, segments, passes, live, threshold):
        """Pool passes until live <= threshold (traced or static scalar)."""
        def c(st):
            return st[-1] > st[-2]

        def b(st):
            P, seg, ps, thr, live = st
            P, seg, live = pool_pass(P, seg)
            return P, seg, ps + 1.0, thr, live

        P, segments, passes, _, live = lax.while_loop(
            c, b, (P, segments, passes,
                   jnp.asarray(threshold, jnp.float32), live))
        return P, segments, passes, live

    def compact_to(P, acc, lw):
        """Keep the ``lw`` most-alive lanes; deposit the dropped suffix's
        carried radiance (all dropped lanes are dead — callers narrow only
        when live <= lw)."""
        ro, rd, thp, rad, wid, bounce, alive = sort_pool(P, dead_first=False)
        acc = acc.at[wid[lw:] // uspp].add(rad[lw:])
        return (ro[:lw], rd[:lw], thp[:lw], rad[:lw], wid[:lw], bounce[:lw],
                alive[:lw]), acc

    # ------------------------------------------------------- chunk phase --
    lanes = jnp.arange(L0, dtype=jnp.uint32)
    pixel_a = lanes // jnp.uint32(chunk_spp)
    unit_z_cap = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32),
                                  (cap, 3))

    def chunk_body(ci, carry):
        P, acc, segments, passes, live = carry
        sample_a = (jnp.uint32(ci) * jnp.uint32(chunk_spp)
                    + lanes % jnp.uint32(chunk_spp))

        # ---- phase A: dense unsorted pixel-major primaries, trace only ----
        rays = generate_rays_for_pixels(cam, cam_res, pixel_a + pixel_base,
                                        seed, sample_a + sample_base,
                                        model=camera_model)
        t, prim, src = trace_legacy(world_data, rays, sort_rays=False)
        segments = segments + jnp.float32(L0)
        hitm = jnp.isfinite(t)
        esc = ~hitm
        contrib = jnp.where(
            esc[:, None],
            background_fn(world_data, rays.rd, esc) * rays.throughput, 0.0)
        acc = acc + contrib.reshape(n, chunk_spp, 3).sum(axis=1)
        if limit <= 1:
            return P, acc, segments, passes, live

        # ---- survivor extraction: 5-operand sort, survivors first ----
        wid_a = pixel_a * uspp + sample_a
        count = jnp.sum(hitm.astype(jnp.uint32))
        (_, wid_s, t_s, prim_s, src_s) = lax.sort(
            ((~hitm).astype(jnp.uint32), wid_a, t, prim, src), num_keys=1)
        # pad `cap` inert rows so batch dynamic_slices never clamp/alias
        wid_s = jnp.concatenate([wid_s, jnp.zeros((cap,), jnp.uint32)])
        t_s = jnp.concatenate([t_s, jnp.full((cap,), jnp.inf, jnp.float32)])
        prim_s = jnp.concatenate([prim_s, jnp.full((cap,), -1, jnp.int32)])
        src_s = jnp.concatenate([src_s, jnp.full((cap,), -1, jnp.int32)])

        # ---- spill loop: usually one batch/chunk; any hit fraction works --
        def spill_cond(st):
            return st[0] * cap < count

        def spill_body(st):
            j, P, acc, segments, passes, live = st
            off = j * jnp.uint32(cap)
            widb = lax.dynamic_slice(wid_s, (off,), (cap,))
            tb = lax.dynamic_slice(t_s, (off,), (cap,))
            primb = lax.dynamic_slice(prim_s, (off,), (cap,))
            srcb = lax.dynamic_slice(src_s, (off,), (cap,))
            batch_n = jnp.minimum(jnp.uint32(cap), count - off)

            # make room: drain the pool until the batch fits
            P, segments, passes, live = run_until(
                P, segments, passes, live,
                jnp.float32(W) - batch_n.astype(jnp.float32))

            # regen + deferred shading + bounce-0 scatter at batch width:
            # primaries are pure functions of (pixel, sample, seed)
            pixb = widb // uspp + pixel_base
            smpb = widb % uspp + sample_base
            raysb = generate_rays_for_pixels(cam, cam_res, pixb, seed,
                                             smpb, model=camera_model)
            validb = jnp.arange(cap, dtype=jnp.uint32) < batch_n
            hitsb = shade_from_trace(world_data, raysb,
                                     jnp.where(validb, tb, jnp.inf),
                                     primb, srcb,
                                     count=batch_n.astype(jnp.int32))
            base = rng.base(rng.stream(seed, smpb, 0, rng.STREAM_BSDF), pixb)
            scb = scatter(raysb, hitsb, base)
            mb = validb[:, None]
            batch = (jnp.where(mb, scb.ro, 0.0),
                     jnp.where(mb, scb.rd, unit_z_cap),
                     jnp.where(mb, scb.throughput, 0.0),
                     jnp.where(validb, widb, 0),
                     validb)
            P, acc = merge(P, batch, batch_n, acc)
            live = live + batch_n.astype(jnp.float32)
            return j + 1, P, acc, segments, passes, live

        _, P, acc, segments, passes, live = lax.while_loop(
            spill_cond, spill_body,
            (jnp.uint32(0), P, acc, segments, passes, live))
        return P, acc, segments, passes, live

    acc0 = jnp.zeros((n, 3), jnp.float32)
    P0 = (jnp.zeros((W, 3), jnp.float32),
          jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), (W, 3)),
          jnp.zeros((W, 3), jnp.float32),
          jnp.zeros((W, 3), jnp.float32),
          jnp.zeros((W,), jnp.uint32),
          jnp.zeros((W,), jnp.uint32),
          jnp.zeros((W,), bool))
    P, acc, segments, passes, live = lax.fori_loop(
        0, n_chunks, chunk_body,
        (P0, acc0, jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0)))

    # --------------------------------------------- end-of-render cascade --
    levels = []
    if limit > 1:
        lw = _r256(W // drain_ratio)
        while 256 <= lw < (levels[-1] if levels else W):
            levels.append(lw)
            lw = _r256(lw // drain_ratio)
    P, segments, passes, live = run_until(P, segments, passes, live,
                                          levels[0] if levels else 0)
    for li, lw in enumerate(levels):
        P, acc = compact_to(P, acc, lw)
        nxt = levels[li + 1] if li + 1 < len(levels) else 0
        P, segments, passes, live = run_until(P, segments, passes, live,
                                              nxt)
    # final flush: every lane is dead; deposit all remaining carried rad
    _, _, _, rad, wid, _, _ = P
    acc = acc.at[wid // uspp].add(rad)

    if stats:
        return acc, segments, {"chunk_spp": chunk_spp, "n_chunks": n_chunks,
                               "cap": cap, "pool_w": W,
                               "levels": tuple(levels), "passes": passes}
    return acc, segments
