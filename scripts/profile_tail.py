"""Profile the hybrid's trapped-dielectric TAIL (round-4 verdict weak #2).

The yoimiya limit split showed bounces 2-31 cost ~609 ms for 1.73M segments
(~352 ns/seg) across ~25 narrow (33-65k lane) cascade passes. This script
rebuilds REAL bounce-k ray populations (successive trace+scatter from the
dense primaries, exactly the hybrid's pipeline) and then:

  1. times the pool-pass core (trace_shade_compact) and its traversal
     component at tail widths;
  2. runs the ORACLE t-seed ablation: packet_traverse with t_init = the
     known hit t * (1+1e-3) vs +inf — the upper bound on what any
     previous-hit-derived traversal seeding (local bounce locality) could
     buy. If the oracle does not collapse traversal time, per-lane t
     seeding is dead for packet traversal.

Usage: python scripts/profile_tail.py [--width 65536] [--bounces 3]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=65536)
    p.add_argument("--bounces", type=int, default=3,
                   help="scatter steps before profiling (3 = rays entering "
                        "their 4th segment, deep in the trapped set)")
    p.add_argument("--iters", type=int, default=16)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from learn_path_tracing_tpu.bsdf.bsdf import scatter_legacy
    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.camera.camera import generate_rays_for_pixels
    from learn_path_tracing_tpu.core import rng
    from learn_path_tracing_tpu.core.types import Rays
    from learn_path_tracing_tpu.scene.legacy_world import (
        shade_from_trace, trace_legacy, trace_shade_compact)
    from learn_path_tracing_tpu.utils.benchlib import time_fn_async
    from worldcache import load_world

    res = (640, 360)
    n = res[0] * res[1]
    spp = 64
    chunk = 8
    L0 = n * chunk
    W = args.width
    wd = load_world()
    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))
    cp = cam.params()

    lanes = jnp.arange(L0, dtype=jnp.uint32)
    pixel = lanes // jnp.uint32(chunk)
    sample = lanes % jnp.uint32(chunk)

    @jax.jit
    def primaries_and_b1(wd):
        """Dense primaries -> compacted bounce-1 pool columns (the hybrid's
        phase A + batch pipeline, at cap = L0/8)."""
        rays = generate_rays_for_pixels(cp, res, pixel, 0, sample,
                                        model="jitter")
        t, prim, src = trace_legacy(wd, rays, sort_rays=False)
        cap = L0 // 8
        wid = pixel * jnp.uint32(spp) + sample
        hitm = jnp.isfinite(t)
        count = jnp.minimum(jnp.sum(hitm.astype(jnp.int32)), jnp.int32(cap))
        _, wid_s, t_s, prim_s, src_s = jax.lax.sort(
            ((~hitm).astype(jnp.uint32), wid, t, prim, src), num_keys=1)
        widb, tb, primb, srcb = (x[:cap]
                                 for x in (wid_s, t_s, prim_s, src_s))
        pixb = widb // jnp.uint32(spp)
        smpb = widb % jnp.uint32(spp)
        raysb = generate_rays_for_pixels(cp, res, pixb, 0, smpb,
                                         model="jitter")
        validb = jnp.arange(cap, dtype=jnp.int32) < count
        hitsb = shade_from_trace(wd, raysb, jnp.where(validb, tb, jnp.inf),
                                 primb, srcb, count=count)
        base = rng.base(rng.stream(0, smpb, 0, rng.STREAM_BSDF), pixb)
        scb = scatter_legacy(raysb, hitsb, base)
        return scb.ro, scb.rd, scb.throughput, widb, validb, primb

    ro, rd, thp, wid, alive, prim_prev = primaries_and_b1(wd)
    cur_w = ro.shape[0]

    @jax.jit
    def bounce_step(wd, ro, rd, thp, wid, alive, bounce_idx):
        """One pool pass (trace_shade_compact + scatter), survivors-first."""
        payload = (thp[:, 0], thp[:, 1], thp[:, 2], wid,
                   jnp.full_like(wid, bounce_idx), alive)
        hits, rd_c, payload_c, nhits = trace_shade_compact(
            wd, ro, rd, alive, payload)
        th0, th1, th2, wid_c, bnc_c, alive_c = payload_c
        thp_c = jnp.stack([th0, th1, th2], -1)
        base = rng.base(rng.stream(0, wid_c % jnp.uint32(spp), bnc_c,
                                   rng.STREAM_BSDF),
                        wid_c // jnp.uint32(spp))
        rays_c = Rays(ro=hits.point, rd=rd_c, throughput=thp_c,
                      alive=alive_c)
        sc = scatter_legacy(rays_c, hits, base)
        surv = alive_c & hits.hit
        m = surv[:, None]
        return (jnp.where(m, sc.ro, hits.point), jnp.where(m, sc.rd, rd_c),
                jnp.where(m, sc.throughput, thp_c), wid_c, surv,
                jnp.where(surv, hits.obj, -1), nhits)

    for b in range(1, args.bounces):
        ro, rd, thp, wid, alive, prim_prev, nh = bounce_step(
            wd, ro, rd, thp, wid, alive, b)
        live = int(jnp.sum(alive))
        print(f"bounce {b}: {live} survivors (of {cur_w} lanes)", flush=True)
        # survivors are the prefix [0, nhits) after trace_shade_compact's
        # hit-compaction; snap the working width down as the set collapses
        while cur_w // 2 >= max(live, 1024):
            cur_w //= 2
        cur_w = max(cur_w, 1024)
        ro, rd, thp, wid, alive, prim_prev = (
            x[:cur_w] for x in (ro, rd, thp, wid, alive, prim_prev))

    # pad/tile the trapped set to the requested profile width
    live = int(jnp.sum(alive))
    reps = -(-W // cur_w)
    ro, rd, thp, wid, alive, prim_prev = (
        jnp.tile(x, (reps,) + (1,) * (x.ndim - 1))[:W]
        for x in (ro, rd, thp, wid, alive, prim_prev))
    live_w = int(jnp.sum(alive))
    print(f"profiling at W={W}: {live_w} live trapped lanes "
          f"(bounce >= {args.bounces})", flush=True)

    mesh = wd.meshes[0]
    nodes, entries, runs = mesh.packet

    # ---- pool-pass core and components ----
    @jax.jit
    def pass_core(wd, ro, rd, thp, wid, alive):
        payload = (thp[:, 0], thp[:, 1], thp[:, 2], wid,
                   jnp.zeros_like(wid), alive)
        hits, rd_c, payload_c, nhits = trace_shade_compact(
            wd, ro, rd, alive, payload)
        return hits.point, nhits

    dt, _ = time_fn_async(pass_core, wd, ro, rd, thp, wid, alive,
                          iters=args.iters)
    print(f"trace_shade_compact@{W}:   {dt*1e3:8.2f} ms", flush=True)

    from learn_path_tracing_tpu.ops.packet_traverse import (
        packet_traverse, packet_traverse_sorted)

    @jax.jit
    def trav_sorted(nodes, entries, runs, tl, ro, rd, alive):
        return packet_traverse_sorted(nodes, entries, runs, ro, rd, alive,
                                      treelets=tl)[:2]

    dt, (t_s, prim_s) = time_fn_async(trav_sorted, nodes, entries, runs,
                                      mesh.treelets, ro, rd, alive,
                                      iters=args.iters)
    print(f"packet_traverse_sorted@{W}: {dt*1e3:7.2f} ms", flush=True)

    @jax.jit
    def trav(nodes, entries, runs, tl, ro, rd, t_init, alive):
        return packet_traverse(nodes, entries, runs, ro, rd, t_init, alive,
                               treelets=tl)

    inf0 = jnp.full((W,), jnp.inf, jnp.float32)
    dt, (t_ref, p_ref) = time_fn_async(trav, nodes, entries, runs,
                                       mesh.treelets, ro, rd, inf0, alive,
                                       iters=args.iters)
    print(f"packet_traverse t_init=inf@{W}: {dt*1e3:7.2f} ms  "
          f"hit_frac={float(jnp.mean((p_ref >= 0) & alive)):.3f}",
          flush=True)

    # ---- ORACLE seed: the known t (slightly relaxed so the hit is re-found)
    t_seed = jnp.where(jnp.isfinite(t_ref), t_ref * 1.001, jnp.inf)
    dt, (t_o, p_o) = time_fn_async(trav, nodes, entries, runs,
                                   mesh.treelets, ro, rd, t_seed, alive,
                                   iters=args.iters)
    match = float(jnp.mean((p_o == p_ref) | ~alive))
    print(f"packet_traverse ORACLE seed@{W}: {dt*1e3:6.2f} ms  "
          f"(prim match {match:.4f})", flush=True)

    # upper-bound variant: also skip re-finding (pure pruning measurement,
    # results unusable — every lane keeps its seed)
    t_seed2 = jnp.where(jnp.isfinite(t_ref), t_ref * 0.999, jnp.inf)
    dt, _ = time_fn_async(trav, nodes, entries, runs, mesh.treelets,
                          ro, rd, t_seed2, alive, iters=args.iters)
    print(f"packet_traverse ORACLE-tight seed@{W}: {dt*1e3:6.2f} ms "
          f"(pruning-only bound)", flush=True)





def sort_ablation():
    """Compare tail-traversal sort keys: the production treelet key vs
    prev-prim id vs fine Morton of the bounce origin (= the previous hit
    point). Interior origins make the treelet-entry key degenerate (every
    containing box ties at entry distance 0), so finer positional keys may
    cut the block node-unions where the oracle t-seed could not."""
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=65536)
    p.add_argument("--bounces", type=int, default=3)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--ablate", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from learn_path_tracing_tpu.ops.packet_traverse import packet_traverse
    from learn_path_tracing_tpu.utils.benchlib import time_fn_async
    from worldcache import load_world

    wd, (ro, rd, thp, wid, alive, prim_prev) = _build_tail(args)
    W = args.width
    mesh = wd.meshes[0]
    nodes, entries, runs = mesh.packet

    @jax.jit
    def trav_presorted(nodes, entries, runs, key, ro, rd, alive):
        ops = jax.lax.sort(
            (key, ro[:, 0], ro[:, 1], ro[:, 2],
             rd[:, 0], rd[:, 1], rd[:, 2], alive), num_keys=1)
        ro_s = jnp.stack(ops[1:4], -1)
        rd_s = jnp.stack(ops[4:7], -1)
        al_s = ops[7]
        t0 = jnp.full((W,), jnp.inf, jnp.float32)
        return packet_traverse(nodes, entries, runs, ro_s, rd_s, t0, al_s,
                               sort_rays=False, with_stats=True)

    # fine Morton over the mesh root box (10 bits/axis)
    lo = jnp.stack([jnp.min(nodes[0, d * 8:(d + 1) * 8]) for d in range(3)])
    hi = jnp.stack([jnp.max(nodes[0, (3 + d) * 8:(4 + d) * 8])
                    for d in range(3)])
    span = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip(((ro - lo) / span * 1024).astype(jnp.int32), 0, 1023)

    def spread10(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    morton = ((spread10(q[:, 0]) << 2) | (spread10(q[:, 1]) << 1)
              | spread10(q[:, 2]))
    inact = jnp.int32(0x7FFFFFFF)
    keys = {
        "prim_prev": jnp.where(alive, prim_prev, inact),
        "morton10(origin)": jnp.where(alive, morton, inact),
        "morton10+octant": jnp.where(
            alive, (morton << 3)
            | ((rd[:, 0] > 0).astype(jnp.int32)
               + 2 * (rd[:, 1] > 0).astype(jnp.int32)
               + 4 * (rd[:, 2] > 0).astype(jnp.int32)), inact),
    }
    for name, key in keys.items():
        dt, (t, prim, iters) = time_fn_async(
            trav_presorted, nodes, entries, runs, key, ro, rd, alive,
            iters=args.iters)
        print(f"presorted[{name}]@{W}: {dt*1e3:7.2f} ms  "
              f"mean pops/block={float(jnp.mean(iters)):.1f}", flush=True)


def _build_tail(args):
    """Rebuild the trapped-ray set (same pipeline as main())."""
    import jax
    import jax.numpy as jnp

    from learn_path_tracing_tpu.bsdf.bsdf import scatter_legacy
    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.camera.camera import generate_rays_for_pixels
    from learn_path_tracing_tpu.core import rng
    from learn_path_tracing_tpu.core.types import Rays
    from learn_path_tracing_tpu.scene.legacy_world import (
        shade_from_trace, trace_legacy, trace_shade_compact)
    from worldcache import load_world

    res = (640, 360)
    n = res[0] * res[1]
    spp = 64
    chunk = 8
    L0 = n * chunk
    W = args.width
    wd = load_world()
    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))
    cp = cam.params()

    lanes = jnp.arange(L0, dtype=jnp.uint32)
    pixel = lanes // jnp.uint32(chunk)
    sample = lanes % jnp.uint32(chunk)

    @jax.jit
    def primaries_and_b1(wd):
        rays = generate_rays_for_pixels(cp, res, pixel, 0, sample,
                                        model="jitter")
        t, prim, src = trace_legacy(wd, rays, sort_rays=False)
        cap = L0 // 8
        wid = pixel * jnp.uint32(spp) + sample
        hitm = jnp.isfinite(t)
        count = jnp.minimum(jnp.sum(hitm.astype(jnp.int32)), jnp.int32(cap))
        _, wid_s, t_s, prim_s, src_s = jax.lax.sort(
            ((~hitm).astype(jnp.uint32), wid, t, prim, src), num_keys=1)
        widb, tb, primb, srcb = (x[:cap]
                                 for x in (wid_s, t_s, prim_s, src_s))
        pixb = widb // jnp.uint32(spp)
        smpb = widb % jnp.uint32(spp)
        raysb = generate_rays_for_pixels(cp, res, pixb, 0, smpb,
                                         model="jitter")
        validb = jnp.arange(cap, dtype=jnp.int32) < count
        hitsb = shade_from_trace(wd, raysb, jnp.where(validb, tb, jnp.inf),
                                 primb, srcb, count=count)
        base = rng.base(rng.stream(0, smpb, 0, rng.STREAM_BSDF), pixb)
        scb = scatter_legacy(raysb, hitsb, base)
        return scb.ro, scb.rd, scb.throughput, widb, validb, primb

    ro, rd, thp, wid, alive, prim_prev = primaries_and_b1(wd)
    cur_w = ro.shape[0]

    @jax.jit
    def bounce_step(wd, ro, rd, thp, wid, alive, bounce_idx):
        payload = (thp[:, 0], thp[:, 1], thp[:, 2], wid,
                   jnp.full_like(wid, bounce_idx), alive)
        hits, rd_c, payload_c, nhits = trace_shade_compact(
            wd, ro, rd, alive, payload)
        th0, th1, th2, wid_c, bnc_c, alive_c = payload_c
        thp_c = jnp.stack([th0, th1, th2], -1)
        base = rng.base(rng.stream(0, wid_c % jnp.uint32(spp), bnc_c,
                                   rng.STREAM_BSDF),
                        wid_c // jnp.uint32(spp))
        rays_c = Rays(ro=hits.point, rd=rd_c, throughput=thp_c,
                      alive=alive_c)
        sc = scatter_legacy(rays_c, hits, base)
        surv = alive_c & hits.hit
        m = surv[:, None]
        return (jnp.where(m, sc.ro, hits.point), jnp.where(m, sc.rd, rd_c),
                jnp.where(m, sc.throughput, thp_c), wid_c, surv,
                jnp.where(surv, hits.obj, -1), nhits)

    for b in range(1, args.bounces):
        ro, rd, thp, wid, alive, prim_prev, nh = bounce_step(
            wd, ro, rd, thp, wid, alive, b)
        live = int(jnp.sum(alive))
        print(f"bounce {b}: {live} survivors (of {cur_w} lanes)", flush=True)
        while cur_w // 2 >= max(live, 1024):
            cur_w //= 2
        cur_w = max(cur_w, 1024)
        ro, rd, thp, wid, alive, prim_prev = (
            x[:cur_w] for x in (ro, rd, thp, wid, alive, prim_prev))

    live = int(jnp.sum(alive))
    reps = -(-W // cur_w)
    ro, rd, thp, wid, alive, prim_prev = (
        jnp.tile(x, (reps,) + (1,) * (x.ndim - 1))[:W]
        for x in (ro, rd, thp, wid, alive, prim_prev))
    print(f"profiling at W={W}: {int(jnp.sum(alive))} live trapped lanes",
          flush=True)
    return wd, (ro, rd, thp, wid, alive, prim_prev)


if __name__ == "__main__":
    import sys as _sys
    if "--ablate" in _sys.argv:
        sort_ablation()
    else:
        main()
