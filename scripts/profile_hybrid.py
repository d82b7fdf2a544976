"""Component timing for the hybrid integrator on the Yoimiya bench config.

Times phase A's pieces (raygen / trace-only unsorted / env+acc / extraction
sort), the batch pipeline (regen + deferred shade + scatter), the merge
sort, the eviction deposit scatter, and one pool pass at the chosen width,
so hybrid regressions are attributable without full-bench compiles.

Usage: python scripts/profile_hybrid.py [--chunk 8] [--cap 230400]
       [--poolw 460800]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=8)
    p.add_argument("--cap", type=int, default=230400)
    p.add_argument("--poolw", type=int, default=460800)
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--only", type=str, default="",
                   help="comma-separated section names to run (default all): "
                        "raygen,trace,env,extract,batch,merge,deposit,pool,"
                        "sec,attrs,poolreal")
    args = p.parse_args()
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    import jax
    import jax.numpy as jnp

    from learn_path_tracing_tpu.bsdf.bsdf import scatter_legacy
    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.camera.camera import generate_rays_for_pixels
    from learn_path_tracing_tpu.core import rng
    from learn_path_tracing_tpu.core.types import Rays
    from learn_path_tracing_tpu.scene.legacy_world import (
        environment_color, hit_legacy, shade_from_trace, trace_legacy)
    from learn_path_tracing_tpu.utils.benchlib import time_fn_async
    from worldcache import load_world

    res = (640, 360)
    n = res[0] * res[1]
    spp = 64
    chunk = args.chunk
    cap, W = args.cap, args.poolw
    L0 = n * chunk
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
    def gen(seed):
        return generate_rays_for_pixels(cp, res, pixel, seed, sample,
                                        model="jitter")

    if want("raygen"):
        dt, rays = time_fn_async(gen, 0, iters=args.iters)
        print(f"raygen@{L0}:            {dt*1e3:8.2f} ms", flush=True)
    else:
        rays = gen(0)

    @jax.jit
    def trace(r):
        return trace_legacy(wd, r, sort_rays=False)

    if want("trace"):
        dt, (t, prim, src) = time_fn_async(trace, rays, iters=args.iters)
        hitfrac = float(jnp.mean(jnp.isfinite(t).astype(jnp.float32)))
        print(f"trace unsorted@{L0}:    {dt*1e3:8.2f} ms  "
              f"hit_frac={hitfrac:.3f}", flush=True)
    else:
        t, prim, src = trace(rays)

    @jax.jit
    def env_acc(r, t_):
        esc = ~jnp.isfinite(t_)
        env = environment_color(wd.envs, wd.env_id, r.rd, mask=esc,
                                gradient_h=getattr(wd, "env_gradient_h",
                                                   None))
        contrib = jnp.where(esc[:, None], env * r.throughput, 0.0)
        return contrib.reshape(n, chunk, 3).sum(axis=1)

    if want("env"):
        dt, _ = time_fn_async(env_acc, rays, t, iters=args.iters)
        print(f"env+esc-acc@{L0}:       {dt*1e3:8.2f} ms", flush=True)

    wid = pixel * jnp.uint32(spp) + sample

    @jax.jit
    def extract(t_, prim_, src_):
        # the round-5 3-operand form (integrator/hybrid.py): t itself is
        # the partition key (hits finite, misses +inf), src packed into
        # prim's high bits
        ps = jnp.where(jnp.isfinite(t_), prim_ | ((src_ + 1) << 24), -1)
        t_o, wid_o, ps_o = jax.lax.sort((t_, wid, ps), num_keys=1)
        prim_o = jnp.where(ps_o >= 0, ps_o & 0xFFFFFF, -1)
        src_o = jnp.where(ps_o >= 0, (ps_o >> 24) - 1, -1)
        return t_o, wid_o, prim_o, src_o

    if want("extract"):
        dt, (t_s, wid_s, prim_s, src_s) = time_fn_async(
            extract, t, prim, src, iters=args.iters)
        print(f"extract 3-op sort@{L0}: {dt*1e3:8.2f} ms", flush=True)
    else:
        t_s, wid_s, prim_s, src_s = extract(t, prim, src)

    widb, tb, primb, srcb = (x[:cap] for x in (wid_s, t_s, prim_s, src_s))
    count = jnp.minimum(jnp.sum(jnp.isfinite(t_s).astype(jnp.int32)),
                        jnp.int32(cap))

    @jax.jit
    def batch_pipeline(wd_, widb_, tb_, primb_, srcb_, count_):
        pixb = widb_ // jnp.uint32(spp)
        smpb = widb_ % jnp.uint32(spp)
        raysb = generate_rays_for_pixels(cp, res, pixb, 0, smpb,
                                         model="jitter")
        validb = jnp.arange(cap, dtype=jnp.int32) < count_
        hitsb = shade_from_trace(wd_, raysb, jnp.where(validb, tb_, jnp.inf),
                                 primb_, srcb_, count=count_)
        base = rng.base(rng.stream(0, smpb, 0, rng.STREAM_BSDF), pixb)
        scb = scatter_legacy(raysb, hitsb, base)
        return scb.ro, scb.rd, scb.throughput

    if want("batch"):
        dt, _ = time_fn_async(batch_pipeline, wd, widb, tb, primb, srcb,
                              count, iters=args.iters)
        print(f"batch regen+shade+scatter@{cap}: {dt*1e3:6.2f} ms",
              flush=True)

    if want("sec"):
        # bounce-1 rays: batch_pipeline output traced at batch width —
        # the numbers that decide pooled vs per-chunk secondary tracing
        ro1, rd1, thp1 = batch_pipeline(wd, widb, tb, primb, srcb, count)
        alive1 = jnp.arange(cap, dtype=jnp.int32) < count

        @jax.jit
        def trace_sec(wd_, ro_, rd_, alive_):
            r = Rays(ro=ro_, rd=rd_, throughput=jnp.ones_like(ro_),
                     alive=alive_)
            return trace_legacy(wd_, r, sort_rays=True)

        dt, (t1, p1, s1) = time_fn_async(trace_sec, wd, ro1, rd1, alive1,
                                         iters=args.iters)
        hf1 = float(jnp.sum((jnp.isfinite(t1) & alive1).astype(jnp.float32))
                    / jnp.sum(alive1.astype(jnp.float32)))
        print(f"trace sorted bounce1@{cap}: {dt*1e3:6.2f} ms  "
              f"hit_frac={hf1:.3f} of {int(jnp.sum(alive1))} live",
              flush=True)

    if want("attrs"):
        # the attrs block alone at batch width: real hit points, prefix =
        # full width (what a high-occupancy cascade pass pays per level)
        from learn_path_tracing_tpu.scene.legacy_world import _attrs_switch

        ro1b, rd1b, thp1b = batch_pipeline(wd, widb, tb, primb, srcb, count)
        ptb = ro1b  # scatter origins sit on the surface: realistic points

        @jax.jit
        def attrs_full(wd_, pt_, prim_, src_):
            hitm = jnp.ones((cap,), bool)
            return _attrs_switch(wd_, pt_, jnp.maximum(prim_, 0), src_,
                                 hitm, jnp.int32(cap))

        dt, _ = time_fn_async(attrs_full, wd, ptb, primb, srcb,
                              iters=args.iters)
        print(f"attrs block@{cap} (full prefix): {dt*1e3:6.2f} ms "
              f"({dt/cap*1e9:.0f} ns/row)", flush=True)

    # merge sort (16 operands at W) + eviction deposit scatter (cap rows)
    key32 = jax.random.PRNGKey(0)
    f = lambda *sh: jax.random.normal(key32, sh, jnp.float32)
    ro = f(W, 3); rd = f(W, 3); thp = f(W, 3); rad = f(W, 3)
    widp = jnp.arange(W, dtype=jnp.uint32) % jnp.uint32(n * spp)
    bounce = jnp.zeros((W,), jnp.uint32)
    alive = (jnp.arange(W) % 3 == 0)

    @jax.jit
    def merge_sort(alive_, ro_, rd_, thp_, rad_, wid_, bnc_):
        return jax.lax.sort(
            (alive_.astype(jnp.uint32), alive_,
             ro_[:, 0], ro_[:, 1], ro_[:, 2], rd_[:, 0], rd_[:, 1],
             rd_[:, 2], thp_[:, 0], thp_[:, 1], thp_[:, 2],
             rad_[:, 0], rad_[:, 1], rad_[:, 2], wid_, bnc_), num_keys=1)

    if want("merge"):
        dt, _ = time_fn_async(merge_sort, alive, ro, rd, thp, rad, widp,
                              bounce, iters=args.iters)
        print(f"merge 16-op sort@{W}:   {dt*1e3:8.2f} ms", flush=True)

    acc0 = jnp.zeros((n, 3), jnp.float32)

    @jax.jit
    def deposit(acc, pix_, rad_):
        return acc.at[pix_].add(rad_)

    if want("deposit"):
        dt, _ = time_fn_async(deposit, acc0, widp[:cap] // jnp.uint32(spp),
                              rad[:cap], iters=args.iters)
        print(f"deposit scatter@{cap}:  {dt*1e3:8.2f} ms", flush=True)

    # one pool pass at W (fused hit + env + scatter)
    roW = jnp.zeros((W, 3), jnp.float32)
    rdW = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

    @jax.jit
    def pool_pass(wd_, alive_, ro_, rd_, thp_, rad_, wid_, bnc_):
        rays_ = Rays(ro=ro_, rd=rd_, throughput=thp_, alive=alive_)
        hits = hit_legacy(wd_, rays_)
        esc = alive_ & ~hits.hit
        env = environment_color(wd_.envs, wd_.env_id, rd_, mask=esc,
                                gradient_h=getattr(wd_, "env_gradient_h",
                                                   None))
        rad2 = rad_ + jnp.where(esc[:, None], env * thp_, 0.0)
        base = rng.base(rng.stream(0, wid_ % jnp.uint32(spp), bnc_,
                                   rng.STREAM_BSDF), wid_ // jnp.uint32(spp))
        sc = scatter_legacy(rays_, hits, base)
        surv = alive_ & hits.hit
        m = surv[:, None]
        return (jnp.where(m, sc.ro, ro_), jnp.where(m, sc.rd, rd_),
                jnp.where(m, sc.throughput, thp_), rad2, surv)

    if want("pool"):
        dt, _ = time_fn_async(pool_pass, wd, alive, roW, rdW, thp, rad,
                              widp, bounce, iters=args.iters)
        print(f"pool pass@{W} (33% live): {dt*1e3:6.2f} ms", flush=True)

    if want("poolreal"):
        # realistic wide pool pass: tile the REAL bounce-1 rays to pool
        # width (entered fraction ~= live, unlike the random-ray 'pool'
        # section which measured 7.91 ms/460k — far too optimistic)
        ro1c, rd1c, thp1c = batch_pipeline(wd, widb, tb, primb, srcb, count)
        reps = -(-W // cap)
        rot = jnp.tile(ro1c, (reps, 1))[:W]
        rdt = jnp.tile(rd1c, (reps, 1))[:W]
        tht = jnp.tile(thp1c, (reps, 1))[:W]
        alt = jnp.tile(jnp.arange(cap, dtype=jnp.uint32) < count, (reps,))[:W]
        wpt = jnp.arange(W, dtype=jnp.uint32) % jnp.uint32(n * spp)
        bnt = jnp.ones((W,), jnp.uint32)
        live_n = int(jnp.sum(alt))

        dt, _ = time_fn_async(pool_pass, wd, alt, rot, rdt, tht,
                              jnp.zeros((W, 3), jnp.float32), wpt, bnt,
                              iters=args.iters)
        print(f"pool pass@{W} REAL bounce-1 rays ({live_n} live): "
              f"{dt*1e3:6.2f} ms", flush=True)



if __name__ == "__main__":
    main()
