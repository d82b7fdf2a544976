"""Component timing for the cohort integrator on the Yoimiya bench config.

Times phase A (dense primaries: raygen / hit sorted vs unsorted / env+acc /
scatter), the compaction sort, and the end-to-end render at several
(chunk_spp, sec_ratio, primary_sort) points, so regressions are
attributable before paying full-bench compiles.

Usage: python scripts/profile_cohort.py [--chunks 1,8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunks", type=str, default="1,8")
    p.add_argument("--e2e", type=str, default="",
                   help="comma list of chunk:ratio:psort e2e configs")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.camera.camera import generate_rays_for_pixels
    from learn_path_tracing_tpu.core import rng
    from learn_path_tracing_tpu.core.types import Rays
    from learn_path_tracing_tpu.bsdf.bsdf import scatter_legacy
    from learn_path_tracing_tpu.scene.legacy_world import (
        environment_color, hit_legacy)
    from learn_path_tracing_tpu.utils.benchlib import time_fn_async
    from worldcache import load_world

    res = (640, 360)
    n = res[0] * res[1]
    wd = load_world()
    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))
    cp = cam.params()

    for chunk in [int(c) for c in args.chunks.split(",") if c]:
        L0 = n * chunk
        lanes = jnp.arange(L0, dtype=jnp.uint32)
        pixel = lanes // jnp.uint32(chunk)
        sample = lanes % jnp.uint32(chunk)

        @jax.jit
        def gen(seed):
            return generate_rays_for_pixels(cp, res, pixel, seed, sample,
                                            model="jitter")

        dt, rays = time_fn_async(gen, 0, iters=32)
        print(f"chunk={chunk} raygen           {dt*1e3:8.2f} ms", flush=True)

        for psort, tag in ((None, "sorted(fused)"), (False, "unsorted")):
            @jax.jit
            def hitp(w, r, _psort=psort):
                h = hit_legacy(w, r, sort_rays=_psort)
                return h.t, h.hit

            dt, (t, hm) = time_fn_async(hitp, wd, rays, iters=32)
            frac = float(jnp.mean(hm.astype(jnp.float32)))
            print(f"chunk={chunk} hit {tag:14s} {dt*1e3:8.2f} ms  "
                  f"hit_frac={frac:.3f}", flush=True)

        @jax.jit
        def full_hit(w, r):
            h = hit_legacy(w, r)
            esc = r.alive & ~h.hit
            env = environment_color(w.envs, w.env_id, r.rd, mask=esc,
                                    gradient_h=getattr(w, "env_gradient_h",
                                                       None))
            contrib = jnp.where(esc[:, None], env * r.throughput, 0.0)
            acc = contrib.reshape(n, chunk, 3).sum(axis=1)
            b = rng.base(rng.stream(0, sample, 0, rng.STREAM_BSDF), pixel)
            sc = scatter_legacy(r, h, b)
            surv = h.hit
            out = Rays(ro=sc.ro, rd=sc.rd, throughput=sc.throughput,
                       alive=surv)
            return acc, out

        dt, (acc, rays2) = time_fn_async(full_hit, wd, rays, iters=32)
        print(f"chunk={chunk} phaseA full      {dt*1e3:8.2f} ms", flush=True)

        rad = jnp.zeros((L0, 3), jnp.float32)

        @jax.jit
        def compact(r, rad, width=max(256, -(-L0 // 4 // 256) * 256)):
            key = (~r.alive).astype(jnp.uint32)
            outs = jax.lax.sort(
                (key, r.alive, r.ro[:, 0], r.ro[:, 1], r.ro[:, 2],
                 r.rd[:, 0], r.rd[:, 1], r.rd[:, 2],
                 r.throughput[:, 0], r.throughput[:, 1], r.throughput[:, 2],
                 rad[:, 0], rad[:, 1], rad[:, 2], pixel, sample),
                num_keys=1)
            return [o[:width] for o in outs[1:]]

        dt, _ = time_fn_async(compact, rays2, rad, iters=32)
        print(f"chunk={chunk} compact sort     {dt*1e3:8.2f} ms", flush=True)

    for cfg in [c for c in args.e2e.split(",") if c]:
        ch, ra, ps = cfg.split(":")
        from learn_path_tracing_tpu.integrator.cohort import render_cohort

        psort = None if int(ps) < 0 else bool(int(ps))

        def run(seed, ch=int(ch), ra=int(ra), psort=psort):
            return render_cohort(wd, cp, res, spp=64, limit=32, seed=seed,
                                 bsdf="legacy", camera_model="jitter",
                                 scene="legacy", chunk_spp=ch, sec_ratio=ra,
                                 primary_sort=psort)

        dt, (img, segs) = time_fn_async(run, 0, iters=2, warmup=1)
        print(f"e2e chunk={ch} ratio={ra} psort={ps}: {dt:6.3f} s  "
              f"{float(segs)/dt/1e6:6.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
