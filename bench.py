"""Headline benchmark: 10_final cover scene on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}

- Workload: the reference's stage-10 scene (~490 spheres, mixed BSDFs) at
  1280x720, depth 32 (10_final/__main__.py:50-52), measured over `--spp`
  samples after a full warm-up run.
- value: millions of *live* ray segments traced per second per chip
  (dead/masked lanes are not counted, so this is honest useful-work
  throughput — the BASELINE.json metric).
- vs_baseline: value / 100 Mrays/s (the BASELINE.json v5e target; the
  reference itself publishes no numbers — BASELINE.md).
"""

import argparse
import json
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--spp", type=int, default=64)
    p.add_argument("--limit", type=int, default=32)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--hit-backend", type=str, default="auto")
    p.add_argument("--pool-mult", type=int, default=0,
                   help="persistent pool multiplier override (0 = auto)")
    p.add_argument("--pool-div", type=int, default=0,
                   help="persistent pool divisor override (0 = auto); "
                        "pool = n/pool_div lanes, each running "
                        "pool_div*spp work items")
    p.add_argument("--engine", type=str, default="auto",
                   choices=["auto", "persistent", "hybrid"],
                   help="auto: measured-best per scene — hybrid for legacy "
                        "mesh scenes (14.1 vs persistent 12.5 Mrays/s on "
                        "yoimiya, BASELINE.md round-4), persistent for "
                        "sphere scenes")
    p.add_argument("--cap", type=int, default=0,
                   help="hybrid survivor batch width (0 = auto: slab/8)")
    p.add_argument("--pool-w", type=int, default=0,
                   help="hybrid secondary pool width (0 = auto: sized for "
                        "all primary survivors, see integrator/hybrid.py)")
    p.add_argument("--drain-ratio", type=int, default=2,
                   help="hybrid end-of-render cascade narrowing ratio")
    p.add_argument("--chunk-spp", type=int, default=0,
                   help="hybrid primary slab spp (0 = auto)")
    p.add_argument("--scene", type=str, default="10_final",
                   choices=["10_final", "yoimiya"],
                   help="10_final: sphere cover scene (headline); "
                        "yoimiya: 23k-tri mesh BVH workload")
    p.add_argument("--time1024", action="store_true",
                   help="report wall seconds to render 1024spp at 1080p "
                        "(the BASELINE.json time-to-quality metric), "
                        "chunked so no device call trips the watchdog")
    p.add_argument("--sweep-res", action="store_true",
                   help="resolution-scaling guard (round-4 verdict ask #5): "
                        "print one JSON line per resolution "
                        "(720p/1080p/1440p/4K at --spp) so a "
                        "resolution-dependent regression cannot hide "
                        "behind the 720p headline")
    p.add_argument("--flagship", action="store_true",
                   help="the reference's flagship mesh workload: Yoimiya at "
                        "3000x2000, 32 spp, depth 32 "
                        "(legacy/PT_in_one_weekend/15_module.py:36-44); "
                        "reports wall seconds for the full frame")
    args = p.parse_args()
    if args.time1024 and args.flagship:
        p.error("--time1024 and --flagship are mutually exclusive")
    if args.time1024:
        args.width, args.height, args.spp = 1920, 1080, 1024
    if args.flagship:
        args.scene = "yoimiya"
        args.width, args.height, args.spp = 3000, 2000, 32

    import os

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # Persistent XLA compile cache (keyed on HLO): full-graph compiles on
    # the tunneled TPU runtime take minutes; repeat bench runs of unchanged
    # code should not re-pay them.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_lpt_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from learn_path_tracing_tpu.integrator.persistent import render_persistent
    from learn_path_tracing_tpu.utils.benchlib import time_fn_async

    res = (args.width, args.height)
    if args.scene == "10_final":
        from learn_path_tracing_tpu.models import random_scene, stage10_camera

        wd = random_scene(seed=20230328).device()

        def make_cam(r):
            return stage10_camera(r).params()

        cp = make_cam(res)
        scene_kind, bsdf = "spheres", "modern"
        metric = "mrays_per_sec_chip_10final"
    else:
        import warnings

        from learn_path_tracing_tpu.camera import LegacyCamera
        from learn_path_tracing_tpu.scene.legacy_world import LegacyWorld
        from learn_path_tracing_tpu.stages.legacy_common import make_asset_path_map

        world = LegacyWorld()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            wd = world.load("/root/reference/legacy/Yoimiya.world.npy",
                            path_map=make_asset_path_map())
        def make_cam(r):
            cam = LegacyCamera(r)
            cam.set_fov(30)
            cam.set_position((0, 8, -30))
            cam.look_at((0, 8, 0))
            return cam.params()

        cp = make_cam(res)
        scene_kind, bsdf = "legacy", "legacy"
        metric = "bvh_mrays_per_sec_chip_yoimiya"

    # The legacy camera has no lens (aperture=0, focal=1): use the 'jitter'
    # model, bit-identical to degenerate thinlens (tests/test_camera.py) but
    # skips the disk sample + second RNG hash on every regen pass.
    cam_model = "jitter" if scene_kind == "legacy" else "thinlens"

    engine = args.engine
    if engine == "auto":
        # measured-best per scene (BASELINE.md round-4 engine matrix):
        # hybrid 14.1 vs persistent 12.5 on the yoimiya mesh; persistent
        # stays fastest on sphere scenes (the hybrid's dense primary
        # decomposition targets BVH workloads)
        engine = "hybrid" if scene_kind == "legacy" else "persistent"

    if engine == "hybrid":
        from learn_path_tracing_tpu.integrator.hybrid import render_hybrid

        def run(seed, spp=None, res=res, cp=cp):
            return render_hybrid(wd, cp, res, spp=spp or args.spp,
                                 limit=args.limit,
                                 seed=seed, bsdf=bsdf,
                                 camera_model=cam_model, scene=scene_kind,
                                 hit_backend=args.hit_backend,
                                 chunk_spp=args.chunk_spp, cap=args.cap,
                                 pool_w=args.pool_w,
                                 drain_ratio=args.drain_ratio)
    else:
        def run(seed, spp=None, res=res, cp=cp):
            return render_persistent(wd, cp, res, spp=spp or args.spp,
                                     limit=args.limit,
                                     seed=seed, bsdf=bsdf,
                                     camera_model=cam_model,
                                     scene=scene_kind,
                                     hit_backend=args.hit_backend,
                                     pool_mult=args.pool_mult,
                                     pool_div=args.pool_div)

    if args.time1024:
        import jax
        import jax.numpy as jnp

        # chunk the spp axis into separate device calls (watchdog-safe,
        # same RNG counters as one call — chunks pipeline via async
        # dispatch). 512 = ~23 s of device time per call: comfortably
        # under the 120 s watchdog while paying the tunnel's per-dispatch
        # overhead (measured ~2.75 s/call on a degraded relay day,
        # 2026-08-19) only twice. (The round-4 worker crash at this chunk
        # size was the flat one-hot accumulate's ~2.1 GB/pass operand —
        # fixed by the sliding-window accumulator, persistent.py round-5.)
        chunk = 512

        def run_chunk(seed):
            # distinct seed per chunk = plain progressive MC accumulation
            # (the stages/common.run_path_traced chunking pattern)
            return run(seed, spp=chunk)

        # warm-up compile + transfer path (block_until_ready can return
        # early on the tunneled runtime; a scalar readback is the only true
        # completion signal — see utils/benchlib)
        img, segs = run_chunk(-1)
        float(jnp.sum(img))
        # jitted accumulate — eager jnp adds on tunneled TPU arrays each
        # trigger a remote compile (minutes); one jitted add compiles once
        add = jax.jit(lambda a, b, s, t: (a + b, s + t))
        t0 = time.time()
        acc = None
        total_segs = jnp.float32(0.0)
        for s0 in range(0, args.spp, chunk):
            img, segs = run_chunk(s0)
            if acc is None:
                acc = img
                total_segs = segs
            else:
                acc, total_segs = add(acc, img, total_segs, segs)
        total_segs = float(total_segs) + float(jnp.sum(acc)) * 0.0
        dt = time.time() - t0
        print(json.dumps({
            "metric": f"seconds_to_1024spp_1080p_{args.scene}",
            "value": round(dt, 1),
            "unit": "s",
            "vs_baseline": round(float(total_segs) / dt / 1e8, 3),
        }))
        return 0

    if args.sweep_res:
        from learn_path_tracing_tpu.utils.benchlib import time_fn_async

        for r in ((1280, 720), (1920, 1080), (2560, 1440), (3840, 2160)):
            cpr = make_cam(r)
            dt, (img, segs) = time_fn_async(
                lambda seed: run(seed, res=r, cp=cpr), 0, iters=3, warmup=1)
            mrays = float(segs) / dt / 1e6
            print(json.dumps({
                "metric": f"{metric}_{r[0]}x{r[1]}_spp{args.spp}",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 100.0, 3),
            }), flush=True)
        return 0

    if args.flagship:
        # one frame = one device call (spp 32 fits the watchdog comfortably);
        # report wall seconds per frame, the reference's own unit
        import jax.numpy as jnp

        img, segs = run(-1)            # warm-up compile + transfer path
        float(jnp.sum(img))
        t0 = time.time()
        img, segs = run(0)
        total_segs = float(segs) + float(jnp.sum(img)) * 0.0
        dt = time.time() - t0
        print(json.dumps({
            "metric": "seconds_flagship_3000x2000_spp32_yoimiya",
            "value": round(dt, 2),
            "unit": "s",
            "vs_baseline": round(total_segs / dt / 1e6 / 100.0, 3),
        }))
        return 0

    # time_fn_async (queue N dispatches, force once) instead of time_fn:
    # time_fn subtracts a separately-measured readback latency, and on the
    # tunneled runtime that estimate can exceed the render time on a bad
    # relay day (measured: a pool_div sweep read a nonsense 648 Mrays/s).
    # For multi-second renders the single readback is <1% without any
    # subtraction.
    dt, (img, segs) = time_fn_async(run, 0, iters=3, warmup=1)
    mrays = float(segs) / dt / 1e6
    print(json.dumps({
        "metric": metric,
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
