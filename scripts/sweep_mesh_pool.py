"""Sweep persistent-pool sizing and drain ratio on the Yoimiya mesh bench.

The auto pool policy (POOL_FLOOR, n/16 on the 921k-lane headline) was tuned
on the sphere workload; mesh passes have different fixed costs (coherence
sort + latency-bound gathers), so the optimum may differ.

Usage:  python scripts/sweep_mesh_pool.py [--spp 64]
"""

import argparse
import os
import sys
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--spp", type=int, default=64)
    p.add_argument("--limit", type=int, default=32)
    p.add_argument("--pool-divs", type=str, default="1,2,4")
    p.add_argument("--drain-ratios", type=str, default="8")
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.integrator.persistent import render_persistent
    from learn_path_tracing_tpu.scene.legacy_world import LegacyWorld
    from learn_path_tracing_tpu.stages.legacy_common import make_asset_path_map
    from learn_path_tracing_tpu.utils.benchlib import time_fn

    res = (args.width, args.height)
    from worldcache import load_world
    wd = load_world()
    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))
    cp = cam.params()

    for dr in [int(x) for x in args.drain_ratios.split(",")]:
        for pd in [int(x) for x in args.pool_divs.split(",")]:
            def run(seed, pd=pd, dr=dr):
                return render_persistent(
                    wd, cp, res, spp=args.spp, limit=args.limit, seed=seed,
                    bsdf="legacy", scene="legacy", pool_div=pd,
                    drain_ratio=dr)

            try:
                dt, (img, segs) = time_fn(run, 0, iters=2)
            except Exception as e:  # noqa: BLE001 - report and continue sweep
                print(f"pool_div={pd} drain={dr}  FAILED: {e}", flush=True)
                continue
            mrays = float(segs) / dt / 1e6
            print(f"pool_div={pd} drain={dr}  {dt*1e3:8.1f} ms  "
                  f"{mrays:6.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
