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
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from learn_path_tracing_tpu.integrator.wavefront import render
    from learn_path_tracing_tpu.models import random_scene, stage10_camera

    res = (args.width, args.height)
    world = random_scene(seed=20230328)
    cam = stage10_camera(res)
    wd = world.device()
    cp = cam.params()

    def run(spp, seed):
        img, segs = render(wd, cp, res, spp=spp, limit=args.limit, seed=seed,
                           hit_backend=args.hit_backend)
        jax.block_until_ready(img)
        return float(segs)

    # Warm-up: compile + first device->host transfer (slow on tunneled runtimes)
    run(args.spp, seed=1)

    t0 = time.time()
    segs = run(args.spp, seed=0)
    elapsed = time.time() - t0

    mrays = segs / elapsed / 1e6
    print(json.dumps({
        "metric": "bvh_mrays_per_sec_chip_10final",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
