"""Pass-count telemetry for the persistent integrator on the yoimiya
workload: how many full-width and per-drain-level passes a render takes,
to locate where wall time goes.

Usage:  python scripts/profile_drain.py [--spp 16] [--limit 32]
"""

import argparse
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--spp", type=int, default=16)
    p.add_argument("--limit", type=int, default=32)
    p.add_argument("--scene", type=str, default="yoimiya",
                   choices=["yoimiya", "10_final"])
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    args = p.parse_args()

    import jax.numpy as jnp

    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.integrator.persistent import render_persistent
    from learn_path_tracing_tpu.scene.legacy_world import LegacyWorld
    from learn_path_tracing_tpu.stages.legacy_common import make_asset_path_map

    res = (args.width, args.height)
    if args.scene == "yoimiya":
        world = LegacyWorld()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            wd = world.load("/root/reference/legacy/Yoimiya.world.npy",
                            path_map=make_asset_path_map())
        cam = LegacyCamera(res)
        cam.set_fov(30)
        cam.set_position((0, 8, -30))
        cam.look_at((0, 8, 0))
        cp = cam.params()
        bsdf, scene = "legacy", "legacy"
    else:
        from learn_path_tracing_tpu.models import random_scene, stage10_camera

        wd = random_scene(seed=20230328).device()
        cp = stage10_camera(res).params()
        bsdf, scene = "modern", "spheres"

    def run(seed):
        return render_persistent(wd, cp, res, args.spp, args.limit, seed,
                                 bsdf=bsdf, scene=scene, stats=True)

    img, segs, st = run(0)
    float(jnp.sum(img))  # warm compile + transfer
    t0 = time.time()
    img, segs, st = run(1)
    segs_v = float(segs)
    dt = time.time() - t0
    full = float(st["passes_full"])
    print(f"render {dt:.2f}s  segments={segs_v:.3e}  "
          f"mrays={segs_v/dt/1e6:.2f}")
    pool = int(st["pool"])   # auto policy may pick a fractional pool < n
    print(f"full-width passes: {full:.0f} at pool={pool} (= "
          f"{full * pool:.3e} lane-slots)")
    for w, c in zip(st["drain_widths"], st["drain_passes"]):
        print(f"  drain width {w:>7}: {float(c):5.0f} passes "
              f"({float(c) * w:.3e} lane-slots)")
    total_slots = full * pool + sum(
        float(c) * w for w, c in zip(st["drain_widths"], st["drain_passes"]))
    print(f"occupancy = segments / lane-slots = {segs_v / total_slots:.2%}")


if __name__ == "__main__":
    main()
