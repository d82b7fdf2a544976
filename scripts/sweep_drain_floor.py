"""Sweep the drain cascade's width floor on the Yoimiya mesh bench.

Motivation (2026-08-18, profile_insitu + profile_mesh_passes): full
57.6k-lane passes cost 2.58 ms in situ, but the 115 drain passes at widths
7424/1024/256 averaged ~6 ms — packet traversal cost is set by the block's
node union, not lane count, so narrowing stops paying. Measures end-to-end
Mrays/s per floor.

Usage:  python scripts/sweep_drain_floor.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.integrator.persistent import render_persistent
    from learn_path_tracing_tpu.utils.benchlib import time_fn

    res = (640, 360)
    from worldcache import load_world
    wd = load_world()
    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))
    cp = cam.params()

    for floor in (256, 1024, 4096, 8192, 1 << 30):
        def run(seed, floor=floor):
            return render_persistent(wd, cp, res, spp=64, limit=32, seed=seed,
                                     bsdf="legacy", scene="legacy",
                                     drain_floor=floor, stats=True)

        dt, (img, segs, st) = time_fn(run, 0, iters=2)
        segs = float(segs)
        dp = [int(x) for x in st["drain_passes"]]
        print(f"floor {floor:>10d}  {segs / dt / 1e6:6.2f} Mrays/s  "
              f"wall {dt * 1e3:7.1f} ms  full {int(st['passes_full'])}  "
              f"drain {list(st['drain_widths'])}x{dp}", flush=True)


if __name__ == "__main__":
    main()
