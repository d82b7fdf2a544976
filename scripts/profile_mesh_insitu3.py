"""Round-3 in-situ yoimiya profile: wall time + pass telemetry in one run.

Times render_persistent(stats=True) on the bench yoimiya config, then
reports passes, occupancy, and the implied mean cost per full-width and
drain pass — the numbers the round-2 profilers disagreed on (3.8 ms/pass
in-loop vs ~12 Mrays/s end-to-end do not reconcile at 61%% occupancy).

Usage: python scripts/profile_mesh_insitu3.py [--spp 64] [--pool-div 0]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--spp", type=int, default=64)
    p.add_argument("--limit", type=int, default=32)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--pool-div", type=int, default=0)
    p.add_argument("--pool-mult", type=int, default=0)
    args = p.parse_args()

    import jax.numpy as jnp

    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.integrator.persistent import render_persistent
    from worldcache import load_world

    res = (args.width, args.height)
    wd = load_world()
    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))
    cp = cam.params()

    def run(seed):
        return render_persistent(
            wd, cp, res, spp=args.spp, limit=args.limit, seed=seed,
            bsdf="legacy", camera_model="jitter", scene="legacy",
            pool_div=args.pool_div, pool_mult=args.pool_mult, stats=True)

    img, segs, st = run(-1)
    float(jnp.sum(img))  # true completion sync on the tunnel
    t0 = time.time()
    img, segs, st = run(0)
    segs = float(segs) + float(jnp.sum(img)) * 0.0
    dt = time.time() - t0

    pool = st["pool"]
    pf = float(st["passes_full"])
    dw = st["drain_widths"]
    dp = [float(x) for x in st["drain_passes"]]
    total_lane_work = pf * pool + sum(w * np for w, np in zip(dw, dp))
    print(f"wall            {dt:8.3f} s   segments {segs/1e6:.2f} M  "
          f"-> {segs/dt/1e6:.2f} Mrays/s")
    print(f"pool            {pool}")
    print(f"passes_full     {pf:.0f}")
    for w, np_ in zip(dw, dp):
        print(f"  drain {w:7d} {np_:.0f} passes")
    print(f"occupancy       {segs / max(total_lane_work, 1):.3f} "
          f"(segments / lane-slots)")
    if pf:
        # rough split assuming drain passes cost ~width-proportional floor
        print(f"mean cost if full passes only: {dt/ (pf + sum(dp)) * 1e3:.2f} "
              f"ms/pass over {pf + sum(dp):.0f} passes")


if __name__ == "__main__":
    main()
