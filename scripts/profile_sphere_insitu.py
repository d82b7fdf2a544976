"""In-situ headline telemetry: wall + pass counts for the 10_final bench
config (1280x720 spp64, auto pool) via render_persistent(stats=True).

Usage: python scripts/profile_sphere_insitu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import worldcache  # noqa: F401  (compile cache side effect)


def main():
    import jax.numpy as jnp

    from learn_path_tracing_tpu.integrator.persistent import render_persistent
    from learn_path_tracing_tpu.models import random_scene, stage10_camera

    res = (1280, 720)
    wd = random_scene(seed=20230328).device()
    cp = stage10_camera(res).params()

    def run(seed):
        return render_persistent(wd, cp, res, spp=64, limit=32, seed=seed,
                                 bsdf="modern", camera_model="thinlens",
                                 scene="spheres", stats=True)

    img, segs, st = run(-1)
    float(jnp.sum(img))
    t0 = time.time()
    img, segs, st = run(0)
    segs = float(segs) + float(jnp.sum(img)) * 0.0
    dt = time.time() - t0

    pool = st["pool"]
    pf = float(st["passes_full"])
    dw = st["drain_widths"]
    dp = [float(x) for x in st["drain_passes"]]
    work = pf * pool + sum(w * n for w, n in zip(dw, dp))
    print(f"wall {dt:7.3f} s   segments {segs/1e6:.2f} M -> "
          f"{segs/dt/1e6:.2f} Mrays/s")
    print(f"pool {pool}  passes_full {pf:.0f}")
    for w, n in zip(dw, dp):
        print(f"  drain {w:7d} {n:.0f} passes")
    print(f"occupancy {segs/max(work,1):.3f}   "
          f"mean {dt/(pf+sum(dp))*1e3:.3f} ms/pass over {pf+sum(dp):.0f}")


if __name__ == "__main__":
    main()
