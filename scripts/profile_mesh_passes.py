"""Account for the yoimiya bench's wall time pass-by-pass.

full_pass_sec@57600 measures 2.19 ms, but the end-to-end bench implies
~5 ms per full-width pass. This prints the integrator's own telemetry
(passes, drain widths/passes, segments) and the wall time, so the gap is
attributable: full passes * measured pass cost vs drain passes vs
bookkeeping (accumulate, item_of, cond reductions) not in the profiler's
pass body.

Usage:  python scripts/profile_mesh_passes.py
"""

import os
import sys
import time
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

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

    def run(seed):
        return render_persistent(wd, cp, res, spp=64, limit=32, seed=seed,
                                 bsdf="legacy", scene="legacy", stats=True)

    dt, (img, segs, st) = time_fn(run, 0, iters=2)
    pool = st["pool"]
    pf = float(st["passes_full"])
    dw = st["drain_widths"]
    dp = [float(x) for x in st["drain_passes"]]
    segs = float(segs)
    print(f"wall {dt * 1e3:.1f} ms  segments {segs / 1e6:.2f} M  "
          f"-> {segs / dt / 1e6:.2f} Mrays/s")
    print(f"pool {pool}  full passes {pf:.0f}  "
          f"drain widths {dw}  drain passes {dp}")
    print(f"full-pass lane-work {pf * pool / 1e6:.1f} M lanes; drain "
          f"lane-work {sum(w * p for w, p in zip(dw, dp)) / 1e6:.1f} M")
    print(f"implied per-full-pass {dt / (pf + sum(dp)) * 1e3:.2f} ms "
          f"(uniform); at 2.19 ms/pass the full phase alone = "
          f"{pf * 2.19:.0f} ms")


if __name__ == "__main__":
    main()
