"""Attribute the persistent path's 720p->1080p throughput loss (round-4
verdict weak #1): render both resolutions with stats, report pass counts,
wall, per-pass cost, and the standalone accumulate cost at each shape.

Usage:  python scripts/profile_res_scaling.py [--spp 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--spp", type=int, default=64)
    p.add_argument("--acc-split", type=int, default=0)
    p.add_argument("--pool-div", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from learn_path_tracing_tpu.integrator.persistent import render_persistent
    from learn_path_tracing_tpu.models import random_scene, stage10_camera

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_lpt_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    wd = random_scene(seed=20230328).device()

    for res in ((1280, 720), (1920, 1080)):
        cp = stage10_camera(res).params()

        def run(seed):
            return render_persistent(
                wd, cp, res, spp=args.spp, limit=32, seed=seed,
                bsdf="modern", camera_model="thinlens", scene="spheres",
                acc_split=args.acc_split, pool_div=args.pool_div,
                stats=True)

        img, segs, st = run(-1)
        float(jnp.sum(img))
        t0 = time.time()
        img, segs, st = run(0)
        tot = float(segs) + float(jnp.sum(img)) * 0.0
        dt = time.time() - t0
        n = res[0] * res[1]
        full = float(st["passes_full"])
        drains = [float(x) for x in st["drain_passes"]]
        pool = st["pool"]
        items = -(-(n * args.spp) // pool)
        # weighted pass cost: drains at width w cost ~w/pool of a full pass
        eq_full = full + sum(
            dp * w / pool for dp, w in zip(drains, st["drain_widths"]))
        print(f"{res[0]}x{res[1]}: pool={pool} items={items} "
              f"wall={dt:.3f}s segs={tot/1e6:.1f}M "
              f"mrays={tot/dt/1e6:.1f}")
        print(f"  passes_full={full:.0f} drain={drains} "
              f"widths={st['drain_widths']}")
        print(f"  eq_full_passes={eq_full:.0f} -> "
              f"{dt/eq_full*1e3:.3f} ms/eq-pass; "
              f"occupancy={tot/(full*pool + sum(dp*w for dp, w in zip(drains, st['drain_widths']))):.2%}",
              flush=True)


if __name__ == "__main__":
    main()
