"""Iteration bench for the hybrid integrator on the Yoimiya config.

Loads the cached device world (worldcache) so repeat runs skip the host
BVH build, and the persistent XLA compile cache so unchanged graphs skip
the 8-10 minute tunnel compile. Prints Mrays/s for each requested config.

Usage: python scripts/bench_hybrid.py [--spp 64] [--engines hybrid,persistent]
       [--configs "chunk:cap:poolw:ratio,..."]  (0 = auto per knob)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--spp", type=int, default=64)
    p.add_argument("--limit", type=int, default=32)
    p.add_argument("--engines", type=str, default="hybrid")
    p.add_argument("--configs", type=str, default="0:0:0:8",
                   help="hybrid chunk_spp:cap:pool_w:drain_ratio list")
    p.add_argument("--res", type=str, default="640x360")
    p.add_argument("--stats", action="store_true",
                   help="hybrid: also run the stats variant (extra compile)")
    args = p.parse_args()

    import jax.numpy as jnp

    from learn_path_tracing_tpu.camera import LegacyCamera
    from worldcache import load_world

    w, h = (int(v) for v in args.res.split("x"))
    res = (w, h)
    wd = load_world()
    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))
    cp = cam.params()

    def measure(name, fn):
        t0 = time.time()
        img, segs = fn(-1)   # warm-up compile
        float(jnp.sum(img))
        print(f"{name}: compile+warm {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        img, segs = fn(0)
        segs_f = float(segs) + float(jnp.sum(img)) * 0.0
        dt = time.time() - t0
        print(f"{name}: {segs_f/dt/1e6:8.2f} Mrays/s  "
              f"({segs_f/1e6:.1f} Msegs, {dt:.2f} s)", flush=True)

    engines = [e for e in args.engines.split(",") if e]
    if "persistent" in engines:
        from learn_path_tracing_tpu.integrator.persistent import (
            render_persistent)

        measure("persistent", lambda seed: render_persistent(
            wd, cp, res, spp=args.spp, limit=args.limit, seed=seed,
            bsdf="legacy", camera_model="jitter", scene="legacy"))
    if "hybrid" in engines:
        from learn_path_tracing_tpu.integrator.hybrid import render_hybrid

        for cfg in [c for c in args.configs.split(",") if c]:
            ch, cap, pw, ra = (int(v) for v in cfg.split(":"))
            measure(f"hybrid[{cfg}]", lambda seed, ch=ch, cap=cap, pw=pw,
                    ra=ra: render_hybrid(
                wd, cp, res, spp=args.spp, limit=args.limit, seed=seed,
                bsdf="legacy", camera_model="jitter", scene="legacy",
                chunk_spp=ch, cap=cap, pool_w=pw, drain_ratio=ra))
            if args.stats:
                img, segs, st = render_hybrid(
                    wd, cp, res, spp=args.spp, limit=args.limit, seed=0,
                    bsdf="legacy", camera_model="jitter", scene="legacy",
                    chunk_spp=ch, cap=cap, pool_w=pw, drain_ratio=ra,
                    stats=True)
                st = {k: (float(v) if hasattr(v, "item") else v)
                      for k, v in st.items()}
                print(f"hybrid[{cfg}] stats: {st}", flush=True)


if __name__ == "__main__":
    main()
