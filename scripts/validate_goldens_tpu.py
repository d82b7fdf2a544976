"""Statistical golden validation against the reference's MC renders (TPU job).

The deterministic stages (1-4) are matched pixel-exactly in tests/. The
Monte-Carlo stages can only match statistically (different RNG than
ti.random()); this script renders stages 5-9 at the goldens' resolutions
with a few hundred spp and reports per-pixel error stats. Run on TPU:

    python scripts/validate_goldens_tpu.py [--spp 512] [--stages 5,6,7,8,9]

Pass criteria (printed per stage): mean |diff| and p99 |diff| in 8-bit units.
Expected: mean < ~2/255 (MC noise + ACES rounding), p99 < ~8/255.
Stage 10 is excluded — its scene layout uses the reference's unseeded host
RNG, so per-pixel comparison is meaningless (channel means are compared
instead).
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--spp", type=int, default=512)
    p.add_argument("--stages", type=str, default="5,6,7,8,9,10")
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--save-dir", type=str, default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np
    import jax.numpy as jnp

    from learn_path_tracing_tpu.camera import Camera
    from learn_path_tracing_tpu.core import color, image
    from learn_path_tracing_tpu.integrator.persistent import render_persistent
    from learn_path_tracing_tpu.models import (
        random_scene, stage4_scene, stage6_scene, stage7_scene, stage8_scene,
        stage10_camera,
    )
    from learn_path_tracing_tpu.stages.common import render_normal_shaded_aa

    golden_dir = "/root/reference/outputs"

    def compare(img, name, note=""):
        golden = image.read_png(f"{golden_dir}/{name}")
        ours = image.from_raster(image.to_raster(np.asarray(img)))
        d = np.abs(ours - golden) * 255.0
        print(f"{name}: mean {d.mean():.2f}/255  p99 "
              f"{np.quantile(d, 0.99):.2f}/255  max {d.max():.0f}/255 {note}")
        if args.save_dir:
            os.makedirs(args.save_dir, exist_ok=True)
            image.write_png(ours, os.path.join(args.save_dir, name))
            heat = np.clip(d.mean(axis=-1) / 16.0, 0.0, 1.0)
            image.write_png(np.stack([heat] * 3, axis=-1),
                            os.path.join(args.save_dir, "diff_" + name))

    stages = {int(s) for s in args.stages.split(",")}

    if 5 in stages:
        res = (320, 180)
        cam = Camera(res)
        cam.set_direction(0, 0)
        cam.set_position((0, 0, 3))
        img = render_normal_shaded_aa(stage4_scene().device(), cam.params(),
                                      res, 100)
        compare(img, "5_anti_aliasing.png")

    def pt_stage(scene, cam, name, bsdf="modern"):
        res = cam.resolution
        t0 = time.time()
        # chunk long renders (seed-per-chunk progressive accumulation) so no
        # single device call outlives the TPU watchdog
        chunk = min(args.spp, 512)
        acc, segs = None, 0.0
        acc_fn = jax.jit(lambda a, i, w: a + i * w)
        for s0 in range(0, args.spp, chunk):
            s = min(chunk, args.spp - s0)
            img, sg = render_persistent(scene.device(), cam.params(), res,
                                        s, 32, s0, bsdf=bsdf)
            acc = acc_fn(jnp.zeros_like(img) if acc is None else acc,
                         img, float(s))
            segs += float(sg)
        img = jax.jit(color.post_process)(acc / args.spp)
        img = np.asarray(img)
        dt = time.time() - t0
        compare(img, name,
                note=f"[{args.spp}spp vs 8192spp golden, {dt:.0f}s, "
                     f"{segs/dt/1e6:.1f} Mrays/s]")

    if 6 in stages:
        cam = Camera((1280, 720))
        cam.set_direction(0, 0)
        cam.set_position((0, 0, 4))
        pt_stage(stage6_scene(), cam, "6_diffuse.png", bsdf="diffuse")
    if 7 in stages:
        cam = Camera((1280, 720))
        cam.set_direction(0, 0)
        cam.set_position((0, 0, 4))
        pt_stage(stage7_scene(), cam, "7_reflect.png")
    if 8 in stages:
        cam = Camera((1280, 720))
        cam.set_direction(0, 0)
        cam.set_position((0, 0.4, 4))
        pt_stage(stage8_scene(), cam, "8_refract.png")
    if 9 in stages:
        cam = Camera((1280, 720))
        cam.set_position((3, 0.5, 2))
        cam.look_at((0, 0.35, 0))
        cam.set_len(math.sqrt(3 ** 2 + 0.5 ** 2 + 2 ** 2), 0.2)
        pt_stage(stage8_scene(), cam, "9_dof.png")
    if 10 in stages:
        # The reference scene uses the unseeded host RNG (10_final:12-45), so
        # per-pixel comparison is impossible; instead check the golden's
        # channel means fall inside the seed-to-seed spread of the scene
        # distribution (several seeds, reduced res — layout variance
        # dominates resolution).
        res = (640, 360)
        cam = stage10_camera(res)
        means = []
        for sd in (20230328, 7, 1234, 999):
            img, _ = render_persistent(random_scene(seed=sd).device(),
                                       cam.params(), res,
                                       min(args.spp, 256), 32, 0)
            img = np.asarray(jax.jit(color.post_process)(img))
            means.append(img.mean((0, 1)))
        means = np.stack(means)
        golden = image.read_png(f"{golden_dir}/10_final.png")
        g = golden.mean((0, 1))
        lo, hi = means.min(0), means.max(0)
        inside = bool(np.all(g >= lo - 0.02) and np.all(g <= hi + 0.02))
        print(f"10_final.png: golden channel means {g.round(4)} vs "
              f"4-seed range [{lo.round(4)}, {hi.round(4)}] -> "
              f"{'CONSISTENT' if inside else 'OUTSIDE RANGE'} "
              f"(scene layout is unseeded in the reference)")


if __name__ == "__main__":
    main()
