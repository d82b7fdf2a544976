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
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--spp", type=int, default=512)
    p.add_argument("--stages", type=str, default="5,6,7,8,9,10")
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

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
        img, segs = render_persistent(scene.device(), cam.params(), res,
                                      args.spp, 32, 0, bsdf=bsdf)
        img = jax.jit(color.post_process)(img)
        img = np.asarray(img)
        dt = time.time() - t0
        compare(img, name,
                note=f"[{args.spp}spp vs 8192spp golden, {dt:.0f}s, "
                     f"{float(segs)/dt/1e6:.1f} Mrays/s]")

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
        import numpy as np

        res = (1280, 720)
        cam = stage10_camera(res)
        img, _ = render_persistent(random_scene(seed=20230328).device(),
                                   cam.params(), res, args.spp, 32, 0)
        import jax

        img = np.asarray(jax.jit(color.post_process)(img))
        golden = image.read_png(f"{golden_dir}/10_final.png")
        print(f"10_final.png: channel means ours "
              f"{np.asarray(img).mean((0, 1)).round(4)} vs golden "
              f"{golden.mean((0, 1)).round(4)} (scene seed differs — "
              f"statistical comparison only)")


if __name__ == "__main__":
    main()
