"""Render a legacy character ``.world.npy`` on TPU and (when a golden
exists) statistically compare against the reference render.

Generalizes validate_yoimiya_tpu.py to all four characters. The reference
frames every character identically (camera (0,8,-30) -> (0,8,0), fov 30:
/root/reference/legacy/PT_in_one_weekend/15_module.py:1069-1072). Barbara
ships NO golden PNG in the snapshot (only Barbara.world.npy), so for it
this reports render statistics and writes the image for visual record.

Usage:
  python scripts/validate_character_tpu.py --world .../Barbara.world.npy \
      [--golden .../X.png] [--spp 128] [--scale 4] [--save-dir outputs/val]
"""

import argparse
import os
import sys
import time
import warnings

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--world", type=str, required=True)
    p.add_argument("--golden", type=str, default=None)
    p.add_argument("--spp", type=int, default=128)
    p.add_argument("--scale", type=int, default=4,
                   help="golden downsample factor (render res = golden/s)")
    p.add_argument("--width", type=int, default=750)
    p.add_argument("--height", type=int, default=500)
    p.add_argument("--chunk", type=int, default=32)
    p.add_argument("--save-dir", type=str, default=None)
    args = p.parse_args()

    import jax  # noqa: F401
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.core import image
    from learn_path_tracing_tpu.integrator.persistent import render_persistent
    from learn_path_tracing_tpu.scene.legacy_world import LegacyWorld
    from learn_path_tracing_tpu.stages.legacy_common import (
        companion_obj_for,
        make_asset_path_map,
    )

    stem = os.path.basename(args.world).split(".world.npy")[0]

    golden = None
    if args.golden:
        golden8 = np.asarray(Image.open(args.golden).convert("RGB"),
                             dtype=np.float64) / 255.0
        s = args.scale
        gh, gw, _ = golden8.shape
        res = (gw // s, gh // s)
        # linearize -> box average -> re-encode (radiance-correct pooling)
        lin = golden8 ** 2.2
        lin = lin[:res[1] * s, :res[0] * s]
        pooled = lin.reshape(res[1], s, res[0], s, 3).mean((1, 3))
        golden = pooled ** (1 / 2.2)
    else:
        res = (args.width, args.height)

    world = LegacyWorld()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        wd = world.load(args.world, path_map=make_asset_path_map(),
                        textures_from_obj=companion_obj_for(args.world))
    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))
    cp = cam.params()

    t0 = time.time()
    acc, segs = None, 0.0
    acc_fn = jax.jit(lambda a, i, w: a + i * w)
    for s0 in range(0, args.spp, args.chunk):
        n_s = min(args.chunk, args.spp - s0)
        img, sg = render_persistent(wd, cp, res, n_s, 32, s0, bsdf="legacy",
                                    scene="legacy")
        acc = acc_fn(jnp.zeros_like(img) if acc is None else acc,
                     img, float(n_s))
        segs += float(sg)
    ours_lin = np.asarray(acc / args.spp)
    dt = time.time() - t0
    # legacy display transform: pure gamma 1/2.2, no ACES (15_module.py:1019)
    ours_u8 = image.to_raster(np.clip(ours_lin, 0.0, 1.0) ** (1 / 2.2))
    ours = ours_u8.astype(np.float64) / 255.0

    mean_l = ours.mean()
    nonbg = float((ours.std(axis=-1) > 0.01).mean())
    print(f"{stem} {res[0]}x{res[1]} {args.spp}spp: "
          f"mean luma {mean_l:.3f}, chromatic px {nonbg:.1%}, "
          f"[{dt:.0f}s, {segs / dt / 1e6:.2f} Mrays/s]")

    if golden is not None:
        d = np.abs(ours - golden) * 255.0
        dm = d.mean(axis=-1)
        q99 = np.quantile(dm, 0.99)
        core = dm[dm <= q99]
        print(f"{stem} vs golden/{args.scale}x{args.scale}: "
              f"mean {d.mean():.2f}/255  p99 {np.quantile(d, 0.99):.2f}/255  "
              f"core-mean(excl top1%) {core.mean():.2f}/255")

    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)
        image.write_png(image.from_raster(ours_u8),
                        f"{args.save_dir}/{stem}_ours.png")
        if golden is not None:
            image.write_png(
                image.from_raster((golden * 255 + 0.5).astype(np.uint8)),
                f"{args.save_dir}/{stem}_golden_pooled.png")


if __name__ == "__main__":
    main()
