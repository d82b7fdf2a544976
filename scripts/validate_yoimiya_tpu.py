"""Statistical parity check of the legacy Yoimiya render against the
reference golden (/root/reference/legacy/Yoimiya.png, 3000x2000, 8192 spp).

Rendering 6M pixels to convergence on one chip is slow, so the comparison
runs at 750x500 (a 4x4-downsampled view of the same camera): our render's
AA jitter integrates radiance over each coarse pixel's footprint, and the
golden is linearized (gamma 2.2 -> radiance), 4x4 box-averaged, and
re-encoded — the same quantity up to the Jensen gap of the gamma curve at
edge pixels (documented caveat; errors are reported both overall and with
the top-1% edge pixels excluded).

Usage:  python scripts/validate_yoimiya_tpu.py [--spp 128] [--scale 4]
"""

import argparse
import sys
import time
import warnings

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--spp", type=int, default=128)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--chunk", type=int, default=32)
    p.add_argument("--world", type=str,
                   default="/root/reference/legacy/Yoimiya.world.npy")
    p.add_argument("--golden", type=str,
                   default="/root/reference/legacy/Yoimiya_pose.png")
    p.add_argument("--save-dir", type=str, default=None)
    args = p.parse_args()

    import jax
    import numpy as np
    from PIL import Image

    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.core import image
    from learn_path_tracing_tpu.integrator.persistent import render_persistent
    from learn_path_tracing_tpu.scene.legacy_world import LegacyWorld
    from learn_path_tracing_tpu.stages.legacy_common import make_asset_path_map

    golden8 = np.asarray(Image.open(args.golden).convert("RGB"),
                         dtype=np.float64) / 255.0
    s = args.scale
    gh, gw, _ = golden8.shape
    res = (gw // s, gh // s)
    # linearize -> box average over s x s -> re-encode (radiance-correct)
    lin = golden8 ** 2.2
    lin = lin[:res[1] * s, :res[0] * s]
    pooled = lin.reshape(res[1], s, res[0], s, 3).mean((1, 3))
    golden = pooled ** (1 / 2.2)   # [h, w, 3] raster

    from learn_path_tracing_tpu.stages.legacy_common import companion_obj_for

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

    import jax.numpy as jnp

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
    # legacy display transform: pure gamma 1/2.2, no ACES (15_module.py:1019)
    ours_lin = np.asarray(acc / args.spp)
    dt = time.time() - t0
    ours_u8 = image.to_raster(np.clip(ours_lin, 0.0, 1.0) ** (1 / 2.2))
    ours = ours_u8.astype(np.float64) / 255.0

    d = np.abs(ours - golden) * 255.0
    dm = d.mean(axis=-1)
    q99 = np.quantile(dm, 0.99)
    core = dm[dm <= q99]
    print(f"yoimiya {res[0]}x{res[1]} {args.spp}spp vs golden/{s}x{s}: "
          f"mean {d.mean():.2f}/255  p99 {np.quantile(d, 0.99):.2f}/255  "
          f"core-mean(excl top1%) {core.mean():.2f}/255  "
          f"[{dt:.0f}s, {segs/dt/1e6:.2f} Mrays/s]")
    if args.save_dir:
        import os

        os.makedirs(args.save_dir, exist_ok=True)
        image.write_png(image.from_raster(ours_u8),
                        f"{args.save_dir}/yoimiya_ours.png")
        image.write_png(
            image.from_raster((golden * 255 + 0.5).astype(np.uint8)),
            f"{args.save_dir}/yoimiya_golden_pooled.png")
        heat = (np.clip(dm / 16.0, 0.0, 1.0) * 255 + 0.5).astype(np.uint8)
        image.write_png(image.from_raster(np.stack([heat] * 3, -1)),
                        f"{args.save_dir}/yoimiya_diff.png")


if __name__ == "__main__":
    main()
