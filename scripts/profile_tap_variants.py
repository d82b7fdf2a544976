"""Ablate strip-atlas tap formulations to find the cheapest TPU lowering.

Variants (semantically identical bilinear tap):
  current   — 2 row gathers, f32 lerp of full rows, 15-slice one-hot pair
  bf16      — same but rows stay bf16 through lerp+pair; f32 only at end
  texel4    — table reshaped [R*T, C]; 4 texel-level gathers, no pair loop
  along     — 2 row gathers + take_along_axis pair select on [N, T, C]

Usage:  python scripts/profile_tap_variants.py [--n 230400]
"""

import argparse
import os
import sys
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=230400)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from learn_path_tracing_tpu.io.texture import sample_bilinear_strips
    from learn_path_tracing_tpu.scene.legacy_world import LegacyWorld
    from learn_path_tracing_tpu.stages.legacy_common import make_asset_path_map
    from learn_path_tracing_tpu.utils.benchlib import time_fn

    world = LegacyWorld()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        wd = world.load("/root/reference/legacy/Yoimiya.world.npy",
                        path_map=make_asset_path_map())
    atlas = wd.atlas
    c = 8
    texels = atlas.table.shape[1] // c
    stride = texels - 1

    n = args.n
    u = jax.random.uniform(jax.random.PRNGKey(1), (n,))
    v = jax.random.uniform(jax.random.PRNGKey(2), (n,))
    tex = jax.random.randint(jax.random.PRNGKey(3), (n,), 0,
                             atlas.info_low.shape[0], dtype=jnp.int32)

    # texel-level table for the texel4 variant: [R*T, C]
    table_tx = jnp.asarray(
        np.asarray(atlas.table, np.float32).reshape(-1, c), atlas.table.dtype)

    def coords(atlas, tex_id, u, v):
        low = jnp.take(atlas.info_low, tex_id, axis=0)
        high = jnp.take(atlas.info_high, tex_id, axis=0)
        base = jnp.take(atlas.base, tex_id, axis=0)
        spr = jnp.take(atlas.spr, tex_id, axis=0)
        wpix = high[:, 0] - low[:, 0]
        hpix = high[:, 1] - low[:, 1]
        uu = u * wpix.astype(jnp.float32) - 0.5
        vv = v * hpix.astype(jnp.float32) - 0.5
        l = uu.astype(jnp.int32)
        b = vv.astype(jnp.int32)
        wl = ((l + 1).astype(jnp.float32) - uu)
        wb = ((b + 1).astype(jnp.float32) - vv)
        lm = jnp.mod(l, wpix)
        sx = lm // stride
        off = lm - sx * stride
        by = jnp.mod(b, hpix)
        ty = jnp.mod(b + 1, hpix)
        return base, spr, sx, off, by, ty, wl, wb

    @jax.jit
    def cur(table, lowv, highv, basev, sprv, tex, u, v):
        from learn_path_tracing_tpu.io.texture import StripAtlas
        a = StripAtlas(table=table, info_low=lowv, info_high=highv,
                       base=basev, spr=sprv)
        return sample_bilinear_strips(a, tex, u, v, channels=c)

    @jax.jit
    def bf16(table, lowv, highv, basev, sprv, tex, u, v):
        from learn_path_tracing_tpu.io.texture import StripAtlas
        a = StripAtlas(table=table, info_low=lowv, info_high=highv,
                       base=basev, spr=sprv)
        base, spr, sx, off, by, ty, wl, wb = coords(a, tex, u, v)
        row_b = jnp.take(table, base + by * spr + sx, axis=0)
        row_t = jnp.take(table, base + ty * spr + sx, axis=0)
        wbh = wb[:, None].astype(table.dtype)
        row = wbh * row_b + (1 - wbh) * row_t          # bf16 lerp
        pair = jnp.zeros((n, 2 * c), table.dtype)
        for j in range(stride):
            m = (off == j)[:, None]
            pair = pair + jnp.where(m, row[:, j * c:(j + 2) * c], 0)
        pair = pair.astype(jnp.float32)
        return wl[:, None] * pair[:, :c] + (1 - wl[:, None]) * pair[:, c:]

    @jax.jit
    def texel4(table_tx, lowv, highv, basev, sprv, tex, u, v):
        from learn_path_tracing_tpu.io.texture import StripAtlas
        a = StripAtlas(table=atlas.table, info_low=lowv, info_high=highv,
                       base=basev, spr=sprv)
        base, spr, sx, off, by, ty, wl, wb = coords(a, tex, u, v)
        rb = (base + by * spr + sx) * texels + off
        rt = (base + ty * spr + sx) * texels + off
        t00 = jnp.take(table_tx, rb, axis=0).astype(jnp.float32)
        t01 = jnp.take(table_tx, rb + 1, axis=0).astype(jnp.float32)
        t10 = jnp.take(table_tx, rt, axis=0).astype(jnp.float32)
        t11 = jnp.take(table_tx, rt + 1, axis=0).astype(jnp.float32)
        wlc, wbc = wl[:, None], wb[:, None]
        return (wbc * (wlc * t00 + (1 - wlc) * t01)
                + (1 - wbc) * (wlc * t10 + (1 - wlc) * t11))

    @jax.jit
    def along(table, lowv, highv, basev, sprv, tex, u, v):
        from learn_path_tracing_tpu.io.texture import StripAtlas
        a = StripAtlas(table=table, info_low=lowv, info_high=highv,
                       base=basev, spr=sprv)
        base, spr, sx, off, by, ty, wl, wb = coords(a, tex, u, v)
        row_b = jnp.take(table, base + by * spr + sx, axis=0)
        row_t = jnp.take(table, base + ty * spr + sx, axis=0)
        wbh = wb[:, None].astype(table.dtype)
        row = (wbh * row_b + (1 - wbh) * row_t).reshape(n, texels, c)
        idx = off[:, None, None]
        p0 = jnp.take_along_axis(row, jnp.broadcast_to(idx, (n, 1, c)),
                                 axis=1)[:, 0]
        p1 = jnp.take_along_axis(row, jnp.broadcast_to(idx + 1, (n, 1, c)),
                                 axis=1)[:, 0]
        p0, p1 = p0.astype(jnp.float32), p1.astype(jnp.float32)
        return wl[:, None] * p0 + (1 - wl[:, None]) * p1

    funcs = [
        ("current", cur, (atlas.table,)),
        ("bf16_pair", bf16, (atlas.table,)),
        ("texel4", texel4, (table_tx,)),
        ("take_along", along, (atlas.table,)),
    ]
    ref = None
    for name, f, t0 in funcs:
        fa = t0 + (atlas.info_low, atlas.info_high, atlas.base, atlas.spr,
                   tex, u, v)
        dt, out = time_fn(f, *fa, iters=4)
        if ref is None:
            ref = out
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"{name:12s} {dt * 1e3:8.2f} ms  ({n / dt / 1e6:8.1f} "
              f"Mlanes/s)  maxerr={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
