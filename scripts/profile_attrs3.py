"""Decompose the attrs block's 73 ns/row: tap vs gathers vs texel loop.

profile_gather2 showed the two row gathers cost only ~25 ns/row combined
(tri 7.8 + atlas 17), yet the attrs block measures 73 ns/row — this times
sample_bilinear_strips and its pieces to find the rest.

Usage: python scripts/profile_attrs3.py [--n 231424]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=231424)
    p.add_argument("--iters", type=int, default=32)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from learn_path_tracing_tpu.io.texture import sample_bilinear_strips
    from learn_path_tracing_tpu.scene.legacy_world import _attrs_block
    from learn_path_tracing_tpu.utils.benchlib import time_fn_async
    from worldcache import load_world

    N = args.n
    wd = load_world()
    atlas = wd.atlas
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (N,), jnp.float32)
    v = jax.random.uniform(key, (N,), jnp.float32)
    tex = jnp.zeros((N,), jnp.int32)
    pidx = jax.random.randint(key, (N,), 0, wd.tri_attr.shape[0], jnp.int32)
    src = jnp.ones((N,), jnp.int32)
    point = jax.random.normal(key, (N, 3), jnp.float32)
    hitm = jnp.ones((N,), bool)

    @jax.jit
    def full_attrs(wd, point, pidx, src, hitm):
        return _attrs_block(wd, point, pidx, src, hitm)

    dt, _ = time_fn_async(full_attrs, wd, point, pidx, src, hitm,
                          iters=args.iters)
    print(f"_attrs_block@{N}:        {dt*1e3:7.2f} ms "
          f"({dt/N*1e9:5.1f} ns/row)", flush=True)

    @jax.jit
    def tap(atlas, tex, u, v):
        return sample_bilinear_strips(atlas, tex, u, v, channels=8)

    dt, _ = time_fn_async(tap, atlas, tex, u, v, iters=args.iters)
    print(f"sample_bilinear_strips:  {dt*1e3:7.2f} ms "
          f"({dt/N*1e9:5.1f} ns/row)", flush=True)

    # tap minus the texel one-hot loop: gather pair row + y-lerp only
    @jax.jit
    def tap_rows_only(atlas, tex, u, v):
        c = 8
        texels = atlas.table.shape[1] // (2 * c)
        info = jnp.broadcast_to(atlas.info[0][None, :], (N, 4))
        wpix, hpix, base, spr = (info[:, 0], info[:, 1], info[:, 2],
                                 info[:, 3])
        uu = u * wpix.astype(jnp.float32) - 0.5
        vv = v * hpix.astype(jnp.float32) - 0.5
        l = uu.astype(jnp.int32)
        b = vv.astype(jnp.int32)
        wb = ((b + 1).astype(jnp.float32) - vv)[:, None]
        sx = l // (texels - 1)
        by = b % jnp.maximum(hpix, 1)
        tc = texels * c
        pair_row = jnp.take(atlas.table, base + by * spr + sx, axis=0)
        pair_row = jax.lax.optimization_barrier(pair_row)
        row_b, row_t = pair_row[:, :tc], pair_row[:, tc:]
        return (wb * row_b.astype(jnp.float32)
                + (1.0 - wb) * row_t.astype(jnp.float32))

    dt, _ = time_fn_async(tap_rows_only, atlas, tex, u, v, iters=args.iters)
    print(f"tap rows+ylerp (barrier):     {dt*1e3:7.2f} ms "
          f"({dt/N*1e9:5.1f} ns/row)", flush=True)

    # the texel one-hot selection loop alone (on a materialized row)
    row = jnp.abs(jax.random.normal(key, (N, 128), jnp.float32))
    off = jax.random.randint(key, (N,), 0, 15, jnp.int32)

    @jax.jit
    def texel_loop(row, off):
        c = 8
        pair = jnp.zeros((N, 2 * c), jnp.float32)
        for j in range(15):
            m = (off == j).astype(jnp.float32)[:, None]
            pair = pair + m * row[:, j * c:(j + 2) * c]
        return pair

    dt, _ = time_fn_async(texel_loop, row, off, iters=args.iters)
    print(f"texel one-hot loop:      {dt*1e3:7.2f} ms "
          f"({dt/N*1e9:5.1f} ns/row)", flush=True)

    # tri-attr row gather + barycentric math alone
    @jax.jit
    def tri_part(wd, point, pidx):
        from learn_path_tracing_tpu.geometry.triangle import (
            triangle_barycentrics)

        row = jnp.take(wd.tri_attr, pidx, axis=0)
        row = jax.lax.optimization_barrier(row)
        p1, p2, p3 = row[:, 0:3], row[:, 3:6], row[:, 6:9]
        n0, n1, n2 = row[:, 9:12], row[:, 12:15], row[:, 15:18]
        uv0, uv1, uv2 = row[:, 18:20], row[:, 20:22], row[:, 22:24]
        w1, w2, w3 = triangle_barycentrics(p1, p2, p3, point)
        sm_n = w1[:, None] * n0 + w2[:, None] * n1 + w3[:, None] * n2
        sm_uv = w1[:, None] * uv0 + w2[:, None] * uv1 + w3[:, None] * uv2
        return sm_n, sm_uv

    dt, _ = time_fn_async(tri_part, wd, point, pidx, iters=args.iters)
    print(f"tri row+bary (barrier):  {dt*1e3:7.2f} ms "
          f"({dt/N*1e9:5.1f} ns/row)", flush=True)


if (__name__ == "__main__" and "--sub" not in __import__("sys").argv
        and "--staged" not in __import__("sys").argv
        and "--transposed" not in __import__("sys").argv
        and "--tc" not in __import__("sys").argv):
    main()


def sub_ablation():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=231424)
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--sub", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from learn_path_tracing_tpu.geometry.triangle import (
        triangle_barycentrics)
    from learn_path_tracing_tpu.utils.benchlib import time_fn_async
    from worldcache import load_world

    N = args.n
    wd = load_world()
    key = jax.random.PRNGKey(0)
    pidx = jax.random.randint(key, (N,), 0, wd.tri_attr.shape[0], jnp.int32)
    point = jax.random.normal(key, (N, 3), jnp.float32)
    row0 = jnp.take(wd.tri_attr, pidx, axis=0)
    parts = [row0[:, i * 3:(i + 1) * 3] for i in range(6)]
    uvs = [row0[:, 18 + i * 2:20 + i * 2] for i in range(3)]

    @jax.jit
    def slices_only(row):
        acc = jnp.zeros((N, 3), jnp.float32)
        for i in range(6):
            acc = acc + row[:, i * 3:(i + 1) * 3]
        acc2 = jnp.zeros((N, 2), jnp.float32)
        for i in range(3):
            acc2 = acc2 + row[:, 18 + i * 2:20 + i * 2]
        return acc, acc2

    dt, _ = time_fn_async(slices_only, row0, iters=args.iters)
    print(f"row slices only:        {dt*1e3:7.2f} ms "
          f"({dt/N*1e9:5.1f} ns/row)", flush=True)

    @jax.jit
    def math_only(p1, p2, p3, n0, n1, n2, uv0, uv1, uv2, point):
        w1, w2, w3 = triangle_barycentrics(p1, p2, p3, point)
        sm_n = w1[:, None] * n0 + w2[:, None] * n1 + w3[:, None] * n2
        sm_uv = w1[:, None] * uv0 + w2[:, None] * uv1 + w3[:, None] * uv2
        return sm_n, sm_uv

    dt, _ = time_fn_async(math_only, *parts, *uvs, point, iters=args.iters)
    print(f"bary math on pre-split: {dt*1e3:7.2f} ms "
          f"({dt/N*1e9:5.1f} ns/row)", flush=True)

    # gather + slices, no math
    @jax.jit
    def gather_slices(wd, pidx):
        row = jnp.take(wd.tri_attr, pidx, axis=0)
        return slices_only(row)

    dt, _ = time_fn_async(gather_slices, wd, pidx, iters=args.iters)
    print(f"gather + slices:        {dt*1e3:7.2f} ms "
          f"({dt/N*1e9:5.1f} ns/row)", flush=True)


if __name__ == "__main__":
    import sys as _s
    if "--sub" in _s.argv:
        sub_ablation()



def staged_test():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=231424)
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--staged", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from learn_path_tracing_tpu.geometry.triangle import (
        triangle_barycentrics)
    from learn_path_tracing_tpu.utils.benchlib import time_fn_async
    from worldcache import load_world

    N = args.n
    wd = load_world()
    key = jax.random.PRNGKey(0)
    pidx = jax.random.randint(key, (N,), 0, wd.tri_attr.shape[0], jnp.int32)
    point = jax.random.normal(key, (N, 3), jnp.float32)

    @jax.jit
    def tri_part_staged(wd, point, pidx):
        row = jnp.take(wd.tri_attr, pidx, axis=0)
        row = jax.lax.optimization_barrier(row)
        pieces = [row[:, i * 3:(i + 1) * 3] for i in range(6)] + \
                 [row[:, 18 + i * 2:20 + i * 2] for i in range(3)]
        pieces = list(jax.lax.optimization_barrier(tuple(pieces)))
        p1, p2, p3, n0, n1, n2, uv0, uv1, uv2 = pieces
        w1, w2, w3 = triangle_barycentrics(p1, p2, p3, point)
        sm_n = w1[:, None] * n0 + w2[:, None] * n1 + w3[:, None] * n2
        sm_uv = w1[:, None] * uv0 + w2[:, None] * uv1 + w3[:, None] * uv2
        return sm_n, sm_uv

    dt, _ = time_fn_async(tri_part_staged, wd, point, pidx,
                          iters=args.iters)
    print(f"tri staged (2 barriers): {dt*1e3:7.2f} ms "
          f"({dt/N*1e9:5.1f} ns/row)", flush=True)

    # variant: gather a PADDED [N, 128]-wide row (tile-aligned) then slice
    pad_tab = jnp.zeros((wd.tri_attr.shape[0], 128), jnp.float32
                        ).at[:, :32].set(wd.tri_attr)

    @jax.jit
    def tri_padded(pad_tab, point, pidx):
        row = jnp.take(pad_tab, pidx, axis=0)
        p1, p2, p3 = row[:, 0:3], row[:, 3:6], row[:, 6:9]
        n0, n1, n2 = row[:, 9:12], row[:, 12:15], row[:, 15:18]
        uv0, uv1, uv2 = row[:, 18:20], row[:, 20:22], row[:, 22:24]
        w1, w2, w3 = triangle_barycentrics(p1, p2, p3, point)
        sm_n = w1[:, None] * n0 + w2[:, None] * n1 + w3[:, None] * n2
        sm_uv = w1[:, None] * uv0 + w2[:, None] * uv1 + w3[:, None] * uv2
        return sm_n, sm_uv

    dt, _ = time_fn_async(tri_padded, pad_tab, point, pidx,
                          iters=args.iters)
    print(f"tri padded-128 row:     {dt*1e3:7.2f} ms "
          f"({dt/N*1e9:5.1f} ns/row)", flush=True)


if __name__ == "__main__" and "--staged" in __import__("sys").argv:
    staged_test()


def transposed_test():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=231424)
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--transposed", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from learn_path_tracing_tpu.utils.benchlib import time_fn_async
    from worldcache import load_world

    N = args.n
    wd = load_world()
    key = jax.random.PRNGKey(0)
    pidx = jax.random.randint(key, (N,), 0, wd.tri_attr.shape[0], jnp.int32)
    point = jax.random.normal(key, (N, 3), jnp.float32)

    @jax.jit
    def tri_componentwise(wd, point, pidx):
        """Gather rows, transpose once, then component-wise 1-D math."""
        row = jnp.take(wd.tri_attr, pidx, axis=0)      # [N, 32]
        ct = row.T                                      # [32, N]
        p1 = ct[0:3]; p2 = ct[3:6]; p3 = ct[6:9]        # [3, N] each
        n0 = ct[9:12]; n1 = ct[12:15]; n2 = ct[15:18]
        uv0 = ct[18:20]; uv1 = ct[20:22]; uv2 = ct[22:24]
        px, py, pz = point[:, 0], point[:, 1], point[:, 2]

        def sub3(a, bx, by, bz):
            return a[0] - bx, a[1] - by, a[2] - bz

        # barycentrics via cross-product areas, component-wise
        v0x, v0y, v0z = p2[0] - p1[0], p2[1] - p1[1], p2[2] - p1[2]
        v1x, v1y, v1z = p3[0] - p1[0], p3[1] - p1[1], p3[2] - p1[2]
        v2x, v2y, v2z = px - p1[0], py - p1[1], pz - p1[2]
        d00 = v0x * v0x + v0y * v0y + v0z * v0z
        d01 = v0x * v1x + v0y * v1y + v0z * v1z
        d11 = v1x * v1x + v1y * v1y + v1z * v1z
        d20 = v2x * v0x + v2y * v0y + v2z * v0z
        d21 = v2x * v1x + v2y * v1y + v2z * v1z
        denom = jnp.maximum(d00 * d11 - d01 * d01, 1e-20)
        w2 = (d11 * d20 - d01 * d21) / denom
        w3 = (d00 * d21 - d01 * d20) / denom
        w1 = 1.0 - w2 - w3
        smx = w1 * n0[0] + w2 * n1[0] + w3 * n2[0]
        smy = w1 * n0[1] + w2 * n1[1] + w3 * n2[1]
        smz = w1 * n0[2] + w2 * n1[2] + w3 * n2[2]
        su = w1 * uv0[0] + w2 * uv1[0] + w3 * uv2[0]
        sv = w1 * uv0[1] + w2 * uv1[1] + w3 * uv2[1]
        return jnp.stack([smx, smy, smz], -1), jnp.stack([su, sv], -1)

    dt, _ = time_fn_async(tri_componentwise, wd, point, pidx,
                          iters=args.iters)
    print(f"tri transposed 1-D math: {dt*1e3:7.2f} ms "
          f"({dt/N*1e9:5.1f} ns/row)", flush=True)

    @jax.jit
    def tri_componentwise_cols(wd, px, py, pz, pidx):
        row = jnp.take(wd.tri_attr, pidx, axis=0)      # [N, 32]
        ct = row.T                                      # [32, N]
        p1 = ct[0:3]; p2 = ct[3:6]; p3 = ct[6:9]
        n0 = ct[9:12]; n1 = ct[12:15]; n2 = ct[15:18]
        uv0 = ct[18:20]; uv1 = ct[20:22]; uv2 = ct[22:24]
        v0x, v0y, v0z = p2[0] - p1[0], p2[1] - p1[1], p2[2] - p1[2]
        v1x, v1y, v1z = p3[0] - p1[0], p3[1] - p1[1], p3[2] - p1[2]
        v2x, v2y, v2z = px - p1[0], py - p1[1], pz - p1[2]
        d00 = v0x * v0x + v0y * v0y + v0z * v0z
        d01 = v0x * v1x + v0y * v1y + v0z * v1z
        d11 = v1x * v1x + v1y * v1y + v1z * v1z
        d20 = v2x * v0x + v2y * v0y + v2z * v0z
        d21 = v2x * v1x + v2y * v1y + v2z * v1z
        denom = jnp.maximum(d00 * d11 - d01 * d01, 1e-20)
        w2 = (d11 * d20 - d01 * d21) / denom
        w3 = (d00 * d21 - d01 * d20) / denom
        w1 = 1.0 - w2 - w3
        smx = w1 * n0[0] + w2 * n1[0] + w3 * n2[0]
        smy = w1 * n0[1] + w2 * n1[1] + w3 * n2[1]
        smz = w1 * n0[2] + w2 * n1[2] + w3 * n2[2]
        su = w1 * uv0[0] + w2 * uv1[0] + w3 * uv2[0]
        sv = w1 * uv0[1] + w2 * uv1[1] + w3 * uv2[1]
        return smx, smy, smz, su, sv

    dt, _ = time_fn_async(tri_componentwise_cols, wd, point[:, 0],
                          point[:, 1], point[:, 2], pidx, iters=args.iters)
    print(f"tri 1-D cols in/out:     {dt*1e3:7.2f} ms "
          f"({dt/N*1e9:5.1f} ns/row)", flush=True)


if __name__ == "__main__" and "--transposed" in __import__("sys").argv:
    transposed_test()


def transpose_cost():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=231424)
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--tc", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from learn_path_tracing_tpu.utils.benchlib import time_fn_async
    from worldcache import load_world

    N = args.n
    wd = load_world()
    key = jax.random.PRNGKey(0)
    pidx = jax.random.randint(key, (N,), 0, wd.tri_attr.shape[0], jnp.int32)

    @jax.jit
    def take_T(wd, pidx):
        return jnp.take(wd.tri_attr, pidx, axis=0).T

    dt, _ = time_fn_async(take_T, wd, pidx, iters=args.iters)
    print(f"take + transpose:       {dt*1e3:7.2f} ms "
          f"({dt/N*1e9:5.1f} ns/row)", flush=True)

    # gather from the PRE-transposed table along axis=1
    triT = wd.tri_attr.T  # [32, T]

    @jax.jit
    def takeT(triT, pidx):
        return jnp.take(triT, pidx, axis=1)

    dt, _ = time_fn_async(takeT, triT, pidx, iters=args.iters)
    print(f"take along axis=1:      {dt*1e3:7.2f} ms "
          f"({dt/N*1e9:5.1f} ns/row)", flush=True)


if __name__ == "__main__" and "--tc" in __import__("sys").argv:
    transpose_cost()
