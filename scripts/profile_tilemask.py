"""Estimate the win of per-tile gating in the packet kernel (v3 design).

For the sorted Yoimiya wavefronts, brute-force slab-test every ray against
every wide-BVH child AABB and aggregate per (node, block) and per
(node, 128-lane tile): a node is in a block's traversal union iff some
lane in the block hits it (upper-bound proxy — ordered traversal prunes
more), and with tile masks the kernel would only run vector math on the
tiles that hit. The ratio (active tiles)/(8 * union nodes) bounds the
vector-work reduction a tile-masked kernel can deliver.

Usage:  python scripts/profile_tilemask.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from learn_path_tracing_tpu.bsdf.bsdf import scatter_legacy
    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.camera.camera import generate_rays_for_pixels
    from learn_path_tracing_tpu.core import rng
    from learn_path_tracing_tpu.core.pytree import tree_where
    from learn_path_tracing_tpu.ops import packet_traverse as pt
    from learn_path_tracing_tpu.scene.legacy_world import hit_legacy

    res = (640, 360)
    n = res[0] * res[1]
    from worldcache import load_world
    wd = load_world()
    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))
    cp = cam.params()
    pix = jnp.arange(n, dtype=jnp.uint32)

    rays = jax.jit(lambda s: generate_rays_for_pixels(cp, res, pix, s, 0))(0)

    @jax.jit
    def mk_secondary(wd, rays):
        hits = hit_legacy(wd, rays)
        base = rng.base(rng.stream(0, 0, 0, rng.STREAM_BSDF), pix)
        sc = scatter_legacy(rays, hits, base)
        return tree_where(hits.hit, sc, rays)

    sec = mk_secondary(wd, rays)
    nodes, entries, runs = wd.meshes[0].packet
    m = int(nodes.shape[0])
    block = pt.RAY_BLOCK
    tile = 128
    nb = n // block

    # child AABBs as [M*8, 3] lo/hi (PAD slots get inverted boxes = no hit)
    nod = np.asarray(nodes)
    lo = np.stack([nod[:, d * 8:(d + 1) * 8] for d in range(3)], -1)
    hi = np.stack([nod[:, (3 + d) * 8:(4 + d) * 8] for d in range(3)], -1)
    lo = jnp.asarray(lo.reshape(m * 8, 3))
    hi = jnp.asarray(hi.reshape(m * 8, 3))

    @jax.jit
    def tile_stats(ro, rd):
        key = pt._coherence_key(nodes, entries, ro, rd)
        idx = jnp.argsort(key)
        ro = jnp.take(ro, idx, axis=0)
        rd = jnp.take(rd, idx, axis=0)
        inv = 1.0 / rd

        def per_chunk(c, acc):
            # chunk of 8 nodes' children = 64 boxes vs all rays
            node_hit_blocks, tile_hits, union_nodes = acc
            s = c * 64
            clo = jax.lax.dynamic_slice(lo, (s, 0), (64, 3))
            chi = jax.lax.dynamic_slice(hi, (s, 0), (64, 3))
            ta = (clo[None] - ro[:, None]) * inv[:, None]     # [N,64,3]
            tb = (chi[None] - ro[:, None]) * inv[:, None]
            t0 = jnp.max(jnp.minimum(ta, tb), -1)
            t1 = jnp.min(jnp.maximum(ta, tb), -1)
            h = (t1 > t0) & (t1 > 0.0)                        # [N,64]
            # per node (8 children -> any), per tile / per block
            h_n = h.reshape(n, 8, 8).any(-1)                  # [N, 8 nodes]
            h_t = h_n.reshape(nb, block // tile, tile, 8).any(2)   # [nb,8,8n]
            h_b = h_t.any(1)                                  # [nb, 8 nodes]
            return (node_hit_blocks + jnp.sum(h_b),
                    tile_hits + jnp.sum(h_t),
                    union_nodes)

        acc = (jnp.int32(0), jnp.int32(0), jnp.int32(0))
        nchunk = m // 8
        acc = jax.lax.fori_loop(0, nchunk, per_chunk, acc)
        return acc

    for name, (ro, rd) in [("primary", (rays.ro, rays.rd)),
                           ("secondary", (sec.ro, sec.rd))]:
        nb_hits, tl_hits, _ = jax.device_get(tile_stats(ro, rd))
        print(f"{name:10s} union(node,block) pairs={int(nb_hits):8d}  "
              f"active (node,tile) pairs={int(tl_hits):8d}  "
              f"tile fraction={tl_hits / (8 * max(nb_hits, 1)):.3f}",
              flush=True)


if __name__ == "__main__":
    main()
