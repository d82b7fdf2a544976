"""v2 vs v3 packet-kernel shootout on the Yoimiya mesh (real TPU).

v3 carries a lane-tile interval on each stack entry so deep nodes only
slab-test the (sorted-contiguous) lanes that hit their parent; this is the
round-3 attack on the incoherent-union blowup (18.2 ms sorted vs 1.93 ms
coherent per 230k rays, BASELINE.md round-2).

Usage: python scripts/profile_packet_v3.py [--n 230400] [--reps 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=230400)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--versions", type=str, default="2,3")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from learn_path_tracing_tpu.camera import LegacyCamera
    from learn_path_tracing_tpu.ops.packet_traverse import packet_traverse
    from worldcache import load_world

    wd = load_world()
    mesh = wd.meshes[0]
    nodes, entries, runs = mesh.packet
    n = args.n

    # coherent: primary camera rays at the interactive config
    cam = LegacyCamera((640, 360))
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))
    cp = cam.params()
    from learn_path_tracing_tpu.camera.camera import generate_rays_for_pixels
    pix = jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(640 * 360)
    samp = jnp.arange(n, dtype=jnp.uint32) // jnp.uint32(640 * 360)
    rays = generate_rays_for_pixels(cp, (640, 360), pix, 0, samp,
                                    model="jitter")
    ro_c, rd_c = rays.ro, rays.rd

    # incoherent: random origins in the mesh AABB, random directions
    rng = np.random.default_rng(0)
    lo = np.asarray(jnp.min(mesh.v0, axis=0))
    hi = np.asarray(jnp.max(mesh.v0, axis=0))
    ro_i = jnp.asarray(
        rng.uniform(lo - 0.1, hi + 0.1, size=(n, 3)).astype(np.float32))
    rd_i = rng.normal(size=(n, 3)).astype(np.float32)
    rd_i = jnp.asarray(rd_i / np.linalg.norm(rd_i, axis=-1, keepdims=True))

    t_init = jnp.full((n,), jnp.inf, jnp.float32)
    active = jnp.ones((n,), bool)

    for name, ro, rd in (("coherent", ro_c, rd_c), ("incoherent", ro_i, rd_i)):
        ref = None
        for v in [int(x) for x in args.versions.split(",")]:
            def run():
                return packet_traverse(nodes, entries, runs, ro, rd, t_init,
                                       active, version=v,
                                       treelets=mesh.treelets)
            t, prim = run()
            jax.block_until_ready((t, prim))
            best = 1e9
            for _ in range(args.reps):
                t0 = time.perf_counter()
                t, prim = run()
                jax.block_until_ready((t, prim))
                best = min(best, time.perf_counter() - t0)
            hits = int(jnp.sum(prim >= 0))
            if ref is None:
                ref = (np.asarray(t), np.asarray(prim))
                match = "ref"
            else:
                match = ("EXACT" if np.array_equal(ref[0], np.asarray(t))
                         and np.array_equal(ref[1], np.asarray(prim))
                         else "MISMATCH")
            print(f"{name:10s} v{v}: {best*1e3:7.2f} ms  "
                  f"{n/best/1e6:7.1f} Mrays/s  hits={hits}  {match}")


if __name__ == "__main__":
    main()
