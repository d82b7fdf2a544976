"""v2 vs v3 packet-kernel shootout on the Yoimiya mesh (real TPU).

v3 carries a lane-tile interval on each stack entry so deep nodes only
slab-test the (sorted-contiguous) lanes that hit their parent; this is the
round-3 attack on the incoherent-union blowup (18.2 ms sorted vs 1.93 ms
coherent per 230k rays, BASELINE.md round-2).

Coherent workload = primary camera rays (interactive config); incoherent =
one legacy-scatter bounce off those primaries (the wavefront the persistent
integrator actually traces). Everything is jitted: eager dispatches stall
minutes on the axon tunnel.

Usage: python scripts/profile_packet_v3.py [--reps 5] [--versions 2,3]
"""

import argparse
import functools
import os
import sys


sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--versions", type=str, default="2,3")
    args = p.parse_args()

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
    from worldcache import load_world

    res = (640, 360)
    n = res[0] * res[1]
    wd = load_world()
    mesh = wd.meshes[0]
    nodes, entries, runs = mesh.packet
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
    jax.block_until_ready(sec.ro)
    print(f"wide nodes={int(nodes.shape[0])} block={pt.RAY_BLOCK}",
          flush=True)

    t_inf = jnp.full((n,), jnp.inf, jnp.float32)
    alive = jnp.ones((n,), bool)

    from learn_path_tracing_tpu.utils.benchlib import time_fn_async

    for name, rr in (("coherent", rays), ("incoherent", sec)):
        ref = None
        for v in [int(x) for x in args.versions.split(",")]:
            fn = jax.jit(functools.partial(
                pt.packet_traverse, version=v, treelets=mesh.treelets))

            best, out = time_fn_async(
                fn, nodes, entries, runs, rr.ro, rr.rd, t_inf, alive,
                iters=max(args.reps, 16))
            t_h, p_h = np.asarray(out[0]), np.asarray(out[1])
            hits_n = int((p_h >= 0).sum())
            if ref is None:
                ref = (t_h, p_h)
                match = "ref"
            else:
                match = ("EXACT" if np.array_equal(ref[0], t_h)
                         and np.array_equal(ref[1], p_h) else "MISMATCH")
            print(f"{name:10s} v{v}: {best*1e3:7.2f} ms  "
                  f"{n/best/1e6:7.1f} Mrays/s  hits={hits_n}  {match}",
                  flush=True)


if __name__ == "__main__":
    main()
