"""Sort-cost scaling: global argsort vs chunked row-sorts at pool widths,
and packet traversal sorted/unsorted at the persistent pool width.

Usage:  python scripts/profile_sortcost.py
"""

import functools
import os
import sys
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from learn_path_tracing_tpu.ops.packet_traverse import packet_traverse
    from learn_path_tracing_tpu.scene.legacy_world import LegacyWorld, hit_legacy
    from learn_path_tracing_tpu.stages.legacy_common import make_asset_path_map
    from learn_path_tracing_tpu.utils.benchlib import time_fn

    world = LegacyWorld()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        wd = world.load("/root/reference/legacy/Yoimiya.world.npy",
                        path_map=make_asset_path_map())
    nodes, entries, runs = wd.meshes[0].packet

    key = jax.random.PRNGKey(7)

    @jax.jit
    def argsort_global(k):
        return jnp.argsort(k)

    @functools.partial(jax.jit, static_argnames=("c",))
    def argsort_chunked(k, c):
        return jnp.argsort(k.reshape(c, -1), axis=1)

    for n in (230_400, 921_600, 1_843_200):
        k32 = jax.random.randint(key, (n,), 0, 1 << 15)
        dt, _ = time_fn(argsort_global, k32, iters=3)
        line = f"n={n:>8}  global {dt*1e3:7.2f} ms"
        for c in (8, 32):
            if n % c == 0:
                dtc, _ = time_fn(argsort_chunked, k32[:n - n % c], c, iters=3)
                line += f"   chunk{c} {dtc*1e3:7.2f} ms"
        print(line, flush=True)

    # traversal at pool width with incoherent rays (uniform sphere dirs,
    # origins inside the scene bounds)
    for n in (921_600, 1_843_200):
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        ro = jax.random.uniform(k1, (n, 3), minval=-5.0, maxval=5.0) \
            + jnp.asarray([0.0, 8.0, 0.0])
        d = jax.random.normal(k2, (n, 3))
        rd = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        t_inf = jnp.full((n,), jnp.inf, jnp.float32)
        alive = jnp.ones((n,), bool)
        for srt in (False, True):
            f = jax.jit(functools.partial(packet_traverse, sort_rays=srt))
            dt, _ = time_fn(f, nodes, entries, runs, ro, rd, t_inf, alive,
                            iters=2)
            print(f"traverse n={n:>8} sorted={int(srt)}  {dt*1e3:8.2f} ms  "
                  f"({n/dt/1e6:6.1f} Mlanes/s)", flush=True)


if __name__ == "__main__":
    main()
