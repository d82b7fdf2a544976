"""Per-block fixed cost of the packet kernel.

profile_packet_stats.py implies time = blocks*F + iters*c with F ~ 5.6 us
and c ~ 0.7 us (solving primary vs secondary sorted). F at that size is
suspiciously close to the DMA cost of re-copying the constant node/entry/
run tables (~3.3 MB) every grid step. This measures F directly: all-dead
rays make every block terminate after a single stale pop, so wall time is
essentially blocks * F.

Usage:  python scripts/profile_blockfloor.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from learn_path_tracing_tpu.ops import packet_traverse as pt
    from learn_path_tracing_tpu.utils.benchlib import time_fn_async

    from worldcache import load_world
    wd = load_world()
    nodes, entries, runs = wd.meshes[0].packet
    print(f"tables: nodes {nodes.shape} entries {entries.shape} "
          f"runs {runs.shape} "
          f"bytes={4 * 128 * (nodes.shape[0] + entries.shape[0] + runs.shape[0])}",
          flush=True)

    trav = jax.jit(functools.partial(pt.packet_traverse, sort_rays=False))

    for n in (pt.RAY_BLOCK, 16 * pt.RAY_BLOCK, 225 * pt.RAY_BLOCK):
        ro = jnp.zeros((n, 3), jnp.float32)
        rd = jnp.ones((n, 3), jnp.float32) * 0.57735
        t_inf = jnp.full((n,), jnp.inf, jnp.float32)
        dead = jnp.zeros((n,), bool)
        dt, _ = time_fn_async(trav, nodes, entries, runs, ro, rd, t_inf,
                              dead, iters=32)
        blocks = n // pt.RAY_BLOCK
        print(f"all-dead n={n:8d} ({blocks:4d} blocks): {dt * 1e3:7.3f} ms "
              f"= {dt / blocks * 1e6:7.2f} us/block", flush=True)


if __name__ == "__main__":
    main()
