"""Micro-benchmark the coherence-sort data movement around the packet kernel.

packet_traverse currently does: key -> argsort -> row-take of packed [N,8]
-> kernel -> TWO element takes (t, prim) with the inverse permutation.
profile_legacy2.py measured that machinery at ~7.4 ms per 230k rays — as
expensive as the traversal kernel itself. Candidates:

  fwd_take      argsort + jnp.take of packed [N,8] rows   (current)
  fwd_sort      lax.sort carrying the 8 payload cols + lane idx (num_keys=1)
  inv_take2     two element takes (current)
  inv_take_row  ONE row take of a packed [N,2] (t, prim bitcast) row
  inv_sort      lax.sort by carried idx, payload (t, prim)

Usage:  python scripts/profile_sortpath.py [--n 230400]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=230400)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from learn_path_tracing_tpu.utils.benchlib import time_fn

    n = args.n
    key = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, 1 << 30,
                             dtype=jnp.int32)
    packed = jax.random.normal(jax.random.PRNGKey(1), (n, 8), jnp.float32)
    t = jax.random.normal(jax.random.PRNGKey(2), (n,), jnp.float32)
    prim = jax.random.randint(jax.random.PRNGKey(3), (n,), -1, 23424,
                              dtype=jnp.int32)

    @jax.jit
    def fwd_take(key, packed):
        order = jnp.argsort(key)
        inv = jnp.argsort(order)
        return jnp.take(packed, order, axis=0), inv

    @jax.jit
    def fwd_sort(key, packed):
        idx = jnp.arange(n, dtype=jnp.int32)
        ops = jax.lax.sort(
            (key,) + tuple(packed[:, j] for j in range(8)) + (idx,),
            num_keys=1)
        return jnp.stack(ops[1:9], axis=1), ops[9]

    @jax.jit
    def inv_take2(inv, t, prim):
        return jnp.take(t, inv, axis=0), jnp.take(prim, inv, axis=0)

    @jax.jit
    def inv_take_row(inv, t, prim):
        row = jnp.stack(
            [t, jax.lax.bitcast_convert_type(prim, jnp.float32)], axis=1)
        out = jnp.take(row, inv, axis=0)
        return out[:, 0], jax.lax.bitcast_convert_type(out[:, 1], jnp.int32)

    @jax.jit
    def inv_sort(order_idx, t, prim):
        ops = jax.lax.sort((order_idx, t, prim), num_keys=1)
        return ops[1], ops[2]

    @jax.jit
    def elem_take(key, t):
        idx = jnp.abs(key) % n
        return jnp.take(t, idx, axis=0)

    @jax.jit
    def row_take8(key, packed):
        idx = jnp.abs(key) % n
        return jnp.take(packed, idx, axis=0)

    sorted_packed, inv = fwd_take(key, packed)
    _, order_idx = fwd_sort(key, packed)

    for name, f, fa in [
        ("fwd_take (current)", fwd_take, (key, packed)),
        ("fwd_sort (payload)", fwd_sort, (key, packed)),
        ("inv_take2 (current)", inv_take2, (inv, t, prim)),
        ("inv_take_row", inv_take_row, (inv, t, prim)),
        ("inv_sort", inv_sort, (order_idx, t, prim)),
        ("elem_take x1", elem_take, (key, t)),
        ("row_take8 x1", row_take8, (key, packed)),
    ]:
        dt, _ = time_fn(f, *fa, iters=5)
        print(f"{name:22s} {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
