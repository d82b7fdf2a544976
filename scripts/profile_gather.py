"""Gather-shape microbench: how XLA row-gathers scale with table size,
row width, and dtype on this chip — drives the atlas-tap storage choice.

Usage:  python scripts/profile_gather.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from learn_path_tracing_tpu.utils.benchlib import time_fn

    n = 921_600  # 4 taps x 230k lanes

    @jax.jit
    def take_rows(tbl, idx):
        return jnp.take(tbl, idx, axis=0).astype(jnp.float32).sum()

    @jax.jit
    def take4_rows(tbl, idx4):
        # one fused gather for all 4 bilinear taps: idx4 [N,4]
        return jnp.take(tbl, idx4.reshape(-1), axis=0).astype(
            jnp.float32).sum()

    key = jax.random.PRNGKey(0)
    cases = []
    for rows, width, dt, tag in [
        (25_165_824, 8, jnp.bfloat16, "atlas-now"),
        (25_165_824, 8, jnp.float32, "atlas-f32"),
        (25_165_824, 16, jnp.bfloat16, "atlas-16w"),
        (4_194_304, 8, jnp.bfloat16, "env-sized"),
        (1_048_576, 8, jnp.bfloat16, "1M-rows"),
        (131_072, 8, jnp.bfloat16, "128k-rows"),
        (25_165_824, 1, jnp.float32, "scalar-25M"),
    ]:
        tbl = jnp.zeros((rows, width), dt) if width > 1 else jnp.zeros(
            (rows,), dt)
        idx = jax.random.randint(key, (n,), 0, rows)
        f = take_rows
        dtt, _ = time_fn(f, tbl, idx, iters=3)
        print(f"{tag:12s} rows={rows:>9} w={width:>2} {str(dt)[-8:]}"
              f"  {dtt*1e3:7.2f} ms  {n/dtt/1e6:7.1f} Mrows/s", flush=True)

    # sorted (coherent) indices vs random on the big table
    tbl = jnp.zeros((25_165_824, 8), jnp.bfloat16)
    idx = jnp.sort(jax.random.randint(key, (n,), 0, 25_165_824))
    dtt, _ = time_fn(take_rows, tbl, idx, iters=3)
    print(f"{'atlas-sortedidx':16s}  {dtt*1e3:7.2f} ms  "
          f"{n/dtt/1e6:7.1f} Mrows/s", flush=True)

    # localized indices (all within one 128k-row window of the big table)
    idx = jax.random.randint(key, (n,), 0, 131_072)
    dtt, _ = time_fn(take_rows, tbl, idx, iters=3)
    print(f"{'atlas-local128k':16s}  {dtt*1e3:7.2f} ms  "
          f"{n/dtt/1e6:7.1f} Mrows/s", flush=True)


if __name__ == "__main__":
    main()
