"""Time the persistent accumulate variants at the 1080p/time1024 shapes.

The round-4 verdict found the persistent path loses ~2x at 1080p vs 720p
(60.3 vs 114 Mrays/s) and crashes the TPU worker at the time1024 config
(spp 512).  bench --pool-div showed throughput recovers monotonically as
items_per shrinks (60.3 auto/2058, 82.5 @1024, 92.2 @512), pointing at the
flat one-hot accumulate whose per-pass traffic is O(pool * items_per).

Usage:  python scripts/profile_acc1080.py [--pool 64512] [--spp 64]
                                          [--items 2058]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pool", type=int, default=64512)
    p.add_argument("--spp", type=int, default=64)
    p.add_argument("--items", type=int, default=2058)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from learn_path_tracing_tpu.utils.benchlib import time_fn_async

    pool, spp, items = args.pool, args.spp, args.items
    groups = pool // spp
    pool = groups * spp

    key = jax.random.PRNGKey(0)
    k = jax.random.randint(key, (pool,), 0, items).astype(jnp.uint32)
    contrib = jax.random.uniform(key, (pool, 3), jnp.float32)

    def flat(acc, k, contrib, items_n):
        k_g = k.reshape(groups, spp)
        c_g = contrib.reshape(groups, spp, 3)
        onehot = (k_g[:, :, None] == jnp.arange(items_n, dtype=jnp.uint32)
                  ).astype(jnp.bfloat16)
        hi = c_g.astype(jnp.bfloat16)
        r1 = c_g - hi.astype(jnp.float32)
        lo = r1.astype(jnp.bfloat16)
        lo2 = (r1 - lo.astype(jnp.float32)).astype(jnp.bfloat16)
        c9 = jnp.concatenate([hi, lo, lo2], axis=-1)
        d = jax.lax.dot_general(
            onehot, c9, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return acc + (d[..., 0:3] + d[..., 3:6] + d[..., 6:9])

    def twolevel(acc, k, contrib, items_n, P):
        q_w = items_n // P
        k_g = k.reshape(groups, spp)
        c_g = contrib.reshape(groups, spp, 3)
        q_g = k_g // jnp.uint32(P)
        p_g = k_g % jnp.uint32(P)
        hi = c_g.astype(jnp.bfloat16)
        r1 = c_g - hi.astype(jnp.float32)
        lo = r1.astype(jnp.bfloat16)
        lo2 = (r1 - lo.astype(jnp.float32)).astype(jnp.bfloat16)
        c9 = jnp.concatenate([hi, lo, lo2], axis=-1)
        oh_p = (p_g[:, :, None] == jnp.arange(P, dtype=jnp.uint32)
                ).astype(jnp.bfloat16)
        tmp = (oh_p[..., None] * c9[:, :, None, :]
               ).reshape(groups, spp, P * 9)
        oh_q = (q_g[:, :, None] == jnp.arange(q_w, dtype=jnp.uint32)
                ).astype(jnp.bfloat16)
        d = jax.lax.dot_general(
            oh_q, tmp, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        d = d.reshape(groups, items_n, 9)
        return acc + (d[..., 0:3] + d[..., 3:6] + d[..., 6:9])

    def scatter_flat(acc_flat, k, contrib):
        idx = (jnp.arange(pool, dtype=jnp.uint32) // jnp.uint32(spp)
               ) * jnp.uint32(items) + k
        return acc_flat.at[idx].add(contrib)

    import functools

    rows = []
    acc0 = jnp.zeros((groups, items, 3), jnp.float32)
    f = jax.jit(functools.partial(flat, items_n=items))
    dt, _ = time_fn_async(f, acc0, k, contrib, iters=50)
    rows.append(("flat bf16-split", dt))
    for P in (8, 16, 32, 64, 128):
        items_p = -(-items // P) * P
        accP = jnp.zeros((groups, items_p, 3), jnp.float32)
        g = jax.jit(functools.partial(twolevel, items_n=items_p, P=P))
        dt, _ = time_fn_async(g, accP, k, contrib, iters=50)
        rows.append((f"two-level P={P}", dt))
    accF = jnp.zeros((groups * items, 3), jnp.float32)
    s = jax.jit(scatter_flat)
    dt, _ = time_fn_async(s, accF, k, contrib, iters=50)
    rows.append(("scatter .at[].add", dt))

    print(f"pool={pool} groups={groups} spp={spp} items={items}")
    for name, dt in rows:
        print(f"{name:22s} {dt*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
