"""In-loop micro-op costs at pool width (57600 lanes): integer hash, uint
div/mod, asin/atan2, sin/cos, rsqrt/normalize. Decides which per-pass
component optimizations are worth doing (regen/env/scatter are each
~0.4-0.6 ms/pass and together rival the traversal).

Usage:  python scripts/profile_micro_ops.py [--k 300]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=300)
    p.add_argument("--lanes", type=int, default=57600)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from learn_path_tracing_tpu.core import rng

    K = args.k
    n = args.lanes
    xf = jnp.linspace(-0.99, 0.99, n, dtype=jnp.float32)
    xu = jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(97)
    v3 = jnp.stack([xf, xf * 0.5 + 0.1, 1.0 - xf], axis=-1)

    def timed(name, fn, init):
        f = jax.jit(lambda a: lax.fori_loop(0, K, fn, a))
        out = f(init)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        t0 = time.time()
        out = f(init)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        dt = (time.time() - t0) / K
        print(f"{name:28s} {dt*1e6:8.1f} us/pass", flush=True)

    timed("pcg x1", lambda i, x: rng.pcg(x + i.astype(jnp.uint32)), xu)
    timed("pcg x3 (base+uniform2)",
          lambda i, x: rng.bits(rng.base(jnp.uint32(7), x), 1)
          + rng.bits(rng.base(jnp.uint32(7), x), 2) + i.astype(jnp.uint32),
          xu)
    timed("u32 div+mod 360",
          lambda i, x: (x + i.astype(jnp.uint32)) // 360
          + (x + i.astype(jnp.uint32)) % 360, xu)
    timed("asin", lambda i, x: jnp.arcsin(
        jnp.clip(x + 1e-12 * i.astype(jnp.float32), -1.0, 1.0)), xf)
    timed("atan2", lambda i, x: jnp.arctan2(
        x + 1e-12 * i.astype(jnp.float32), 1.0 - x), xf)
    timed("sin+cos", lambda i, x: jnp.sin(x + i.astype(jnp.float32))
          + jnp.cos(x), xf)
    timed("sqrt", lambda i, x: jnp.sqrt(jnp.abs(x) + i.astype(jnp.float32)),
          xf)
    timed("normalize3", lambda i, v: v / jnp.sqrt(
        jnp.sum(v * v, -1, keepdims=True) + 1e-20 * i.astype(jnp.float32)),
        v3)
    timed("exp", lambda i, x: jnp.exp(x * 1e-6 * i.astype(jnp.float32)), xf)
    timed("add (floor)", lambda i, x: x + i.astype(jnp.float32), xf)


if __name__ == "__main__":
    main()
