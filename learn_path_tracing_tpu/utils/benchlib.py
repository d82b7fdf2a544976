"""Reliable device timing on tunneled runtimes.

On the axon remote-TPU platform, ``jax.block_until_ready`` can return before
the computation actually finishes, and the first device→host transfer in a
process stalls for minutes (relay warm-up). The only trustworthy completion
signal is a value transfer. ``time_fn`` therefore:

1. runs the function once and transfers a scalar derived from the output
   (completes compilation AND warms the transfer path);
2. times ``iters`` runs, forcing completion with one scalar readback;
3. subtracts the measured readback latency (timed separately with an
   already-materialized value).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    """Reduce an arbitrary pytree output to a host scalar (true completion)."""
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    acc = jnp.float32(0)
    for leaf in leaves:
        acc = acc + jnp.sum(leaf).astype(jnp.float32)
    return float(acc)


def time_fn(f, *args, iters: int = 3, warmup: int = 1):
    """Returns (seconds_per_iter, last_output). Completion is enforced by a
    scalar readback whose latency is measured and subtracted."""
    out = None
    for _ in range(max(warmup, 1)):
        out = f(*args)
        _force(out)

    # readback latency of an already-computed scalar
    x = jnp.float32(1.0) + jnp.float32(0.0)
    float(x)
    t0 = time.time()
    for _ in range(3):
        float(x + 0)
    readback = (time.time() - t0) / 3

    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    _force(out)
    dt = (time.time() - t0 - readback) / iters
    return max(dt, 1e-9), out


def time_fn_async(f, *args, iters: int = 32, warmup: int = 2):
    """Micro-kernel timing for the tunneled runtime.

    ``time_fn``'s readback-latency subtraction is the right tool for
    multi-second renders (the constant is <2% of the measurement), but for
    sub-10 ms kernels the tunnel's readback estimate varies by more than
    the kernel cost itself — measured reading 0.00 ms for a 9 ms traversal
    (scripts/profile_timecheck.py). This variant queues ``iters`` async
    dispatches back-to-back (device executes them serially) and forces once:
    the single readback constant amortizes to noise at iters >= 32.
    Always prefer this for anything under ~100 ms.
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = f(*args)
        _force(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    _force(out)
    return (time.time() - t0) / iters, out
