"""Does [N,3] minor-dim layout throttle VPU shading math on TPU?

Times the same barycentric+normal-interpolation math three ways:
  a) row-major [N,3]/[N,2] slices of a packed [N,32] row (the current
     hit_legacy formulation),
  b) component-split: 32 separate [N] vectors (transpose once, then all
     elementwise ops run full-lane),
  c) transposed [32, N] table (one relayout, static row slices).

Usage:  python scripts/profile_layout.py [--n 230400]
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
    key = jax.random.PRNGKey(0)
    row = jax.random.normal(key, (n, 32), jnp.float32)
    point = jax.random.normal(jax.random.PRNGKey(1), (n, 3), jnp.float32)
    rowT = row.T
    pointT = point.T

    def bary_rows(row, point):
        from learn_path_tracing_tpu.geometry.triangle import (
            triangle_barycentrics)
        p1, p2, p3 = row[:, 0:3], row[:, 3:6], row[:, 6:9]
        n0, n1, n2 = row[:, 9:12], row[:, 12:15], row[:, 15:18]
        uv0, uv1, uv2 = row[:, 18:20], row[:, 20:22], row[:, 22:24]
        w1, w2, w3 = triangle_barycentrics(p1, p2, p3, point)
        sm_n = w1[:, None] * n0 + w2[:, None] * n1 + w3[:, None] * n2
        sm_n = sm_n / jnp.maximum(
            jnp.sqrt(jnp.sum(sm_n * sm_n, -1, keepdims=True)), 1e-20)
        sm_uv = w1[:, None] * uv0 + w2[:, None] * uv1 + w3[:, None] * uv2
        return sm_n, sm_uv

    def _bary_comp(c, px, py, pz):
        """Same math on [N] components. c[k] is column k of the row table."""
        def cross(ax, ay, az, bx, by, bz):
            return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)

        def dot(ax, ay, az, bx, by, bz):
            return ax * bx + ay * by + az * bz

        p1 = c[0:3]; p2 = c[3:6]; p3 = c[6:9]
        e1 = [p2[k] - p1[k] for k in range(3)]
        e2 = [p3[k] - p1[k] for k in range(3)]
        nx, ny, nz = cross(*e1, *e2)
        inv = 1.0 / jnp.maximum(dot(nx, ny, nz, nx, ny, nz), 1e-20)
        d1 = [px - p2[0], py - p2[1], pz - p2[2]]
        d2 = [px - p3[0], py - p3[1], pz - p3[2]]
        e3 = [p3[k] - p2[k] for k in range(3)]
        cx, cy, cz = cross(*e3, *d1)
        w1 = dot(cx, cy, cz, nx, ny, nz) * inv
        e4 = [p1[k] - p3[k] for k in range(3)]
        cx, cy, cz = cross(*e4, *d2)
        w2 = dot(cx, cy, cz, nx, ny, nz) * inv
        w3 = 1.0 - w1 - w2
        smx = w1 * c[9] + w2 * c[12] + w3 * c[15]
        smy = w1 * c[10] + w2 * c[13] + w3 * c[16]
        smz = w1 * c[11] + w2 * c[14] + w3 * c[17]
        inv_n = 1.0 / jnp.maximum(
            jnp.sqrt(smx * smx + smy * smy + smz * smz), 1e-20)
        su = w1 * c[18] + w2 * c[20] + w3 * c[22]
        sv = w1 * c[19] + w2 * c[21] + w3 * c[23]
        return smx * inv_n, smy * inv_n, smz * inv_n, su, sv

    def bary_split(row, point):
        c = [row[:, k] for k in range(24)]
        return _bary_comp(c, point[:, 0], point[:, 1], point[:, 2])

    def bary_T(rowT, pointT):
        c = [rowT[k] for k in range(24)]
        return _bary_comp(c, pointT[0], pointT[1], pointT[2])

    # Async-dispatch timing with MANY iterations: queue all launches without
    # intermediate syncs (axon per-dispatch round trips are ~26 ms if you
    # serialize on the host), then one final force. The per-run readback
    # constant amortizes over 64 iterations instead of being subtracted.
    import time as _time

    def bench(f, fargs, iters=64):
        out = f(*fargs)
        jax.block_until_ready(out)
        t0 = _time.time()
        for _ in range(iters):
            out = f(*fargs)
        jax.block_until_ready(out)
        return (_time.time() - t0) / iters

    for name, f, fargs in [
        ("rows [N,3]", jax.jit(bary_rows), (row, point)),
        ("split cols", jax.jit(bary_split), (row, point)),
        ("pre-T [32,N]", jax.jit(bary_T), (rowT, pointT)),
    ]:
        dt = bench(f, fargs)
        print(f"{name:14s} {dt * 1e3:8.2f} ms  "
              f"({n / dt / 1e6:8.1f} Mlanes/s)", flush=True)


if __name__ == "__main__":
    main()
