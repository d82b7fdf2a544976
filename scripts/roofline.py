"""MFU / roofline accounting for the headline configuration on v5e.

Measures the achieved FLOP/s and HBM bytes/s of the three dominant
components of a persistent-integrator pass (Pallas sphere scan, one-hot
matmul accumulation, XLA row gather) and restates the headline Mrays/s
against hardware ceilings, so "N Mrays/s" is legible as near-roofline or
not (BASELINE.md's MFU table is generated from this output).

v5e public peaks used (Google TPU v5e spec):
  MXU:  197 TFLOP/s bf16 (f32-precise paths run 3-6 bf16 passes)
  HBM:  819 GB/s
The VPU f32 peak is not published; the sphere kernel's achieved f32
throughput is therefore reported as FLOP/s alongside its arithmetic count,
not as a % of an official ceiling.

Usage:  python scripts/roofline.py [--pool 57600] [--spheres 512]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MXU_BF16 = 197e12
HBM = 819e9


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pool", type=int, default=57600)
    p.add_argument("--spheres", type=int, default=512)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from learn_path_tracing_tpu.ops.sphere_scan import intersect_spheres_pallas
    from learn_path_tracing_tpu.utils.benchlib import time_fn_async

    n, s = args.pool, args.spheres
    key = jax.random.PRNGKey(0)
    ro = jax.random.normal(key, (n, 3), jnp.float32) * 5
    rd = jax.random.normal(jax.random.PRNGKey(1), (n, 3), jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    centers = jax.random.normal(jax.random.PRNGKey(2), (s, 3), jnp.float32) * 8
    radii = jnp.full((s,), 0.5, jnp.float32)
    transp = jnp.zeros((s,), jnp.float32)

    rows = {}

    # --- 1. Pallas sphere scan (the headline hot kernel, VPU f32) ---
    @jax.jit
    def scan(ro_):
        return intersect_spheres_pallas(ro_, rd, centers, radii, transp)[0]

    dt, _ = time_fn_async(scan, ro, iters=64)
    # per (ray, sphere): 3 sub + 2 fma-ish dot accum x2 + quadratic ~ 16 flop
    flops = 16.0 * n * s
    rows["sphere_scan"] = {
        "time_ms": dt * 1e3, "gflops": flops / dt / 1e9,
        "pairs_per_s": n * s / dt,
        "note": "exact-f32 VPU quadratic, ~16 flop/pair",
    }

    # --- 2. one-hot matmul accumulation (MXU f32-HIGHEST) ---
    spp, items = 64, (1280 * 720 * 64) // args.pool
    groups = max(args.pool // spp, 1)
    k = jax.random.randint(jax.random.PRNGKey(3), (groups, spp), 0, items,
                           dtype=jnp.int32).astype(jnp.uint32)
    c = jax.random.normal(jax.random.PRNGKey(4), (groups, spp, 3), jnp.float32)
    acc0 = jnp.zeros((groups, items, 3), jnp.float32)

    @jax.jit
    def accum(acc, k_, c_):
        onehot = (k_[:, :, None] == jnp.arange(items, dtype=jnp.uint32)
                  ).astype(jnp.float32)
        return acc + jax.lax.dot_general(
            onehot, c_, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    dt, _ = time_fn_async(accum, acc0, k, c, iters=32)
    macs = float(groups) * spp * items * 3
    onehot_bytes = float(groups) * spp * items * 4
    rows["onehot_accumulate"] = {
        "time_ms": dt * 1e3,
        "mxu_tflops_equiv": macs * 2 * 6 / dt / 1e12,  # HIGHEST ~ 6 passes
        "hbm_gbps_if_materialized": onehot_bytes / dt / 1e9,
        "note": f"[{groups},{spp}]x[{spp},{items}] batched, f32 HIGHEST",
    }

    # --- 3. XLA row gather (BVH node / atlas fetch proxy) ---
    table = jax.random.normal(jax.random.PRNGKey(5), (1 << 16, 32), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(6), (n,), 0, 1 << 16)

    @jax.jit
    def gather(i):
        return jnp.take(table, i, axis=0)

    dt, _ = time_fn_async(gather, idx, iters=32)
    rows["row_gather"] = {
        "time_ms": dt * 1e3, "grows_per_s": n / dt / 1e9,
        "gbps": n * 32 * 4 / dt / 1e9,
        "note": "65k-row f32[.,32] table, random rows",
    }

    for name, r in rows.items():
        print(name, json.dumps({k: (round(v, 3) if isinstance(v, float)
                                    else v) for k, v in r.items()}))


if __name__ == "__main__":
    main()
