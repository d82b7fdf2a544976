"""Pallas row-gather prototypes vs XLA's take (the 73 ns/row attrs ceiling).

The attrs block pays exactly 2 row gathers per hit lane (tri-attr row +
atlas pair row) at XLA's measured ~53.6 M rows/s latency ceiling. Two
candidate kernels:

  - vmem-loop: the whole table staged in VMEM (fits for tri_attr, 3 MB),
    scalar fori over lanes doing dynamic single-row loads;
  - hbm-dma-ring: table stays in HBM, a ring of K outstanding row DMAs
    (HBM -> output VMEM block) pipelines row latency.

Usage: python scripts/profile_gather2.py [--n 231424] [--rows 1122305]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=231424)   # 226 blocks of 1024
    p.add_argument("--iters", type=int, default=32)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from learn_path_tracing_tpu.utils.benchlib import time_fn_async

    N = args.n
    B = 1024
    key = jax.random.PRNGKey(0)

    # ---- tables: tri-attr-like (f32, narrow) and atlas-like (bf16, wide)
    T_tri, C_tri = 23425, 32
    T_atl, C_atl = 1122305, 256
    tri = jax.random.normal(key, (T_tri, C_tri), jnp.float32)
    atl = jax.random.normal(key, (T_atl, C_atl), jnp.float32
                            ).astype(jnp.bfloat16)
    idx_tri = jax.random.randint(key, (N,), 0, T_tri, jnp.int32)
    idx_atl = jax.random.randint(key, (N,), 0, T_atl, jnp.int32)
    idx_atl_sorted = jnp.sort(idx_atl)

    @jax.jit
    def take(tab, idx):
        return jnp.take(tab, idx, axis=0)

    for name, tab, idx in (("XLA take tri[23k,32]f32", tri, idx_tri),
                           ("XLA take atlas[1.1M,256]bf16", atl, idx_atl),
                           ("XLA take atlas sorted idx", atl,
                            idx_atl_sorted)):
        dt, _ = time_fn_async(take, tab, idx, iters=args.iters)
        print(f"{name:34s} {dt*1e3:7.2f} ms  {N/dt/1e6:6.1f} M rows/s",
              flush=True)

    # ---- Pallas vmem-loop gather (table fully VMEM-resident) ----
    def vmem_kernel(idx_ref, tab_ref, out_ref):
        def body(j, _):
            r = idx_ref[j]
            out_ref[pl.ds(j, 1), :] = tab_ref[pl.ds(r, 1), :]
            return 0

        lax.fori_loop(0, B, body, 0)

    @jax.jit
    def vmem_gather(tab, idx):
        return pl.pallas_call(
            vmem_kernel,
            grid=(N // B,),
            in_specs=[
                pl.BlockSpec((B,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tab.shape[0], tab.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, tab.shape[1]), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, tab.shape[1]), tab.dtype),
        )(idx, tab)

    try:
        dt, out = time_fn_async(vmem_gather, tri, idx_tri, iters=args.iters)
        ok = bool(jnp.all(out[:64] == jnp.take(tri, idx_tri[:64], axis=0)))
        print(f"{'Pallas vmem-loop tri':34s} {dt*1e3:7.2f} ms  "
              f"{N/dt/1e6:6.1f} M rows/s  ok={ok}", flush=True)
    except Exception as e:
        print(f"Pallas vmem-loop tri FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    # ---- Pallas HBM DMA-ring gather ----
    def make_dma_kernel(K, C, dtype):
        def dma_kernel(idx_ref, tab_ref, out_ref, sems):
            def issue(j):
                r = idx_ref[j]
                pltpu.make_async_copy(
                    tab_ref.at[pl.ds(r, 1), :],
                    out_ref.at[pl.ds(j, 1), :],
                    sems.at[lax.rem(j, K)],
                ).start()

            def wait(j):
                # same-shaped descriptor; wait() blocks on the semaphore
                # for the row's byte count
                pltpu.make_async_copy(
                    tab_ref.at[pl.ds(0, 1), :],
                    out_ref.at[pl.ds(j, 1), :],
                    sems.at[lax.rem(j, K)],
                ).wait()

            def body(j, _):
                @pl.when(j < B)
                def _():
                    issue(j)

                @pl.when(j >= K)
                def _():
                    wait(j - K)

                return 0

            lax.fori_loop(0, B + K, body, 0)

        return dma_kernel

    for K in (8, 16, 32):
        try:
            @jax.jit
            def dma_gather(tab, idx, K=K):
                return pl.pallas_call(
                    make_dma_kernel(K, tab.shape[1], tab.dtype),
                    grid=(N // B,),
                    in_specs=[
                        pl.BlockSpec((B,), lambda i: (i,),
                                     memory_space=pltpu.SMEM),
                        pl.BlockSpec(memory_space=pltpu.ANY),
                    ],
                    out_specs=pl.BlockSpec((B, tab.shape[1]),
                                           lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((N, tab.shape[1]),
                                                   tab.dtype),
                    scratch_shapes=[pltpu.SemaphoreType.DMA((K,))],
                    compiler_params=pltpu.CompilerParams(
                        has_side_effects=True),
                )(idx, tab)

            dt, out = time_fn_async(dma_gather, atl, idx_atl,
                                    iters=args.iters)
            ok = bool(jnp.all(out[:64] == jnp.take(atl, idx_atl[:64],
                                                   axis=0)))
            print(f"{'Pallas hbm-dma-ring K=%d atlas' % K:34s} "
                  f"{dt*1e3:7.2f} ms  {N/dt/1e6:6.1f} M rows/s  ok={ok}",
                  flush=True)
        except Exception as e:
            print(f"Pallas hbm-dma-ring K={K} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
