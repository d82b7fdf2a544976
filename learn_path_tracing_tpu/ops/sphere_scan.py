"""Pallas TPU kernel: brute-force sphere-scan nearest hit.

This is the TPU-native replacement for the reference's per-thread linear
scan (10_final/world.py:24-33) on the hot path. The whole sphere table lives
in VMEM; rays are processed in lane-aligned blocks; every ``[block, chunk]``
quadratic-solve intermediate stays in VMEM (the pure-XLA formulation in
geometry/sphere.py materializes ``[N, S]`` buffers through HBM, which is
bandwidth-bound at full resolution).

Layout: rays are passed transposed (``f32[3, N]``) so the wavefront axis is
the 128-lane dimension; the sphere table is packed as ``f32[8, S]`` rows
(cx, cy, cz, |c|²-r², transparent?, valid?, pad, pad) with S a lane multiple.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_BLOCK = 512     # rays per grid step
SPHERE_CHUNK = 512  # sphere columns per inner iteration (bounds VMEM temps)
_NEG = -1.0e30      # "minus infinity" stand-in that survives f32 arithmetic


def _kernel(spheres_ref, ro_ref, rd_ref, t_ref, idx_ref, *, s_total, t_min):
    rox, roy, roz = ro_ref[0, :], ro_ref[1, :], ro_ref[2, :]
    rdx, rdy, rdz = rd_ref[0, :], rd_ref[1, :], rd_ref[2, :]
    o_dot_d = rox * rdx + roy * rdy + roz * rdz   # f32[B]
    o_dot_o = rox * rox + roy * roy + roz * roz

    t_best = jnp.full(rox.shape, jnp.inf, jnp.float32)
    idx_best = jnp.zeros(rox.shape, jnp.int32)

    for s0 in range(0, s_total, SPHERE_CHUNK):
        sc = min(SPHERE_CHUNK, s_total - s0)
        cx = spheres_ref[0, s0:s0 + sc]
        cy = spheres_ref[1, s0:s0 + sc]
        cz = spheres_ref[2, s0:s0 + sc]
        ccc = spheres_ref[3, s0:s0 + sc]   # |c|^2 - r^2
        transp = spheres_ref[4, s0:s0 + sc]
        valid_s = spheres_ref[5, s0:s0 + sc]

        # Outer-product broadcasts: [B, 1] x [1, S_c] -> [B, S_c] in VMEM.
        d_dot_c = rdx[:, None] * cx[None, :] + rdy[:, None] * cy[None, :] \
            + rdz[:, None] * cz[None, :]
        o_dot_c = rox[:, None] * cx[None, :] + roy[:, None] * cy[None, :] \
            + roz[:, None] * cz[None, :]
        half_b = o_dot_d[:, None] - d_dot_c
        cterm = o_dot_o[:, None] - 2.0 * o_dot_c + ccc[None, :]
        disc = half_b * half_b - cterm
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_near = -half_b - sq
        t_far = -half_b + sq
        t = jnp.where((t_near < t_min) & (transp[None, :] > 0.0), t_far, t_near)
        ok = (disc >= 0.0) & (t >= t_min) & (valid_s[None, :] > 0.0)
        t = jnp.where(ok, t, jnp.inf)

        # Chunk-local min + argmin (argmin via max over encoded negatives so
        # ties resolve to the lowest index, matching the reference's scan).
        t_chunk = jnp.min(t, axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        hit_col = jnp.where(t == t_chunk[:, None], col, jnp.int32(2**30))
        idx_chunk = jnp.min(hit_col, axis=1) + s0

        better = t_chunk < t_best
        t_best = jnp.where(better, t_chunk, t_best)
        idx_best = jnp.where(better, idx_chunk, idx_best)

    t_ref[0, :] = t_best
    idx_ref[0, :] = idx_best


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def intersect_spheres_pallas(ro, rd, centers, radii, transparency, t_min=1e-4,
                             interpret=False):
    """Drop-in replacement for geometry.sphere.intersect_spheres on TPU.

    ``interpret=True`` runs the kernel in the Pallas interpreter (for CPU
    testing of kernel semantics).
    """
    n = ro.shape[0]
    s = centers.shape[0]
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    s_pad = -(-s // 128) * 128

    ro_t = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(ro.T)
    rd_t = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(rd.T)

    table = jnp.zeros((8, s_pad), jnp.float32)
    table = table.at[0:3, :s].set(centers.T)
    table = table.at[3, :s].set(jnp.sum(centers * centers, -1) - radii * radii)
    table = table.at[4, :s].set((transparency > 0).astype(jnp.float32))
    table = table.at[5, :s].set((radii > 0).astype(jnp.float32))

    grid = (n_pad // RAY_BLOCK,)
    t, idx = pl.pallas_call(
        functools.partial(_kernel, s_total=s_pad, t_min=t_min),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, s_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RAY_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RAY_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(table, ro_t, rd_t)
    return t[0, :n], idx[0, :n]
