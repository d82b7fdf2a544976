"""Pallas TPU kernel: brute-force sphere-scan nearest hit.

This is the TPU-native replacement for the reference's per-thread linear
scan (10_final/world.py:24-33) on the hot path. The whole sphere table lives
in VMEM; rays are processed in lane-aligned blocks; every ``[block, chunk]``
quadratic-solve intermediate stays in VMEM (the pure-XLA formulation in
geometry/sphere.py materializes ``[N, S]`` buffers through HBM, which is
bandwidth-bound at full resolution).

v2 design notes:
- the two per-(ray, sphere) dot products ride the MXU as
  ``[3,B]ᵀ·[3,S]`` contractions against *prescaled* center rows
  (``-C`` and ``-2C``), so ``half_b`` and the c-term are single adds;
- rays are passed transposed (``f32[8, N]``: rows x,y,z of ro and rd plus
  the precomputed per-ray ro·rd and ro·ro) so the wavefront axis is the
  128-lane dimension;
- the sphere table is packed ``f32[8, S]``: rows 0-2 = -center, 3-5 =
  -2·center... (see _pack_table), with S padded to a lane multiple.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_BLOCK = 512     # rays per grid step
SPHERE_CHUNK = 512  # sphere columns per inner iteration (bounds VMEM temps)

# ray-array rows
_ROX, _ROY, _ROZ, _RDX, _RDY, _RDZ, _ODD, _OOO = range(8)
# sphere-table rows: 0-2 = -c, 3-5 = -2c, 6 = |c|^2 - r^2, 7 = flags
# flags: 1.0 valid opaque, 2.0 valid transparent, 0.0 padding
_NEGC0, _NEGC1, _NEGC2, _M2C0, _M2C1, _M2C2, _CCC, _FLAG = range(8)


def _kernel(spheres_ref, rays_ref, attrs_ref, t_ref, idx_ref, attr_ref, *,
            s_total, t_min, n_attr):
    rd3 = rays_ref[_RDX:_RDZ + 1, :]          # f32[3, B]
    ro3 = rays_ref[_ROX:_ROZ + 1, :]
    o_dot_d = rays_ref[_ODD, :]               # f32[B]
    o_dot_o = rays_ref[_OOO, :]

    t_best = jnp.full(o_dot_d.shape, jnp.inf, jnp.float32)
    idx_best = jnp.zeros(o_dot_d.shape, jnp.int32)

    dn = (((0,), (0,)), ((), ()))
    for s0 in range(0, s_total, SPHERE_CHUNK):
        sc = min(SPHERE_CHUNK, s_total - s0)
        negc = spheres_ref[_NEGC0:_NEGC2 + 1, s0:s0 + sc]    # [3, sc]
        m2c = spheres_ref[_M2C0:_M2C2 + 1, s0:s0 + sc]
        ccc = spheres_ref[_CCC, s0:s0 + sc]
        flag = spheres_ref[_FLAG, s0:s0 + sc]

        # MXU: half_b = ro·rd - rd·c ; cterm = ro·ro - 2 ro·c + (c·c - r²)
        # precision=HIGHEST: the MXU's default truncates f32 inputs to
        # bf16, which quantizes hit t (visible ring banding on spheres) and
        # shifts normals/fresnel at silhouettes
        g1 = jax.lax.dot_general(rd3, negc, dn,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        g2 = jax.lax.dot_general(ro3, m2c, dn,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        half_b = o_dot_d[:, None] + g1
        cterm = (o_dot_o[:, None] + g2) + ccc[None, :]
        disc = half_b * half_b - cterm
        # Lean validity: sqrt of a negative disc is NaN and every compare
        # with NaN is false, so misses AND padding columns (ccc = +inf →
        # disc = -inf) fall out of the single `t >= t_min` test — no
        # explicit disc>=0 / flag>0.5 lanes. NaN/inf must be selected away
        # BEFORE the min-reduce (min propagates NaN).
        sq = jnp.sqrt(disc)
        t_near = -half_b - sq
        use_far = (t_near < t_min) & (flag[None, :] > 1.5)
        t = jnp.where(use_far, t_near + 2.0 * sq, t_near)
        t = jnp.where(t >= t_min, t, jnp.inf)

        # chunk-local min + first-index argmin
        t_chunk = jnp.min(t, axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        hit_col = jnp.where(t == t_chunk[:, None], col, jnp.int32(2 ** 30))
        idx_chunk = jnp.min(hit_col, axis=1) + s0

        better = t_chunk < t_best
        t_best = jnp.where(better, t_chunk, t_best)
        idx_best = jnp.where(better, idx_chunk, idx_best)

    t_ref[0, :] = t_best
    idx_ref[0, :] = idx_best

    # Epilogue: gather the winning sphere's attribute rows with a one-hot
    # MXU contraction — an exact gather (one nonzero per column, products
    # exact) that replaces XLA's serialized per-row takes on the host side
    # (measured ~52 ms/pass at 1280x720 in round 2 profiling).
    if n_attr:
        rows = jax.lax.broadcasted_iota(jnp.int32, (s_total, t_best.shape[0]), 0)
        onehot = (rows == idx_best[None, :]).astype(jnp.float32)   # [S, B]
        attr_ref[:, :] = jax.lax.dot_general(
            attrs_ref[:, :], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def intersect_spheres_pallas(ro, rd, centers, radii, transparency, t_min=1e-4,
                             interpret=False, attrs=None):
    """Drop-in replacement for geometry.sphere.intersect_spheres on TPU.

    ``interpret=True`` runs the kernel in the Pallas interpreter (for CPU
    testing of kernel semantics).

    ``attrs``: optional ``f32[A, S]`` per-sphere attribute rows (A a multiple
    of 8). When given, a third output ``f32[A, N]`` holds each ray's winning
    sphere's attribute column (zeros-row sphere 0 for misses — callers mask
    with ``isfinite(t)``), gathered in-kernel on the MXU.
    """
    n = ro.shape[0]
    s = centers.shape[0]
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    s_pad = -(-s // 128) * 128

    rays = jnp.zeros((8, n_pad), jnp.float32)
    rays = rays.at[_ROX:_ROZ + 1, :n].set(ro.T)
    rays = rays.at[_RDX:_RDZ + 1, :n].set(rd.T)
    rays = rays.at[_ODD, :n].set(jnp.sum(ro * rd, axis=-1))
    rays = rays.at[_OOO, :n].set(jnp.sum(ro * ro, axis=-1))

    # Padding and radius<=0 columns get ccc = +inf so their disc is -inf
    # (NaN after sqrt) — they can never win the nearest-hit min.
    table = jnp.zeros((8, s_pad), jnp.float32)
    table = table.at[_CCC, :].set(jnp.inf)
    table = table.at[_NEGC0:_NEGC2 + 1, :s].set(-centers.T)
    table = table.at[_M2C0:_M2C2 + 1, :s].set(-2.0 * centers.T)
    table = table.at[_CCC, :s].set(jnp.where(
        radii > 0, jnp.sum(centers * centers, -1) - radii * radii, jnp.inf))
    flags = jnp.where(radii > 0,
                      jnp.where(transparency > 0, 2.0, 1.0), 0.0)
    table = table.at[_FLAG, :s].set(flags)

    n_attr = 0 if attrs is None else attrs.shape[0]
    if n_attr:
        attr_tab = jnp.zeros((n_attr, s_pad), jnp.float32)
        attr_tab = attr_tab.at[:, :s].set(attrs.astype(jnp.float32))
    else:
        attr_tab = jnp.zeros((8, s_pad), jnp.float32)  # unused placeholder

    grid = (n_pad // RAY_BLOCK,)
    outs = pl.pallas_call(
        functools.partial(_kernel, s_total=s_pad, t_min=t_min, n_attr=n_attr),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, s_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((attr_tab.shape[0], s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((max(n_attr, 8), RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((max(n_attr, 8), n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(table, rays, attr_tab)
    t, idx, attr = outs
    if n_attr:
        return t[0, :n], idx[0, :n], attr[:, :n]
    return t[0, :n], idx[0, :n]
