"""Pallas TPU kernel: brute-force sphere-scan nearest hit.

This is the TPU-native replacement for the reference's per-thread linear
scan (10_final/world.py:24-33) on the hot path. The whole sphere table lives
in VMEM; rays are processed in lane-aligned blocks; every ``[block, chunk]``
quadratic-solve intermediate stays in VMEM (the pure-XLA formulation in
geometry/sphere.py materializes ``[N, S]`` buffers through HBM, which is
bandwidth-bound at full resolution).

v3 design notes (precision):
- The v2 kernel rode the MXU with an *expanded* quadratic
  (``rd·(-c)``/``ro·(-2c)`` contractions). Mosaic lowers f32 matmuls at
  bf16 input precision (like XLA:TPU's default), which quantized hit ``t``
  — visible ring banding on every sphere and a fresnel/normal bias on the
  stage-8 glass (golden mean error 3.1/255); ``precision=HIGHEST`` fixed
  quality but fell off the MXU fast path (headline 68.7 → 43.7 Mrays/s).
  v3 instead evaluates the reference's well-conditioned per-pair form
  (``oc = ro - c`` first, 8_refract/world.py:45-57) as dense f32 VPU math
  over ``[block, chunk]`` tiles — exact f32, same conditioning as the
  reference, no MXU in the search at all (measured within ~15% of v2's
  speed: the scan was VPU/latency-bound, not MXU-bound).
- The winning sphere's 16 attribute values are still gathered with a
  one-hot MXU contraction, exact via a static 3-way bf16 split of the
  attribute table (hi/mid/lo rows reconstruct f32 to 2^-26; the one-hot
  operand is exactly representable, so each partial product is exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

RAY_BLOCK = int(os.environ.get("LPT_SPHERE_BLOCK", "1024"))  # rays per grid step (1024 measured best: 82.8 vs 81.5 Mrays/s at 512; 2048 exceeds VMEM)
SPHERE_CHUNK = 512  # sphere columns per inner iteration (bounds VMEM temps)

# ray-array rows (rays on the lane axis)
_ROX, _ROY, _ROZ, _RDX, _RDY, _RDZ = range(6)
# sphere-table columns of the [S, 8] sphere-major table: 0-2 = center,
# 3 = r^2, 4 = flags (1.0 valid opaque, 2.0 valid transparent, 0.0 padding)
_CX, _CY, _CZ, _R2, _FLAG = range(5)


def _kernel(spheres_ref, rays_ref, attrs_ref, t_ref, idx_ref, attr_ref, *,
            s_total, t_min, n_attr):
    b = rays_ref.shape[1]
    # rays as [1, B] rows, spheres as [sc, 1] columns → every per-pair
    # intermediate is [sc, B] with spheres on sublanes and rays on lanes;
    # no lane↔sublane transposes anywhere (Mosaic lowers those terribly)
    ro = [rays_ref[_ROX + d:_ROX + d + 1, :] for d in range(3)]   # [1, B]
    rd = [rays_ref[_RDX + d:_RDX + d + 1, :] for d in range(3)]

    t_best = jnp.full((1, b), jnp.inf, jnp.float32)
    idx_best = jnp.zeros((1, b), jnp.int32)

    for s0 in range(0, s_total, SPHERE_CHUNK):
        sc = min(SPHERE_CHUNK, s_total - s0)
        c = [spheres_ref[s0:s0 + sc, _CX + d:_CX + d + 1] for d in range(3)]
        r2 = spheres_ref[s0:s0 + sc, _R2:_R2 + 1]                 # [sc, 1]
        flag = spheres_ref[s0:s0 + sc, _FLAG:_FLAG + 1]

        # exact f32 per-pair quadratic, reference formulation
        # (oc = ro - c; half_b = -oc·rd; c0 = oc·oc - r²)
        oc = [ro[d] - c[d] for d in range(3)]                     # [sc, B]
        half_b = -(oc[0] * rd[0] + oc[1] * rd[1] + oc[2] * rd[2])
        c0 = oc[0] * oc[0] + oc[1] * oc[1] + oc[2] * oc[2] - r2
        disc = half_b * half_b - c0
        # sqrt of negative disc is NaN; every compare with NaN is false, so
        # misses AND padding rows (r2 = -inf → disc = -inf) fall out of
        # the single t >= t_min test. NaN/inf must be selected away BEFORE
        # the min-reduce (min propagates NaN).
        sq = jnp.sqrt(disc)
        t_near = half_b - sq
        use_far = (t_near < t_min) & (flag > 1.5)
        t = jnp.where(use_far, half_b + sq, t_near)
        t = jnp.where(t >= t_min, t, jnp.inf)

        # chunk-local min + first-index argmin over the sphere (sublane) axis
        t_chunk = jnp.min(t, axis=0, keepdims=True)               # [1, B]
        row = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
        hit_row = jnp.where(t == t_chunk, row, jnp.int32(2 ** 30))
        idx_chunk = jnp.min(hit_row, axis=0, keepdims=True) + s0

        better = t_chunk < t_best
        t_best = jnp.where(better, t_chunk, t_best)
        idx_best = jnp.where(better, idx_chunk, idx_best)

    t_ref[0, :] = t_best[0]
    idx_ref[0, :] = idx_best[0]

    # Epilogue: gather the winning sphere's attribute rows with a one-hot
    # MXU contraction — exact despite Mosaic's bf16 matmul inputs because
    # the table is pre-split into 3 bf16-representable magnitude levels
    # (hi/mid/lo; one-hot entries are 0/1, so every product is exact and
    # the f32 accumulator reconstructs the value to 2^-26).
    if n_attr:
        rows = jax.lax.broadcasted_iota(jnp.int32, (s_total, b), 0)
        onehot = (rows == idx_best).astype(jnp.float32)            # [S, B]
        part = jax.lax.dot_general(
            attrs_ref[:, :], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                    # [3A, B]
        attr_ref[:, :] = (part[0:n_attr, :] + part[n_attr:2 * n_attr, :]
                          + part[2 * n_attr:3 * n_attr, :])


def _split3(v):
    """Static 3-way bf16 magnitude split: v ≈ hi + mid + lo with every part
    exactly bf16-representable (reconstruction error ≤ |v|·2^-26)."""
    hi = v.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = v - hi
    mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
    lo = (r1 - mid).astype(jnp.bfloat16).astype(jnp.float32)
    return hi, mid, lo


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

    # Sphere-major table [s_pad, 8] (spheres on sublanes in-kernel).
    # Padding and radius<=0 rows get r2 = -inf so their disc is -inf
    # (NaN after sqrt) — they can never win the nearest-hit min.
    table = jnp.zeros((s_pad, 8), jnp.float32)
    table = table.at[:, _R2].set(-jnp.inf)
    table = table.at[:s, _CX:_CZ + 1].set(centers)
    table = table.at[:s, _R2].set(jnp.where(
        radii > 0, radii * radii, -jnp.inf))
    flags = jnp.where(radii > 0,
                      jnp.where(transparency > 0, 2.0, 1.0), 0.0)
    table = table.at[:s, _FLAG].set(flags)

    n_attr = 0 if attrs is None else attrs.shape[0]
    if n_attr:
        a = jnp.zeros((n_attr, s_pad), jnp.float32)
        a = a.at[:, :s].set(attrs.astype(jnp.float32))
        attr_tab = jnp.concatenate(_split3(a), axis=0)   # [3A, s_pad]
    else:
        attr_tab = jnp.zeros((8, s_pad), jnp.float32)  # unused placeholder

    grid = (n_pad // RAY_BLOCK,)
    outs = pl.pallas_call(
        functools.partial(_kernel, s_total=s_pad, t_min=t_min, n_attr=n_attr),
        grid=grid,
        in_specs=[
            pl.BlockSpec((s_pad, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
