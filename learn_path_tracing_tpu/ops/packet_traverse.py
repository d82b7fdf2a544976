"""Packet wide-BVH traversal as a Pallas TPU kernel.

TPU-native mesh acceleration. The XLA lockstep traversal
(accel/traverse.py, accel/wide.py) is bound by per-lane gathers — XLA
``take`` on this hardware runs at ~0.2 G rows/s, and a 23k-triangle mesh
needs ~10^2 gathers per ray — so a full legacy pass measured *seconds* at
640x360. TPUs have no per-lane scatter/gather worth using, but they have a
fast scalar core, real scalar control flow, and block-level dynamic slices.

This kernel exploits that with classic *packet traversal*: a block of rays
shares ONE traversal stack held in SMEM and walked by the scalar core. Per
iteration the packet pops one wide-BVH node, fetches its 8 child AABBs with
a single dynamic VMEM row slice (no per-lane gather anywhere), slab-tests
all lanes against each child as dense vector ops, and pushes children that
any live lane hits. Leaf runs are pre-gathered into per-run rows holding up
to 8 triangles in plane/barycentric *coefficient* form, so a leaf pop is one
row fetch plus dense lane math.

Traversal cost is the union of nodes the packet's rays need — near the
single-ray cost for coherent primary blocks, graceful degradation (bounded
by tree size, never a hang) for incoherent bounce wavefronts. Per-lane
``t``-pruning plus any-live-lane masking keep the union tight.

Matches hit semantics of the reference's per-thread stack walk
(/root/reference/legacy/PT_in_one_weekend/15_module.py:756-779) with the
same plane-then-barycentric triangle test (:909-953), algebraically
refactored into precomputed per-triangle coefficients:
  t  = (d - ro.n) / (rd.n)
  w1 = ro.g1 + t (rd.g1) + c1      (w2 analogous, w3 = 1 - w1 - w2)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.wide import WIDTH, WideBVH, decode_leaf, _PAD

import os

RAY_BLOCK = int(os.environ.get("LPT_PACKET_BLOCK", "2048"))
SLOT_F = 12            # floats per triangle slot (n, d, g1, c1, g2, c2)
SLOTS = 8              # triangle slots per run row
_PRIM_COL = SLOT_F * SLOTS  # cols 96..103: original prim index per slot (f32)
_ENC = 64

# ray input rows: ro.xyz, rd.xyz, t_init, active
_RO, _RD, _TINIT, _ACTIVE = 0, 3, 6, 7


def pack_packet_tables(wbvh: WideBVH, v0, v1, v2):
    """Build kernel tables from a WideBVH over triangles.

    Returns (nodes f32[M,128], entries i32[M,128], runs f32[R,128],
    new_entries_meta) where entries' leaf codes are re-encoded to
    ``-(run_row * 64 + count + 1)`` and each run row packs up to 8
    triangles' precomputed coefficients plus the run's prim start.
    """
    m = wbvh.child_entry.shape[0]
    child_low = np.asarray(wbvh.child_low)     # [M,8,3]
    child_high = np.asarray(wbvh.child_high)
    child_entry = np.asarray(wbvh.child_entry)  # [M,8]
    prim = np.asarray(wbvh.prim)
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)

    # nodes: component-major AABB columns — cols c + 8*d:
    #   d in 0..5 = (lo.x, lo.y, lo.z, hi.x, hi.y, hi.z), c = child slot.
    nodes = np.zeros((m, 128), np.float32)
    for d in range(3):
        nodes[:, d * 8:(d + 1) * 8] = child_low[:, :, d]
        nodes[:, (3 + d) * 8:(4 + d) * 8] = child_high[:, :, d]

    entries = np.full((m, 128), _PAD, np.int32)
    runs = []
    for i in range(m):
        for c in range(WIDTH):
            e = int(child_entry[i, c])
            if e == _PAD:
                continue
            if e >= 0:
                entries[i, c] = e
                continue
            start, count = decode_leaf(np.int32(e))
            start, count = int(start), int(count)
            row = np.zeros((128,), np.float32)
            for j in range(count):
                row[_PRIM_COL + j] = float(prim[start + j])
                p1 = v0[prim[start + j]]
                p2 = v1[prim[start + j]]
                p3 = v2[prim[start + j]]
                n = np.cross(p2 - p1, p3 - p1)
                nn = np.sqrt(np.dot(n, n))
                n = n / max(nn, 1e-20)
                den1 = np.dot(np.cross(p3 - p2, p1 - p2), n)
                den2 = np.dot(np.cross(p1 - p3, p2 - p3), n)
                den1 = den1 if abs(den1) > 1e-20 else 1e-20
                den2 = den2 if abs(den2) > 1e-20 else 1e-20
                g1 = np.cross(n, p3 - p2) / den1
                c1 = -np.dot(np.cross(p3 - p2, p2), n) / den1
                g2 = np.cross(n, p1 - p3) / den2
                c2 = -np.dot(np.cross(p1 - p3, p3), n) / den2
                base = j * SLOT_F
                row[base:base + 3] = n
                row[base + 3] = np.dot(p1, n)
                row[base + 4:base + 7] = g1
                row[base + 7] = c1
                row[base + 8:base + 11] = g2
                row[base + 11] = c2
            entries[i, c] = -(len(runs) * _ENC + count + 1)
            runs.append(row)
    if not runs:
        runs.append(np.zeros((128,), np.float32))
    return (jnp.asarray(nodes), jnp.asarray(entries),
            jnp.asarray(np.stack(runs)))


def _kernel(nodes_ref, entries_ref, runs_ref, rays_ref, t_ref, prim_ref,
            stack_ref, cnt_ref, *, eps, max_iters, cap):
    b = rays_ref.shape[1]
    ro = [rays_ref[_RO + d, :] for d in range(3)]
    rd = [rays_ref[_RD + d, :] for d in range(3)]
    inv = [1.0 / rd[d] for d in range(3)]
    active = rays_ref[_ACTIVE, :] > 0.5

    t_ref[0, :] = rays_ref[_TINIT, :]
    prim_ref[0, :] = jnp.full((b,), -1, jnp.int32)
    stack_ref[0] = jnp.int32(0)  # root node

    def cond(carry):
        sp, it = carry
        return (sp >= 0) & (it < max_iters)

    def body(carry):
        sp, it = carry
        code = stack_ref[sp]
        cnt_ref[0] = jnp.int32(0)
        t_best = t_ref[0, :]

        @pl.when(code >= 0)
        def _node():
            row = nodes_ref[pl.ds(code, 1), :]
            entry_row = entries_ref[pl.ds(code, 1), :]
            pushed = jnp.int32(0)
            for c in range(WIDTH):
                lo = [row[0, d * 8 + c] for d in range(3)]
                hi = [row[0, (3 + d) * 8 + c] for d in range(3)]
                t0 = jnp.full((b,), -jnp.inf, jnp.float32)
                t1 = jnp.full((b,), jnp.inf, jnp.float32)
                for d in range(3):
                    ta = (lo[d] - ro[d]) * inv[d]
                    tb = (hi[d] - ro[d]) * inv[d]
                    t0 = jnp.maximum(t0, jnp.minimum(ta, tb))
                    t1 = jnp.minimum(t1, jnp.maximum(ta, tb))
                ent = entry_row[0, c]
                lane_hit = ((t1 > t0 - eps) & (t1 > 0.0)
                            & (t0 < t_best + eps) & active)
                any_hit = jnp.any(lane_hit) & (ent != _PAD)
                # unconditional scalar write; misses land in the trash slot
                pos = jnp.where(any_hit, sp + pushed, cap - 1)
                stack_ref[pos] = jnp.where(any_hit, ent, stack_ref[cap - 1])
                pushed = pushed + any_hit.astype(jnp.int32)
            cnt_ref[0] = pushed

        @pl.when((code < 0) & (code != _PAD))
        def _leaf():
            v = -(code + 1)
            run = v // _ENC
            count = v % _ENC
            row = runs_ref[pl.ds(run, 1), :]
            t_b = t_ref[0, :]
            p_b = prim_ref[0, :]
            for j in range(SLOTS):
                base = j * SLOT_F
                n = [row[0, base + d] for d in range(3)]
                dconst = row[0, base + 3]
                g1 = [row[0, base + 4 + d] for d in range(3)]
                c1 = row[0, base + 7]
                g2 = [row[0, base + 8 + d] for d in range(3)]
                c2 = row[0, base + 11]
                denom = rd[0] * n[0] + rd[1] * n[1] + rd[2] * n[2]
                ron = ro[0] * n[0] + ro[1] * n[1] + ro[2] * n[2]
                t = (dconst - ron) / denom
                rog1 = ro[0] * g1[0] + ro[1] * g1[1] + ro[2] * g1[2]
                rdg1 = rd[0] * g1[0] + rd[1] * g1[1] + rd[2] * g1[2]
                w1 = rog1 + t * rdg1 + c1
                rog2 = ro[0] * g2[0] + ro[1] * g2[1] + ro[2] * g2[2]
                rdg2 = rd[0] * g2[0] + rd[1] * g2[1] + rd[2] * g2[2]
                w2 = rog2 + t * rdg2 + c2
                w3 = 1.0 - w1 - w2
                pid = row[0, _PRIM_COL + j].astype(jnp.int32)
                ok = ((j < count) & active & (t > eps) & (w1 > 0.0)
                      & (w2 > 0.0) & (w3 > 0.0) & (t < t_b))
                t_b = jnp.where(ok, t, t_b)
                p_b = jnp.where(ok, pid, p_b)
            t_ref[0, :] = t_b
            prim_ref[0, :] = p_b

        return sp - 1 + cnt_ref[0], it + 1

    lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))


def _coherence_order(nodes, ro, rd):
    """Sort key grouping rays by origin cell (16^3 over the root AABB) and
    direction octant, so packet blocks traverse small node unions. Bounce
    wavefronts are incoherent in lane order; unsorted, every 512-lane block
    walks ~the whole tree (~300 ms/pass measured on the 23k-tri Yoimiya
    mesh at 640x360) while the argsort + state gathers cost ~10 ms."""
    lo = jnp.stack([jnp.min(nodes[0, d * 8:(d + 1) * 8]) for d in range(3)])
    hi = jnp.stack([jnp.max(nodes[0, (3 + d) * 8:(4 + d) * 8])
                    for d in range(3)])
    span = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip(((ro - lo) / span * 16.0).astype(jnp.int32), 0, 15)
    octant = ((rd[:, 0] > 0).astype(jnp.int32)
              + 2 * (rd[:, 1] > 0).astype(jnp.int32)
              + 4 * (rd[:, 2] > 0).astype(jnp.int32))
    key = (((q[:, 0] * 16 + q[:, 1]) * 16 + q[:, 2]) * 8) + octant
    return jnp.argsort(key)


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "sort_rays"))
def packet_traverse(nodes, entries, runs, ro, rd, t_init, active,
                    eps: float = 1e-4, interpret: bool = False,
                    sort_rays: bool = True):
    """Nearest-hit packet traversal.

    Args: packed tables from ``pack_packet_tables``; ``ro/rd f32[N,3]``;
    ``t_init f32[N]`` seeds per-lane best-t (cross-structure pruning);
    ``active bool[N]`` masks lanes out of the union entirely.
    ``sort_rays`` groups lanes into coherent packets first (results are
    exact either way; only the block unions change).
    Returns ``(t f32[N] — t_init where unbeaten, prim i32[N] — -1)``.
    """
    n = ro.shape[0]
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    m = nodes.shape[0]

    # Pack the 8 per-ray fields into rows FIRST so the coherence reorder is
    # one row gather instead of 8 separate takes (measured ~10 ms → ~2 ms at
    # 230k rays: XLA takes are row-latency-bound, not byte-bound).
    packed = jnp.concatenate(
        [ro, rd, t_init[:, None], active.astype(jnp.float32)[:, None]],
        axis=1)                                              # [N, 8]
    inv = None
    if sort_rays and n > RAY_BLOCK:
        order = _coherence_order(nodes, ro, rd)
        inv = jnp.argsort(order)  # cheaper than a serialized scatter on TPU
        packed = jnp.take(packed, order, axis=0)

    rays = jnp.zeros((8, n_pad), jnp.float32)
    rays = rays.at[:, :n].set(packed.T)
    rays = rays.at[_TINIT, n:].set(jnp.inf)

    # Shared-stack capacity: each pushed level adds <= 8 entries; the wide
    # tree depth is not carried on WideBVH here, so bound by a generous
    # constant (64 levels of 8) — overflow is impossible below that depth.
    cap = 8 * 64 + 8
    max_iters = 16 * m + 64  # hard termination backstop

    grid = (n_pad // RAY_BLOCK,)
    t, prim = pl.pallas_call(
        functools.partial(_kernel, eps=eps, max_iters=max_iters, cap=cap),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nodes.shape[0], 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((entries.shape[0], 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((runs.shape[0], 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((8 * 64 + 8,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(nodes, entries, runs, rays)
    if inv is not None:
        return jnp.take(t[0, :n], inv, axis=0), jnp.take(prim[0, :n], inv,
                                                         axis=0)
    return t[0, :n], prim[0, :n]
