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

from ..accel.wide import WIDTH, WideBVH, decode_leaf, _PAD, _SORT8 as _SORT8_PAIRS

import os

RAY_BLOCK = int(os.environ.get("LPT_PACKET_BLOCK", "1024"))  # 1024 measured best on Yoimiya end-to-end (8.42 vs 8.06 Mrays/s at 2048): smaller packets walk smaller node unions; 512 and 4096 hang the Mosaic compiler
# Default kernel version for callers that don't pass one (hit_legacy's
# composed and fused paths). 2 = full-block v2, 3 = tile-ranged v3.
PACKET_VERSION = int(os.environ.get("LPT_PACKET_VERSION", "2"))
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
            if count > 2 * SLOTS:
                raise ValueError(
                    f"leaf run of {count} tris exceeds the kernels' 2-row "
                    f"unroll (max_leaf <= {2 * SLOTS})")
            # run rows are coefficient-major: coefficient k of slot j lives
            # at col k*8 + j, so the kernel slices each coefficient as a
            # static [8]-vector and the whole leaf phase vectorizes over
            # slots. Runs over 8 tris spill into a SECOND consecutive row —
            # fat leaves cost extra dense vector math but no extra pop.
            entries[i, c] = -(len(runs) * _ENC + count + 1)
            for r0 in range(0, count, SLOTS):
                row = np.zeros((128,), np.float32)
                for j in range(min(SLOTS, count - r0)):
                    row[_PRIM_COL + j] = float(prim[start + r0 + j])
                    p1 = v0[prim[start + r0 + j]]
                    p2 = v1[prim[start + r0 + j]]
                    p3 = v2[prim[start + r0 + j]]
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
                    coefs = [n[0], n[1], n[2], np.dot(p1, n),
                             g1[0], g1[1], g1[2], c1,
                             g2[0], g2[1], g2[2], c2]
                    for k, val in enumerate(coefs):
                        row[k * WIDTH + j] = val
                # empty slots must never report a hit: plane at infinity
                for j in range(min(SLOTS, count - r0), SLOTS):
                    row[3 * WIDTH + j] = np.inf  # d = inf → t = inf
                runs.append(row)
    if not runs:
        runs.append(np.zeros((128,), np.float32))
    return (jnp.asarray(nodes), jnp.asarray(entries),
            jnp.asarray(np.stack(runs)))


def nodes_to_bf16(nodes):
    """bf16 copy of a packet ``nodes`` table with OUTWARD rounding: lo
    columns round toward -inf, hi columns toward +inf, so every bf16 box
    contains its f32 box (the exact-superset half of the bf16-slab
    ablation; see _kernel_v2's bf16_slab note for the half it cannot
    give you)."""
    import ml_dtypes

    nodes = np.asarray(nodes, np.float32)
    near = nodes.astype(ml_dtypes.bfloat16)
    back = near.astype(np.float32)
    bits = near.view(np.uint16)
    # step one bf16 ulp away from zero / toward the required direction
    def step(b, up):
        # up=True: toward +inf; works across signs via sign-magnitude ulp
        pos = (b & 0x8000) == 0
        inc = np.where(pos == up, b + 1, b - 1).astype(np.uint16)
        # zero crossing: -0/+0 handled by flipping to smallest magnitude
        inc = np.where((b & 0x7FFF) == 0,
                       np.uint16(1) | np.where(up, 0, 0x8000).astype(
                           np.uint16), inc)
        return inc

    out = bits.copy()
    for d in range(3):          # lo columns: need bf16 <= f32
        cols = slice(d * 8, (d + 1) * 8)
        need = back[:, cols] > nodes[:, cols]
        out[:, cols] = np.where(need, step(bits[:, cols], up=False),
                                bits[:, cols])
    for d in range(3, 6):       # hi columns: need bf16 >= f32
        cols = slice(d * 8, (d + 1) * 8)
        need = back[:, cols] < nodes[:, cols]
        out[:, cols] = np.where(need, step(bits[:, cols], up=True),
                                bits[:, cols])
    return jnp.asarray(out.view(ml_dtypes.bfloat16).astype(jnp.bfloat16))


def pack_sphere_packet_tables(wbvh: WideBVH, centers, radii, transparency):
    """Build packet-kernel tables for a sphere-leaf wide BVH.

    Same (nodes, entries, runs) contract as ``pack_packet_tables`` but each
    run row packs up to 8 SPHERES in quadratic-coefficient form: cols
    ``k*8 + j`` for k = (cx, cy, cz, r^2, flag) with flag 1 = opaque,
    2 = transparent (the far-root rule of the reference's sphere_hit,
    15_module.py:864-896 / 8_refract/world.py:55-56); empty slots carry
    r^2 = -inf so their discriminant is -inf and never hits. This is the
    device-side sphere BVH the reference traverses (11_bvh.py:331-380),
    realized as packet traversal — used above the brute-scan ceiling where
    O(S)-per-ray stops being the right trade (scene/legacy_world.py).
    """
    m = wbvh.child_entry.shape[0]
    child_entry = np.asarray(wbvh.child_entry)
    child_low = np.asarray(wbvh.child_low)
    child_high = np.asarray(wbvh.child_high)
    prim = np.asarray(wbvh.prim)
    centers = np.asarray(centers, np.float32)
    radii = np.asarray(radii, np.float32)
    transparency = np.asarray(transparency, np.float32)

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
            if count > 2 * SLOTS:
                raise ValueError(
                    f"leaf run of {count} spheres exceeds the kernels' "
                    f"2-row unroll (max_leaf <= {2 * SLOTS})")
            entries[i, c] = -(len(runs) * _ENC + count + 1)
            for r0 in range(0, count, SLOTS):
                row = np.zeros((128,), np.float32)
                row[3 * WIDTH:4 * WIDTH] = -np.inf   # empty: r^2 = -inf
                for j in range(min(SLOTS, count - r0)):
                    p = int(prim[start + r0 + j])
                    row[_PRIM_COL + j] = float(p)
                    row[0 * WIDTH + j] = centers[p, 0]
                    row[1 * WIDTH + j] = centers[p, 1]
                    row[2 * WIDTH + j] = centers[p, 2]
                    row[3 * WIDTH + j] = radii[p] * radii[p]
                    row[4 * WIDTH + j] = 2.0 if transparency[p] > 0 else 1.0
                runs.append(row)
    if not runs:
        runs.append(np.zeros((128,), np.float32))
        runs[0][3 * WIDTH:4 * WIDTH] = -np.inf
    return (jnp.asarray(nodes), jnp.asarray(entries),
            jnp.asarray(np.stack(runs)))


def _kernel(nodes_ref, entries_ref, runs_ref, rays_ref, entn_ref, t_ref,
            prim_ref, iters_ref, stack_ref, stack_t_ref, cnt_ref, *, eps,
            max_iters, cap):
    # (entn_ref — the v2 entered-prefix gate — is accepted but unused:
    # v1 is the ablation baseline and always runs the full loop.)
    """Ordered packet traversal, child-axis-vectorized.

    Per iteration the scalar core pops one (code, t0) entry; all per-child
    work runs as [8, B] vector ops built from STATIC row slices (the round-1
    kernel did 48 scalar VMEM loads + 8 any-reductions per node — the
    measured per-iteration bottleneck). Children are pushed near-to-far
    (vector sorting network) with their packet-entry distance on a parallel
    f32 stack; pops whose recorded t0 can no longer beat any active lane's
    best-t are skipped in O(1) (t_cap, tightened after every leaf).
    """
    b = rays_ref.shape[1]
    ro2 = [rays_ref[_RO + d:_RO + d + 1, :] for d in range(3)]   # [1,B]
    rd2 = [rays_ref[_RD + d:_RD + d + 1, :] for d in range(3)]
    inv2 = [1.0 / rd2[d] for d in range(3)]
    # Inactive lanes arrive with t_init = -inf (encoded by the wrapper):
    # every `< t_best + eps` test is then false, so no per-pop active-mask
    # AND is needed anywhere; the wrapper restores their original t after.
    t_ref[0, :] = rays_ref[_TINIT, :]
    prim_ref[0, :] = jnp.full((b,), -1, jnp.int32)
    stack_ref[0] = jnp.int32(0)   # root node
    stack_t_ref[0] = jnp.float32(0.0)
    t_cap0 = jnp.max(rays_ref[_TINIT, :])  # -inf lanes never raise the cap

    def cond(carry):
        sp, it, t_cap = carry
        return (sp >= 0) & (it < max_iters)

    def body(carry):
        sp, it, t_cap = carry
        code = stack_ref[sp]
        t0_pop = stack_t_ref[sp]
        cnt_ref[0] = jnp.int32(0)
        live = t0_pop < t_cap + eps   # stale entries pop in O(1)

        @pl.when(live & (code >= 0))
        def _node():
            row = nodes_ref[pl.ds(code, 1), :]
            # static column slices → [8,1] child vectors; slab test is pure
            # [8,B] vector math, no scalar loads.
            t0 = jnp.full((WIDTH, b), -jnp.inf, jnp.float32)
            t1 = jnp.full((WIDTH, b), jnp.inf, jnp.float32)
            for d in range(3):
                lo = row[0, d * 8:(d + 1) * 8].reshape(WIDTH, 1)
                hi = row[0, (3 + d) * 8:(4 + d) * 8].reshape(WIDTH, 1)
                ta = (lo - ro2[d]) * inv2[d]
                tb = (hi - ro2[d]) * inv2[d]
                t0 = jnp.maximum(t0, jnp.minimum(ta, tb))
                t1 = jnp.minimum(t1, jnp.maximum(ta, tb))
            t_best2 = t_ref[0:1, :]
            lane_hit = ((t1 > t0 - eps) & (t1 > 0.0)
                        & (t0 < t_best2 + eps))                # [8,B]
            ent = entries_ref[pl.ds(code, 1), 0:WIDTH].reshape(WIDTH, 1)
            # packet entry distance per child — doubles as the validity
            # signal (tmin = +inf ⟺ no lane hit), saving a second full
            # cross-lane reduction per pop
            tmin = jnp.min(jnp.where(lane_hit, jnp.maximum(t0, 0.0),
                                     jnp.inf), axis=1, keepdims=True)
            key = jnp.where(ent != _PAD, tmin, jnp.inf)        # [8,1]
            # extract to scalars once, then a scalar sorting network orders
            # children near-to-far (misses carry +inf keys, sink to tail)
            keyv = [key[c, 0] for c in range(WIDTH)]
            entv = [ent[c, 0] for c in range(WIDTH)]
            for a_, b_ in _SORT8_PAIRS:
                swap = keyv[a_] > keyv[b_]
                ka = jnp.where(swap, keyv[b_], keyv[a_])
                kb = jnp.where(swap, keyv[a_], keyv[b_])
                va = jnp.where(swap, entv[b_], entv[a_])
                vb = jnp.where(swap, entv[a_], entv[b_])
                keyv[a_], keyv[b_] = ka, kb
                entv[a_], entv[b_] = va, vb
            valids = [jnp.isfinite(keyv[c]).astype(jnp.int32)
                      for c in range(WIDTH)]
            pushed = sum(valids)
            # push far-to-near so the nearest child pops first; sorted slot
            # c lands at sp + (pushed-1-c), misses land in the trash slot
            for c in range(WIDTH):
                valid = valids[c] > 0
                pos = jnp.where(valid, sp + pushed - 1 - c, cap - 1)
                stack_ref[pos] = jnp.where(valid, entv[c], stack_ref[cap - 1])
                stack_t_ref[pos] = jnp.where(valid, keyv[c],
                                             stack_t_ref[cap - 1])
            cnt_ref[0] = pushed

        @pl.when(live & (code < 0) & (code != _PAD))
        def _leaf():
            v = -(code + 1)
            run = v // _ENC

            def test_row(row_idx):
                row = runs_ref[pl.ds(row_idx, 1), :]

                def coef(k):
                    return row[0, k * WIDTH:(k + 1) * WIDTH].reshape(WIDTH, 1)

                # all 8 slots tested as [8,B] vector math (empty slots
                # packed with d=+inf → t=+inf, never a hit)
                denom = (rd2[0] * coef(0) + rd2[1] * coef(1)
                         + rd2[2] * coef(2))
                ron = (ro2[0] * coef(0) + ro2[1] * coef(1)
                       + ro2[2] * coef(2))
                t = (coef(3) - ron) / denom
                w1 = (ro2[0] * coef(4) + ro2[1] * coef(5) + ro2[2] * coef(6)
                      + t * (rd2[0] * coef(4) + rd2[1] * coef(5)
                             + rd2[2] * coef(6)) + coef(7))
                w2 = (ro2[0] * coef(8) + ro2[1] * coef(9) + ro2[2] * coef(10)
                      + t * (rd2[0] * coef(8) + rd2[1] * coef(9)
                             + rd2[2] * coef(10)) + coef(11))
                w3 = 1.0 - w1 - w2
                t_b = t_ref[0, :]
                # inactive lanes have t_b = -inf → never ok, no mask needed
                ok = ((t > eps) & (w1 > 0.0) & (w2 > 0.0) & (w3 > 0.0)
                      & (t < t_b[None, :]))                     # [8,B]
                t_masked = jnp.where(ok, t, jnp.inf)
                t_new = jnp.min(t_masked, axis=0)               # [B]
                improved = jnp.isfinite(t_new) & (t_new < t_b)
                # winning slot → prim id: static unroll of 8 [B]-wide selects
                pid = prim_ref[0, :]
                for j in reversed(range(SLOTS)):  # earliest slot wins ties
                    won = improved & (t_masked[j, :] == t_new)
                    pid = jnp.where(won,
                                    row[0, _PRIM_COL + j].astype(jnp.int32),
                                    pid)
                t_ref[0, :] = jnp.where(improved, t_new, t_b)
                prim_ref[0, :] = pid

            test_row(run)

            @pl.when(v % _ENC > SLOTS)   # fat leaf: second spill row
            def _row2():
                test_row(run + 1)

        # tighten the stale-pop cap after leaves (where t_best improves);
        # inactive lanes sit at -inf and never raise the max
        new_cap = jnp.where(
            live & (code < 0) & (code != _PAD),
            jnp.max(t_ref[0, :]), t_cap)
        return sp - 1 + cnt_ref[0], it + 1, new_cap

    _, it_final, _ = lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), t_cap0))
    # per-block traversal length (perf telemetry), broadcast across the row
    # (TPU lowering requires lane-aligned output blocks; SMEM (1,1) blocks
    # with a gridded index map are rejected)
    iters_ref[0, :] = jnp.full((b,), it_final, jnp.int32)


def _kernel_v2(nodes_ref, entries_ref, runs_ref, rays_ref, entn_ref, *rest,
               eps, max_iters, cap, nstacks=1, leaf_kind="tri",
               seed_init=False):
    """Inline-leaf ordered packet traversal (v2).

    Telemetry on the v1 kernel (scripts/profile_packet_stats.py, Yoimiya
    secondary wavefront) showed where the time actually goes: 56-59% of all
    stack pops are LEAF pops, ~47% of node pops push <=1 child, the
    per-pop cost is ~5x the [8,B] vector-math floor (the 16 vector->scalar
    extracts + scalar sorting network dominate), and the t-cap stale-skip
    NEVER fired (any miss lane pins the block cap at +inf). v2 restructures
    accordingly:

    - leaf children are processed INLINE at the parent's pop, nearest-first,
      via a dynamic fori over an int-keyed removal loop — leaf runs never
      touch the stack (the stack holds interior nodes only);
    - child keys are made UNIQUE as ints ((f32 bits & ~7) | slot — keys are
      >= 0 so the bitcast is order-preserving; the 3 dropped mantissa LSBs
      only perturb ordering, never correctness), so "pop the nearest" is an
      exact one-hot sum, no sorting required;
    - node pushes take fast paths: 0 children = no scalar work at all,
      1 child = two one-hot extracts; only >= 2 (a third of node pops) runs
      the extract-all + sorting-network path;
    - the winning-slot prim id in the leaf test is computed with [1,B]
      vector selects against [1,1] row slices instead of 8 scalar reads;
    - the stale-prune cap lives in SMEM and is refreshed every 4th pop
      (a stale cap only costs missed skips, never wrong results).

    Same hit semantics as _kernel (reference 15_module.py:756-779,909-953).

    ``nstacks > 1`` splits the block into that many independent sub-packets
    traversed INTERLEAVED in one while loop (one pop each per iteration,
    own stack/cap) — built to test whether the pop chain was latency-bound
    (it is NOT: Yoimiya secondary sorted measured 12.76 / 13.27 / 14.44 ms
    for nstacks 1/2/4 on v5e — per-pop cost tracks pure vector throughput,
    so sub-packets only add per-pop overhead). Kept at default 1; exact
    results for any value (tested).

    ``seed_init``: treelet-restart mode (packet_traverse_sorted's
    restart=True): an extra SMEM operand carries, per block, up to 8 stack
    entry codes — the depth-2 treelets some lane of the block ENTERS — and
    their count at col 8. Traversal starts from those (entry distance 0,
    never stale-pruned) instead of the root. Exact: a lane can only hit a
    primitive whose depth-2 ancestor treelet it enters (eps-relaxed slab
    nesting — the same "hit => entered" property the entered-prefix gate
    relies on), so the seeded reachable set equals the root walk's minus
    the top two levels. Blocks whose treelet union exceeds 8 carry count 0
    and fall back to the root walk.
    """
    if seed_init:
        (seed_ref, t_ref, prim_ref, iters_ref, stack_ref, stack_t_ref,
         cnt_ref, cap_ref) = rest
    else:
        (t_ref, prim_ref, iters_ref, stack_ref, stack_t_ref,
         cnt_ref, cap_ref) = rest
    bf16_slab = nodes_ref.dtype == jnp.bfloat16
    b = rays_ref.shape[1]
    sb = b // nstacks
    t_ref[0, :] = rays_ref[_TINIT, :]
    prim_ref[0, :] = jnp.full((b,), -1, jnp.int32)
    imax = jnp.int32(np.int32(2**31 - 1))
    slot8 = jax.lax.broadcasted_iota(jnp.int32, (WIDTH, 1), 0)
    sp0 = jnp.int32(0)
    for h in range(nstacks):
        stack_ref[h * cap] = jnp.int32(0)   # root node
        stack_t_ref[h * cap] = jnp.float32(0.0)
        cap_ref[h] = jnp.max(rays_ref[_TINIT, h * sb:(h + 1) * sb])
    if seed_init:
        if nstacks != 1:
            raise ValueError("seed_init requires nstacks == 1")
        blk = pl.program_id(0)
        scnt = seed_ref[blk, WIDTH]
        use_seed = (scnt >= 1) & (scnt <= WIDTH)

        @pl.when(use_seed)
        def _seed():
            def sbody(j, _):
                stack_ref[j] = seed_ref[blk, j]
                stack_t_ref[j] = jnp.float32(0.0)
                return 0

            lax.fori_loop(0, scnt, sbody, 0)

        sp0 = jnp.where(use_seed, scnt - 1, jnp.int32(0))

    def _make_half(h):
        """Closures for sub-packet ``h``: lanes [h*sb, (h+1)*sb)."""
        lo_l, hi_l = h * sb, (h + 1) * sb
        ro2 = [rays_ref[_RO + d:_RO + d + 1, lo_l:hi_l] for d in range(3)]
        rd2 = [rays_ref[_RD + d:_RD + d + 1, lo_l:hi_l] for d in range(3)]
        inv2 = [1.0 / rd2[d] for d in range(3)]
        # hoisted so the per-pop slab test is two FMAs per (dim, bound):
        # (lo - ro) * inv recomputes ro*inv on every pop; lo*inv - roinv
        # fuses to one multiply-subtract (t differs by <= 1 ulp — absorbed
        # by the 1e-4 slab eps, orders of magnitude wider)
        roinv2 = [ro2[d] * inv2[d] for d in range(3)]
        if bf16_slab:
            inv16 = [inv2[d].astype(jnp.bfloat16) for d in range(3)]
            roinv16 = [roinv2[d].astype(jnp.bfloat16) for d in range(3)]
            eps16 = jnp.bfloat16(eps)

        def leaf_runs(run_row):
            """Test one run row's 8 primitive slots against the sub-lanes.

            leaf_kind='tri': plane/barycentric coefficient test (the packed
            form of 15_module.py:909-953). leaf_kind='sphere': quadratic
            with the reference's transparent far-root rule (:864-896);
            assumes |rd| = 1 (every ray source normalizes)."""
            row = runs_ref[pl.ds(run_row, 1), :]

            def coef(k):
                return row[0, k * WIDTH:(k + 1) * WIDTH].reshape(WIDTH, 1)

            t_b = t_ref[0, lo_l:hi_l]
            if leaf_kind == "sphere":
                ocx = ro2[0] - coef(0)
                ocy = ro2[1] - coef(1)
                ocz = ro2[2] - coef(2)
                half_b = ocx * rd2[0] + ocy * rd2[1] + ocz * rd2[2]
                cterm = ocx * ocx + ocy * ocy + ocz * ocz - coef(3)
                disc = half_b * half_b - cterm
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                t_near = -half_b - sq
                t = jnp.where((t_near < eps) & (coef(4) > 1.5),
                              -half_b + sq, t_near)
                # empty slots: r^2 = -inf => disc = -inf => never ok
                ok = ((disc >= 0.0) & (t > eps) & (t < t_b[None, :]))
            else:
                denom = (rd2[0] * coef(0) + rd2[1] * coef(1)
                         + rd2[2] * coef(2))
                ron = (ro2[0] * coef(0) + ro2[1] * coef(1)
                       + ro2[2] * coef(2))
                t = (coef(3) - ron) / denom
                w1 = (ro2[0] * coef(4) + ro2[1] * coef(5) + ro2[2] * coef(6)
                      + t * (rd2[0] * coef(4) + rd2[1] * coef(5)
                             + rd2[2] * coef(6)) + coef(7))
                w2 = (ro2[0] * coef(8) + ro2[1] * coef(9)
                      + ro2[2] * coef(10)
                      + t * (rd2[0] * coef(8) + rd2[1] * coef(9)
                             + rd2[2] * coef(10)) + coef(11))
                w3 = 1.0 - w1 - w2
                ok = ((t > eps) & (w1 > 0.0) & (w2 > 0.0) & (w3 > 0.0)
                      & (t < t_b[None, :]))                 # [8,SB]
            t_masked = jnp.where(ok, t, jnp.inf)
            t_new = jnp.min(t_masked, axis=0)               # [SB]
            improved = jnp.isfinite(t_new) & (t_new < t_b)
            # winning slot -> prim id via unique int slot-keys: one sublane
            # min + one one-hot sum instead of 8 serial [1,SB] selects
            # (each [1,SB] op still burns SB/128 full VREGs). Slot id in
            # the 3 dropped mantissa LSBs keeps keys unique; earliest slot
            # wins near-ties (within 8 ulps), t_new itself stays exact.
            tkey = (jax.lax.bitcast_convert_type(t_masked, jnp.int32)
                    & jnp.int32(~7)) | slot8               # [8,SB]
            kmin = jnp.min(tkey, axis=0)                   # [SB]
            won = tkey == kmin[None, :]                    # one-hot per lane
            primv = row[0:1, _PRIM_COL:_PRIM_COL + SLOTS].reshape(SLOTS, 1)
            pidf = jnp.sum(jnp.where(won, primv, 0.0), axis=0)
            pid_old = prim_ref[0, lo_l:hi_l]
            prim_ref[0, lo_l:hi_l] = jnp.where(improved,
                                               pidf.astype(jnp.int32),
                                               pid_old)
            t_ref[0, lo_l:hi_l] = jnp.where(improved, t_new, t_b)

        def pop(sp, it):
            """One stack pop for sub-packet h. cnt_ref[h] must be 0 on
            entry; leaves it at the pushed-children count."""
            code = stack_ref[h * cap + sp]
            t0_pop = stack_t_ref[h * cap + sp]
            live = t0_pop < cap_ref[h] + eps   # stale entries pop in O(1)

            @pl.when(live)
            def _node():
                row = nodes_ref[pl.ds(code, 1), :]
                if bf16_slab:
                    # bf16 slab ablation: boxes are outward-rounded bf16
                    # (nodes_to_bf16) and the whole [8,SB] slab pipeline
                    # runs in bf16 — including the ray terms, whose
                    # rounding is NOT direction-controlled, so unlike the
                    # box rounding this is not provably conservative
                    # (near-tangent rays within ~2^-8 relative of a box
                    # face may flip). Measurement-only knob, never default.
                    bmax = jnp.bfloat16(3.0e38)
                    t0 = jnp.full((WIDTH, sb), -bmax, jnp.bfloat16)
                    t1 = jnp.full((WIDTH, sb), bmax, jnp.bfloat16)
                    for d in range(3):
                        lo = row[0, d * 8:(d + 1) * 8].reshape(WIDTH, 1)
                        hi = row[0, (3 + d) * 8:(4 + d) * 8].reshape(
                            WIDTH, 1)
                        ta = lo * inv16[d] - roinv16[d]
                        tb = hi * inv16[d] - roinv16[d]
                        t0 = jnp.maximum(t0, jnp.minimum(ta, tb))
                        t1 = jnp.minimum(t1, jnp.maximum(ta, tb))
                    tb16 = t_ref[0:1, lo_l:hi_l].astype(jnp.bfloat16)
                    lane_hit = ((t1 > t0 - eps16) & (t1 > 0.0)
                                & (t0 < tb16 + eps16))         # [8,SB]
                    t0 = t0.astype(jnp.float32)
                else:
                    t0 = jnp.full((WIDTH, sb), -jnp.inf, jnp.float32)
                    t1 = jnp.full((WIDTH, sb), jnp.inf, jnp.float32)
                    for d in range(3):
                        lo = row[0, d * 8:(d + 1) * 8].reshape(WIDTH, 1)
                        hi = row[0, (3 + d) * 8:(4 + d) * 8].reshape(
                            WIDTH, 1)
                        ta = lo * inv2[d] - roinv2[d]
                        tb = hi * inv2[d] - roinv2[d]
                        t0 = jnp.maximum(t0, jnp.minimum(ta, tb))
                        t1 = jnp.minimum(t1, jnp.maximum(ta, tb))
                    t_best2 = t_ref[0:1, lo_l:hi_l]
                    lane_hit = ((t1 > t0 - eps) & (t1 > 0.0)
                                & (t0 < t_best2 + eps))        # [8,SB]
                ent = entries_ref[pl.ds(code, 1), 0:WIDTH].reshape(WIDTH, 1)
                hitt = jnp.where(lane_hit, jnp.maximum(t0, 0.0), jnp.inf)
                # two-stage lane reduce: fold the SB/128 lane-tiles with
                # elementwise mins first, then one in-tile cross-lane min.
                # (a flat jnp.min(axis=1) over [8,SB] measured ~half the
                # kernel time — Mosaic shuffles full-width operands)
                if sb % 128 == 0 and sb > 128:
                    accr = hitt[:, 0:128]
                    for i in range(1, sb // 128):
                        accr = jnp.minimum(accr, hitt[:, i * 128:(i + 1) * 128])
                    tmin = jnp.min(accr, axis=1, keepdims=True)
                else:
                    tmin = jnp.min(hitt, axis=1, keepdims=True)
                key = jnp.where(ent != _PAD, tmin, jnp.inf)    # [8,1]
                # unique int-sortable keys: f32 bits (keys >= 0) | slot id
                ikey = (jax.lax.bitcast_convert_type(key, jnp.int32)
                        & jnp.int32(~7)) | slot8
                finite = key < jnp.inf
                is_leaf = ent < 0                              # PAD->~finite

                # ---- inline leaves, nearest-first (no stack traffic) ----
                lkey = jnp.where(finite & is_leaf, ikey, imax)
                n_leaf = jnp.sum((finite & is_leaf).astype(jnp.int32))

                def lbody(_, lk):
                    lmin = jnp.min(lk)
                    sel = lk == lmin                           # one-hot
                    lcode = jnp.sum(jnp.where(sel, ent, 0))
                    v = -(lcode + 1)
                    row0 = v // _ENC
                    leaf_runs(row0)

                    @pl.when(v % _ENC > SLOTS)  # fat leaf: 2nd spill row
                    def _row2():
                        leaf_runs(row0 + 1)

                    return jnp.where(sel, imax, lk)

                lax.fori_loop(0, n_leaf, lbody, lkey)

                # ---- node children: 0/1 fast paths, sort when >= 2 ----
                nmask = finite & ~is_leaf
                nkey = jnp.where(nmask, ikey, imax)
                n_node = jnp.sum(nmask.astype(jnp.int32))
                cnt_ref[h] = n_node

                @pl.when(n_node == 1)
                def _push1():
                    sel = nkey == jnp.min(nkey)
                    stack_ref[h * cap + sp] = jnp.sum(jnp.where(sel, ent, 0))
                    stack_t_ref[h * cap + sp] = jnp.sum(
                        jnp.where(sel & finite, jnp.maximum(tmin, 0.0), 0.0))

                @pl.when(n_node >= 2)
                def _pushn():
                    keyn = jnp.where(nmask, jnp.maximum(tmin, 0.0), jnp.inf)
                    keyv = [keyn[c, 0] for c in range(WIDTH)]
                    entv = [ent[c, 0] for c in range(WIDTH)]
                    for a_, b_ in _SORT8_PAIRS:
                        swap = keyv[a_] > keyv[b_]
                        ka = jnp.where(swap, keyv[b_], keyv[a_])
                        kb = jnp.where(swap, keyv[a_], keyv[b_])
                        va = jnp.where(swap, entv[b_], entv[a_])
                        vb = jnp.where(swap, entv[a_], entv[b_])
                        keyv[a_], keyv[b_] = ka, kb
                        entv[a_], entv[b_] = va, vb
                    for c in range(WIDTH):
                        valid = jnp.isfinite(keyv[c])
                        pos = jnp.where(valid, h * cap + sp + n_node - 1 - c,
                                        h * cap + cap - 1)
                        trash = stack_ref[h * cap + cap - 1]
                        trash_t = stack_t_ref[h * cap + cap - 1]
                        stack_ref[pos] = jnp.where(valid, entv[c], trash)
                        stack_t_ref[pos] = jnp.where(valid, keyv[c], trash_t)

            # refresh the stale-prune cap every 4th pop: a [SB]-lane max
            # reduce per leaf (v1) cost 15k reduces/call for zero fired
            # skips on mixed wavefronts; staleness only delays skips
            @pl.when(live & ((it & 3) == 0))
            def _cap():
                cap_ref[h] = jnp.max(t_ref[0, lo_l:hi_l])

        return pop

    pops = [_make_half(h) for h in range(nstacks)]

    def cond(carry):
        it = carry[-1]
        any_live = carry[0] >= 0
        for h in range(1, nstacks):
            any_live = any_live | (carry[h] >= 0)
        return any_live & (it < max_iters)

    def body(carry):
        sps, it = carry[:-1], carry[-1]
        new_sps = []
        for h in range(nstacks):
            cnt_ref[h] = jnp.int32(0)

            @pl.when(sps[h] >= 0)
            def _go(h=h):
                pops[h](sps[h], it)

            new_sps.append(jnp.where(sps[h] >= 0,
                                     sps[h] - 1 + cnt_ref[h], sps[h]))
        return (*new_sps, it + 1)

    # Entered-prefix gate: with coherence-sorted lanes the caller passes
    # entn_ref = count of lanes entering >= 1 depth-2 treelet (no-entry and
    # inactive lanes sort past them; "hit => entered" is exact for the
    # eps-relaxed key — the same property the fused attrs prefix relies on).
    # Blocks that start past the prefix are provably all-miss: their result
    # is the init state (t = t_init, prim = -1), so the whole traversal
    # loop is skipped. Unsorted callers pass entn = n_pad (gate off).
    # Measured NEUTRAL end-to-end on yoimiya (1.657 vs 1.670 s in-situ,
    # ~87% no-entry lanes): an all-miss block's loop was already ~free
    # (root pops, slab fails every lane, stack empties in 1-2 iterations).
    # Kept because it makes the skip PROVABLE at any scene scale instead
    # of relying on the root slab failing fast.
    iters_ref[0, :] = jnp.zeros((b,), jnp.int32)
    run_block = pl.program_id(0) * b < entn_ref[0]

    @pl.when(run_block)
    def _traverse():
        out = lax.while_loop(cond, body,
                             (sp0, *([jnp.int32(0)] * (nstacks - 1)),
                              jnp.int32(0)))
        iters_ref[0, :] = jnp.full((b,), out[-1], jnp.int32)


_TILE = 128  # lane-tile width for the v3 ranged kernel (one f32 vreg row)


def _kernel_v3(nodes_ref, entries_ref, runs_ref, rays_ref, t_ref, prim_ref,
               iters_ref, stack_ref, stack_t_ref, stack_r_ref, cnt_ref,
               cap_ref, inv_ref, *, eps, max_iters, cap):
    """Tile-ranged packet traversal (v3).

    v2's cost model is per-pop vector math over the FULL block width: every
    popped node slab-tests all RAY_BLOCK lanes even when only a handful can
    still hit it. For coherent primary packets that is fine (every lane
    wants every node), but incoherent bounce wavefronts walk near-whole-tree
    unions (18.2 ms vs 1.93 ms per 230k rays, BASELINE.md round-2) where
    each deep node interests only a narrow slice of the block — the
    coherence sort clusters the interested lanes CONTIGUOUSLY.

    v3 therefore carries a lane-tile interval [lo, hi) on every stack entry:
    the 128-lane tiles spanning the lanes that hit the node's AABB when it
    was pushed. All per-node work — slab tests, leaf tests, best-t updates —
    runs only on tiles in the interval, as a dynamic ``fori_loop`` over
    [8, 128] (single-vreg) tiles with dynamic sublane slices. Child
    intervals are computed from per-tile hit masks during the parent's slab
    loop, so intervals only narrow as traversal descends. Total vector work
    becomes ~ sum over pops of |interested tiles| — approaching the
    per-lane union cost a per-thread stack machine (the reference's CUDA
    walk, 15_module.py:756-779) pays, while keeping the packet kernel's
    scalar-core control flow and zero per-lane gathers.

    Exactness: a lane outside its parent's interval cannot hit the child
    (child AABB ⊆ parent AABB ⇒ slab interval nests, and the ``t_best``
    prune is monotone — t_best only decreases, so a lane that failed the
    parent's ``t0 < t_best + eps`` test fails the child's forever). Hit
    sets, traversal order and results are therefore bit-identical to v2
    (tests/test_packet_traverse.py parametrizes all versions).

    Layout: rays arrive as f32[8, NT, 128] (field-major, tile-split lanes);
    t/prim/iters are [NT, 128]. Ranges pack as lo * 256 + hi in one i32.

    MEASURED SLOWER than v2 on v5e (2026-08-19, scripts/profile_packet_v3.py
    + bench.py): kernel-only 6.23 vs 5.72 ms coherent and 11.49 vs 9.48 ms
    one-bounce mix per 230k rays; yoimiya end-to-end 10.48 vs 12.22 Mrays/s.
    Two compounding causes: (a) the interval is CONTIGUOUS — a node whose
    interested lanes sit in disjoint key clusters (tiles {0, 7}) keeps the
    full [0, 8) range, so deep ranges rarely narrow on real wavefronts;
    (b) each tile iteration pays dynamic-sublane-slice overhead that
    exceeds the saved [8,128] vector work (the same scalar-overhead wall
    the nstacks experiment hit — see _kernel_v2's docstring). Kept
    non-default (LPT_PACKET_VERSION=3) as a bit-exact documented negative
    result; the sort key, not the kernel, is where incoherence cost lives.
    """
    nt = rays_ref.shape[1]
    imax = jnp.int32(np.int32(2 ** 31 - 1))
    slot8 = jax.lax.broadcasted_iota(jnp.int32, (WIDTH, 1), 0)
    t_ref[:, :] = rays_ref[_TINIT]
    prim_ref[:, :] = jnp.full((nt, _TILE), -1, jnp.int32)
    inv_ref[:, :, :] = 1.0 / rays_ref[_RD:_RD + 3]
    stack_ref[0] = jnp.int32(0)              # root node
    stack_t_ref[0] = jnp.float32(0.0)
    stack_r_ref[0] = jnp.int32(nt)           # full range: 0 * 256 + nt
    cap_ref[0] = jnp.max(rays_ref[_TINIT])

    def leaf_runs(run_row, lo_t, hi_t):
        """Test one run row's 8 triangle slots against tiles [lo_t, hi_t)."""
        row = runs_ref[pl.ds(run_row, 1), :]

        def coef(k):
            return row[0, k * WIDTH:(k + 1) * WIDTH].reshape(WIDTH, 1)

        cs = [coef(k) for k in range(SLOT_F)]
        primv = row[0:1, _PRIM_COL:_PRIM_COL + SLOTS].reshape(SLOTS, 1)

        def tbody(j, _):
            ro_t = [rays_ref[_RO + d, pl.ds(j, 1), :] for d in range(3)]
            rd_t = [rays_ref[_RD + d, pl.ds(j, 1), :] for d in range(3)]
            denom = rd_t[0] * cs[0] + rd_t[1] * cs[1] + rd_t[2] * cs[2]
            ron = ro_t[0] * cs[0] + ro_t[1] * cs[1] + ro_t[2] * cs[2]
            t = (cs[3] - ron) / denom
            w1 = (ro_t[0] * cs[4] + ro_t[1] * cs[5] + ro_t[2] * cs[6]
                  + t * (rd_t[0] * cs[4] + rd_t[1] * cs[5]
                         + rd_t[2] * cs[6]) + cs[7])
            w2 = (ro_t[0] * cs[8] + ro_t[1] * cs[9] + ro_t[2] * cs[10]
                  + t * (rd_t[0] * cs[8] + rd_t[1] * cs[9]
                         + rd_t[2] * cs[10]) + cs[11])
            w3 = 1.0 - w1 - w2
            t_b = t_ref[pl.ds(j, 1), :]                   # [1,128]
            ok = ((t > eps) & (w1 > 0.0) & (w2 > 0.0) & (w3 > 0.0)
                  & (t < t_b))                            # [8,128]
            t_masked = jnp.where(ok, t, jnp.inf)
            t_new = jnp.min(t_masked, axis=0, keepdims=True)
            improved = jnp.isfinite(t_new) & (t_new < t_b)
            tkey = (jax.lax.bitcast_convert_type(t_masked, jnp.int32)
                    & jnp.int32(~7)) | slot8
            kmin = jnp.min(tkey, axis=0, keepdims=True)
            won = tkey == kmin
            pidf = jnp.sum(jnp.where(won, primv, 0.0), axis=0, keepdims=True)
            pid_old = prim_ref[pl.ds(j, 1), :]
            prim_ref[pl.ds(j, 1), :] = jnp.where(improved,
                                                 pidf.astype(jnp.int32),
                                                 pid_old)
            t_ref[pl.ds(j, 1), :] = jnp.where(improved, t_new, t_b)
            return 0

        lax.fori_loop(lo_t, hi_t, tbody, 0)

    def body(carry):
        sp, it = carry
        code = stack_ref[sp]
        t0_pop = stack_t_ref[sp]
        rv = stack_r_ref[sp]
        lo_p, hi_p = rv // 256, rv % 256
        cnt_ref[0] = jnp.int32(0)
        live = t0_pop < cap_ref[0] + eps   # stale entries pop in O(1)

        @pl.when(live)
        def _node():
            row = nodes_ref[pl.ds(code, 1), :]
            los = [row[0, d * 8:(d + 1) * 8].reshape(WIDTH, 1)
                   for d in range(3)]
            his = [row[0, (3 + d) * 8:(4 + d) * 8].reshape(WIDTH, 1)
                   for d in range(3)]

            def tile(j, carry):
                tmin8, lo8, hi8 = carry
                t0v = jnp.full((WIDTH, _TILE), -jnp.inf, jnp.float32)
                t1v = jnp.full((WIDTH, _TILE), jnp.inf, jnp.float32)
                for d in range(3):
                    ro_t = rays_ref[_RO + d, pl.ds(j, 1), :]
                    iv = inv_ref[d, pl.ds(j, 1), :]
                    roiv = ro_t * iv   # matches v2's hoisted roinv bitwise
                    ta = los[d] * iv - roiv
                    tb = his[d] * iv - roiv
                    t0v = jnp.maximum(t0v, jnp.minimum(ta, tb))
                    t1v = jnp.minimum(t1v, jnp.maximum(ta, tb))
                t_b = t_ref[pl.ds(j, 1), :]
                lane_hit = ((t1v > t0v - eps) & (t1v > 0.0)
                            & (t0v < t_b + eps))          # [8,128]
                tmin_t = jnp.min(jnp.where(lane_hit, jnp.maximum(t0v, 0.0),
                                           jnp.inf), axis=1, keepdims=True)
                anyh = tmin_t < jnp.inf                   # [8,1]
                tmin8 = jnp.minimum(tmin8, tmin_t)
                lo8 = jnp.minimum(lo8, jnp.where(anyh, j, nt))
                hi8 = jnp.maximum(hi8, jnp.where(anyh, j + 1, 0))
                return tmin8, lo8, hi8

            tmin8, lo8, hi8 = lax.fori_loop(
                lo_p, hi_p, tile,
                (jnp.full((WIDTH, 1), jnp.inf, jnp.float32),
                 jnp.full((WIDTH, 1), nt, jnp.int32),
                 jnp.zeros((WIDTH, 1), jnp.int32)))
            ent = entries_ref[pl.ds(code, 1), 0:WIDTH].reshape(WIDTH, 1)
            key = jnp.where(ent != _PAD, tmin8, jnp.inf)
            ikey = (jax.lax.bitcast_convert_type(key, jnp.int32)
                    & jnp.int32(~7)) | slot8
            finite = key < jnp.inf
            is_leaf = ent < 0
            rng8 = lo8 * 256 + hi8                        # [8,1] packed

            # ---- inline leaves, nearest-first, ranged ----
            lkey = jnp.where(finite & is_leaf, ikey, imax)
            n_leaf = jnp.sum((finite & is_leaf).astype(jnp.int32))

            def lbody(_, lk):
                lmin = jnp.min(lk)
                sel = lk == lmin
                lcode = jnp.sum(jnp.where(sel, ent, 0))
                lrv = jnp.sum(jnp.where(sel, rng8, 0))
                v = -(lcode + 1)
                row0 = v // _ENC
                leaf_runs(row0, lrv // 256, lrv % 256)

                @pl.when(v % _ENC > SLOTS)  # fat leaf: 2nd spill row
                def _row2():
                    leaf_runs(row0 + 1, lrv // 256, lrv % 256)

                return jnp.where(sel, imax, lk)

            lax.fori_loop(0, n_leaf, lbody, lkey)

            # ---- node children: 0/1 fast paths, sort when >= 2 ----
            nmask = finite & ~is_leaf
            nkey = jnp.where(nmask, ikey, imax)
            n_node = jnp.sum(nmask.astype(jnp.int32))
            cnt_ref[0] = n_node

            @pl.when(n_node == 1)
            def _push1():
                sel = nkey == jnp.min(nkey)
                stack_ref[sp] = jnp.sum(jnp.where(sel, ent, 0))
                stack_t_ref[sp] = jnp.sum(
                    jnp.where(sel & finite, jnp.maximum(tmin8, 0.0), 0.0))
                stack_r_ref[sp] = jnp.sum(jnp.where(sel, rng8, 0))

            @pl.when(n_node >= 2)
            def _pushn():
                keyn = jnp.where(nmask, jnp.maximum(tmin8, 0.0), jnp.inf)
                keyv = [keyn[c, 0] for c in range(WIDTH)]
                entv = [ent[c, 0] for c in range(WIDTH)]
                rngv = [rng8[c, 0] for c in range(WIDTH)]
                for a_, b_ in _SORT8_PAIRS:
                    swap = keyv[a_] > keyv[b_]
                    ka = jnp.where(swap, keyv[b_], keyv[a_])
                    kb = jnp.where(swap, keyv[a_], keyv[b_])
                    va = jnp.where(swap, entv[b_], entv[a_])
                    vb = jnp.where(swap, entv[a_], entv[b_])
                    ra = jnp.where(swap, rngv[b_], rngv[a_])
                    rb = jnp.where(swap, rngv[a_], rngv[b_])
                    keyv[a_], keyv[b_] = ka, kb
                    entv[a_], entv[b_] = va, vb
                    rngv[a_], rngv[b_] = ra, rb
                for c in range(WIDTH):
                    valid = jnp.isfinite(keyv[c])
                    pos = jnp.where(valid, sp + n_node - 1 - c, cap - 1)
                    trash = stack_ref[cap - 1]
                    trash_t = stack_t_ref[cap - 1]
                    trash_r = stack_r_ref[cap - 1]
                    stack_ref[pos] = jnp.where(valid, entv[c], trash)
                    stack_t_ref[pos] = jnp.where(valid, keyv[c], trash_t)
                    stack_r_ref[pos] = jnp.where(valid, rngv[c], trash_r)

        # refresh the stale-prune cap every 4th pop (see _kernel_v2)
        @pl.when(live & ((it & 3) == 0))
        def _cap():
            cap_ref[0] = jnp.max(t_ref[:, :])

        return sp - 1 + cnt_ref[0], it + 1

    def cond(carry):
        sp, it = carry
        return (sp >= 0) & (it < max_iters)

    _, it_final = lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
    iters_ref[:, :] = jnp.full((nt, _TILE), it_final, jnp.int32)


def treelet_boxes(nodes, entries):
    """(lo f32[64,3], hi f32[64,3]) AABBs of the root's depth-2 subtrees.

    Constant per mesh — call ONCE at scene-build time (concrete arrays) and
    pass the result through as ``treelets``; rebuilding these boxes inside
    every jitted pass costs ~25 fused ops of stack/where/reshape churn on a
    pass body that is billed by kernel count (BASELINE.md round-3).
    """
    m = nodes.shape[0]
    ent0 = entries[0, 0:WIDTH]                                   # [8]
    crows = jnp.take(nodes, jnp.clip(ent0, 0, m - 1), axis=0)    # [8,128]
    # grandchild boxes, component-major per row -> [8,8,3]
    glo = jnp.stack([crows[:, d * 8:(d + 1) * 8] for d in range(3)], -1)
    ghi = jnp.stack([crows[:, (3 + d) * 8:(4 + d) * 8] for d in range(3)], -1)
    # root-child own boxes (used where the root child is a leaf run: its
    # "treelet" is itself; empty slots keep inf/-inf never-hit boxes)
    rlo = jnp.stack([nodes[0, d * 8:(d + 1) * 8] for d in range(3)], -1)
    rhi = jnp.stack([nodes[0, (3 + d) * 8:(4 + d) * 8] for d in range(3)], -1)
    is_node = (ent0 >= 0)[:, None]                               # [8,1]
    self_slot = (jnp.arange(WIDTH) == 0)[None, :]                # [1,8]
    lo = jnp.where(is_node[..., None], glo,
                   jnp.where(self_slot[..., None], rlo[:, None, :], jnp.inf))
    hi = jnp.where(is_node[..., None], ghi,
                   jnp.where(self_slot[..., None], rhi[:, None, :], -jnp.inf))
    return (lo.reshape(WIDTH * WIDTH, 3), hi.reshape(WIDTH * WIDTH, 3))


def treelet_seed_codes(nodes, entries):
    """i32[64] stack entry code of each depth-2 treelet slot, aligned with
    ``treelet_boxes``'s 64 rows: root child c's grandchild g sits at
    c*8 + g; a root child that is itself a leaf run occupies slot c*8 + 0
    with its own leaf code; empty slots carry _PAD. Constant per mesh —
    compute once at build time (used by the treelet-restart traversal
    seeds, packet_traverse_sorted(restart=True))."""
    m = nodes.shape[0]
    ent0 = entries[0, 0:WIDTH]                                   # [8]
    grand = jnp.take(entries, jnp.clip(ent0, 0, m - 1),
                     axis=0)[:, 0:WIDTH]                         # [8,8]
    is_node = (ent0 >= 0)[:, None]
    self_slot = (jnp.arange(WIDTH) == 0)[None, :]
    codes = jnp.where(is_node, grand,
                      jnp.where(self_slot, ent0[:, None], jnp.int32(_PAD)))
    return codes.reshape(WIDTH * WIDTH).astype(jnp.int32)


def _treelet_entry_key(nodes, entries, ro, rd, eps: float = 0.0,
                       treelets=None, want_mask: bool = False):
    """Sort key = the two nearest depth-2 subtrees ("treelets") each ray
    actually ENTERS, found by dense slab tests against the <=64 grandchild
    AABBs of the root — no gathers, pure [N,64] VPU math.

    The Morton-origin key below is a *proxy* for traversal overlap; this
    key measures it directly: the packet kernel's node union is exactly
    the set of subtrees some live lane enters, and ordered traversal +
    t-capping means the first one or two entered treelets dominate each
    ray's walk. Rays sharing (nearest, second-nearest) treelet walk nearly
    identical unions regardless of where their origins sit."""
    lo, hi = treelets if treelets is not None else treelet_boxes(nodes,
                                                                 entries)
    inv = 1.0 / rd                                               # [N,3]
    ta = (lo[None, :, :] - ro[:, None, :]) * inv[:, None, :]     # [N,64,3]
    tb = (hi[None, :, :] - ro[:, None, :]) * inv[:, None, :]
    t0 = jnp.max(jnp.minimum(ta, tb), axis=-1)                   # [N,64]
    t1 = jnp.min(jnp.maximum(ta, tb), axis=-1)
    # eps-relaxed like the kernel's child test, so "hit ⟹ entered" holds
    # exactly (degenerate flat boxes have t1 == t0) — packet_traverse_sorted
    # relies on entered lanes being a superset of hit lanes
    entered = (t1 > t0 - eps) & (t1 > 0.0)
    tmin = jnp.where(entered, jnp.maximum(t0, 0.0), jnp.inf)
    m1 = jnp.argmin(tmin, axis=1).astype(jnp.int32)              # [N]
    t_m1 = jnp.min(tmin, axis=1)
    tmin2 = jnp.where(jnp.arange(WIDTH * WIDTH)[None, :] == m1[:, None],
                      jnp.inf, tmin)
    m2 = jnp.argmin(tmin2, axis=1).astype(jnp.int32)
    m2 = jnp.where(jnp.isfinite(jnp.min(tmin2, axis=1)), m2,
                   jnp.int32(WIDTH * WIDTH))                     # 64 = none
    key = m1 * (WIDTH * WIDTH + 1) + m2
    # rays that enter no treelet at all cluster at the very end
    key = jnp.where(jnp.isfinite(t_m1), key,
                    jnp.int32((WIDTH * WIDTH + 1) ** 2))
    if not want_mask:
        return key
    # full entered set as 2 packed u32 words (bit t of word t//32 = lane
    # enters treelet t) — disjoint bit shifts, so sum == bitwise OR
    ebits = entered.astype(jnp.uint32)
    w0 = jnp.sum(ebits[:, 0:32] << jnp.arange(32, dtype=jnp.uint32)[None, :],
                 axis=1)
    w1 = jnp.sum(ebits[:, 32:64] << jnp.arange(32, dtype=jnp.uint32)[None, :],
                 axis=1)
    return key, w0, w1


def _coherence_key(nodes, entries, ro, rd, kind: str = "treelet",
                   eps: float = 0.0, treelets=None):
    """Sort key grouping rays by origin cell over the root AABB and
    direction octant, so packet blocks traverse small node unions. Bounce
    wavefronts are incoherent in lane order; unsorted, every 512-lane block
    walks ~the whole tree (~300 ms/pass measured on the 23k-tri Yoimiya
    mesh at 640x360) while the argsort + state gathers cost ~10 ms.

    ``kind='treelet'`` (default) prepends the measured treelet-entry pair
    (_treelet_entry_key) as the major key, with the Morton-origin/octant
    code breaking ties within a treelet group. ``kind='morton'`` is the
    round-1 key, kept for ablation.

    Key layout (ablated on Yoimiya, BASELINE.md): origin locality dominates
    direction (cell-major 4.57 Mrays/s vs octant-major 3.99 vs unsorted
    3.44). The cell id is a Morton (bit-interleaved) code rather than the
    earlier lexicographic (x-major) id: lexicographic order strides the
    whole scene along y/z between consecutive x rows, so a packet spanned
    distant geometry; Morton order keeps consecutive keys in compact 3D
    blocks. Direction octant stays in the LOW bits."""
    bits = 5  # 32 cells per axis
    cells = 1 << bits
    lo = jnp.stack([jnp.min(nodes[0, d * 8:(d + 1) * 8]) for d in range(3)])
    hi = jnp.stack([jnp.max(nodes[0, (3 + d) * 8:(4 + d) * 8])
                    for d in range(3)])
    span = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip(((ro - lo) / span * cells).astype(jnp.int32), 0, cells - 1)
    octant = ((rd[:, 0] > 0).astype(jnp.int32)
              + 2 * (rd[:, 1] > 0).astype(jnp.int32)
              + 4 * (rd[:, 2] > 0).astype(jnp.int32))

    def _spread(v):  # 5 bits -> every 3rd position (Morton interleave)
        v = (v | (v << 8)) & 0x0300F
        v = (v | (v << 4)) & 0x030C3
        v = (v | (v << 2)) & 0x09249
        return v

    cell = (_spread(q[:, 0]) << 2) | (_spread(q[:, 1]) << 1) | _spread(q[:, 2])
    morton = cell * 8 + octant                    # 18 bits
    if kind == "morton":
        return morton
    # treelet-major (13 bits) + morton tie-break (18 bits) = 31 bits, fits i32
    return (_treelet_entry_key(nodes, entries, ro, rd, eps=eps,
                               treelets=treelets) * (1 << 18) + morton)


def _coherence_order(nodes, entries, ro, rd, kind: str = "treelet"):
    """(order, inv) permutations for coherence sorting.

    Global argsort both ways. A chunked variant (C independent row-sorts)
    was tried and reverted: the argsort is cheap even at pool widths
    (4.8 ms at 1.84M keys, scripts/profile_sortcost.py) while chunking to
    ~9k-lane windows destroyed the packet-coherence benefit entirely
    (secondary traversal regressed 18 ms → 28 ms, the unsorted cost).

    Kept for profiling/ablation; the hot path in ``packet_traverse`` now
    moves payload *through* ``lax.sort`` instead of materializing these
    permutations (see _sort_fwd below — gathers are the expensive part)."""
    key = _coherence_key(nodes, entries, ro, rd, kind)
    order = jnp.argsort(key)
    return order, jnp.argsort(order)


def _sort_fwd(nodes, entries, packed, ro, rd, kind: str, treelets=None):
    """Coherence-sort ``packed [N,8]`` by carrying it through lax.sort.

    Measured on v5e (scripts/profile_sortpath.py, 230k lanes): element
    takes run ~56 M/s and even an [N,8] row take ~140 M rows/s, while a
    9-operand lax.sort is 0.94 ms — payload-through-sort beats
    argsort + gather ~4x for this shape. Returns the sorted rows plus the
    original lane index per slot (the inverse rides a second sort keyed on
    that index — no inverse permutation or gather is ever built)."""
    n = packed.shape[0]
    key = _coherence_key(nodes, entries, ro, rd, kind, treelets=treelets)
    idx = jnp.arange(n, dtype=jnp.int32)
    ops = jax.lax.sort(
        (key,) + tuple(packed[:, j] for j in range(packed.shape[1])) + (idx,),
        num_keys=1)
    return jnp.stack(ops[1:-1], axis=1), ops[-1]


def _sort_inv(order_idx, t, prim):
    """Restore lane order of (t, prim): sort by the carried original index
    (a permutation, so the result is exact). ~1.9 ms vs 5.0 ms for the two
    element takes it replaces (profile_sortpath.py)."""
    _, t_out, p_out = jax.lax.sort((order_idx, t, prim), num_keys=1)
    return t_out, p_out


def _kernel_call(nodes, entries, runs, rays_rows, eps: float,
                 interpret: bool, version: int = 2, nstacks: int = 1,
                 entered=None, leaf_kind: str = "tri", seed_rows=None):
    """Invoke the packet kernel on pre-packed ray rows ``f32[8, n_pad]``.

    Shared by ``packet_traverse`` (lane-order API) and
    ``packet_traverse_sorted`` (fused-shading API). Returns
    ``(t f32[1,n_pad], prim i32[1,n_pad], iters i32[1,n_pad])``.
    """
    n_pad = rays_rows.shape[1]
    m = nodes.shape[0]
    # entered-prefix gate operand (see _kernel_v2): blocks starting past
    # this lane count skip traversal. None = gate off (unsorted lanes).
    entn = jnp.full((1,), n_pad if entered is None else entered, jnp.int32)
    if RAY_BLOCK % nstacks:
        raise ValueError(f"nstacks={nstacks} must divide block {RAY_BLOCK}")
    # Shared-stack capacity: each pushed level adds <= 8 entries; the wide
    # tree depth is not carried on WideBVH here, so bound by a generous
    # constant (64 levels of 8) — overflow is impossible below that depth.
    cap = 8 * 64 + 8
    max_iters = 16 * m + 64  # hard termination backstop

    grid = (n_pad // RAY_BLOCK,)
    if leaf_kind != "tri" and version != 2:
        raise ValueError("sphere leaf runs require the v2 kernel")
    if version == 3:
        if nstacks != 1:
            raise ValueError("nstacks > 1 requires version=2")
        nt = RAY_BLOCK // _TILE
        kern = functools.partial(_kernel_v3, eps=eps, max_iters=max_iters,
                                 cap=cap)
        rays_3d = rays_rows.reshape(8, n_pad // _TILE, _TILE)
        t, prim, iters = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((nodes.shape[0], 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((entries.shape[0], 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((runs.shape[0], 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, nt, _TILE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((nt, _TILE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nt, _TILE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nt, _TILE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_pad // _TILE, _TILE), jnp.float32),
                jax.ShapeDtypeStruct((n_pad // _TILE, _TILE), jnp.int32),
                jax.ShapeDtypeStruct((n_pad // _TILE, _TILE), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.SMEM((cap,), jnp.int32),
                pltpu.SMEM((cap,), jnp.float32),
                pltpu.SMEM((cap,), jnp.int32),     # packed tile ranges
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SMEM((1,), jnp.float32),     # cap_ref
                pltpu.VMEM((3, nt, _TILE), jnp.float32),  # 1/rd cache
            ],
            interpret=interpret,
        )(nodes, entries, runs, rays_3d)
        return (t.reshape(1, n_pad), prim.reshape(1, n_pad),
                iters.reshape(1, n_pad))
    if version == 2:
        kern = functools.partial(_kernel_v2, eps=eps, max_iters=max_iters,
                                 cap=cap, nstacks=nstacks,
                                 leaf_kind=leaf_kind,
                                 seed_init=seed_rows is not None)
        scratch = [
            pltpu.SMEM((cap * nstacks,), jnp.int32),
            pltpu.SMEM((cap * nstacks,), jnp.float32),
            pltpu.SMEM((nstacks,), jnp.int32),
            pltpu.SMEM((nstacks,), jnp.float32),  # cap_ref
        ]
    else:
        if nstacks != 1:
            raise ValueError("nstacks > 1 requires version=2")
        kern = functools.partial(_kernel, eps=eps, max_iters=max_iters,
                                 cap=cap)
        scratch = [
            pltpu.SMEM((cap,), jnp.int32),
            pltpu.SMEM((cap,), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ]
    in_specs = [
        pl.BlockSpec((nodes.shape[0], 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((entries.shape[0], 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((runs.shape[0], 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),   # entered-lane count
    ]
    operands = [nodes, entries, runs, rays_rows, entn]
    if seed_rows is not None:
        # whole array in SMEM (like entn): dynamically indexed by
        # [program_id, slot] at seed time; 9 live cols padded to 16
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(seed_rows)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)


# Treelet-key sentinels (see _treelet_entry_key/_coherence_key): lanes that
# enter no depth-2 treelet get major key (65)^2; fused traversal additionally
# parks INACTIVE lanes one slot past that, so in sorted order
# [entered... | enters-nothing... | inactive...] and "entered" is a prefix.
_TREELET_NONE = (WIDTH * WIDTH + 1) ** 2
_KEY_ENTERED_LIM = _TREELET_NONE << 18
_KEY_INACTIVE = (_TREELET_NONE + 1) << 18


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "sort_key",
                                             "version", "restart"))
def packet_traverse_sorted(nodes, entries, runs, ro, rd, active,
                           eps: float = 1e-4, interpret: bool = False,
                           sort_key: str = "treelet", treelets=None,
                           version: int | None = None,
                           restart: bool = False, seed_codes=None,
                           payload=()):
    """Coherence-sorted traversal for FUSED hit shading (single-structure
    worlds; t_init is implicitly +inf — no cross-structure seeding).

    The lane-order API (``packet_traverse``) pays two extra sorts per pass
    when the caller then hit-compacts attribute shading (an unsort here plus
    a re-sort there). On this TPU runtime per-pass cost is dominated by
    kernel-launch count (BASELINE.md round-3), so this variant instead
    returns everything in SORTED order and lets the caller run attribute
    shading on the sorted prefix and restore lane order with ONE final
    multi-payload sort:

    - lanes are sorted by the treelet coherence key with inactive lanes
      keyed past the "enters-no-treelet" sentinel;
    - a lane can only hit the mesh if it enters >= 1 depth-2 treelet (the
      key's slab test uses the same eps-relaxed semantics as the kernel),
      so hits ⊆ entered = a PREFIX of the sorted order whose length bounds
      the attribute-gather work.

    Returns ``(t_s, prim_s, ro_s, rd_s, entered_n, order_idx)``: ``t_s`` is
    +inf where unbeaten, ``entered_n`` i32 = sorted lanes entering any
    treelet, ``order_idx[i]`` = original lane id of sorted slot ``i``.

    ``payload``: optional tuple of extra ``[N]`` columns carried through
    the coherence sort unchanged (pool integrators whose lane order is
    free ride their whole per-lane state through this sort instead of
    paying a restoring sort — trace_shade_compact). When non-empty the
    return gains a 7th element ``payload_s`` (the columns in sorted
    order).
    """
    if sort_key != "treelet":
        # the entered-prefix property (hits ⊆ first entered_n sorted lanes)
        # only holds for the treelet-major key
        raise ValueError("packet_traverse_sorted requires sort_key='treelet'")
    if version is None:
        version = PACKET_VERSION
    if restart and version != 2:
        raise ValueError("restart seeding requires the v2 kernel")
    n = ro.shape[0]
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    w0 = w1 = None
    if restart:
        # treelet-restart needs the full per-lane entered set, not just the
        # (m1, m2) pair the key encodes — recompose the key from its parts
        # so the [N,64] slab test is computed once
        tkey, w0, w1 = _treelet_entry_key(nodes, entries, ro, rd, eps=eps,
                                          treelets=treelets, want_mask=True)
        morton = _coherence_key(nodes, entries, ro, rd, "morton")
        key = tkey * (1 << 18) + morton
    else:
        key = _coherence_key(nodes, entries, ro, rd, sort_key, eps=eps,
                             treelets=treelets)
    key = jnp.where(active, key, jnp.int32(_KEY_INACTIVE))
    idx = jnp.arange(n, dtype=jnp.int32)
    payload = tuple(payload)
    if restart:
        # inactive lanes must not contribute entered treelets to any block
        w0 = jnp.where(active, w0, 0)
        w1 = jnp.where(active, w1, 0)
        ops = jax.lax.sort(
            (key, ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1],
             rd[:, 2], idx, w0, w1) + payload, num_keys=1)
        w0_s, w1_s = ops[8], ops[9]
        payload_s = ops[10:]
    else:
        ops = jax.lax.sort(
            (key, ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1],
             rd[:, 2], idx) + payload, num_keys=1)
        payload_s = ops[8:]
    key_s, order_idx = ops[0], ops[7]
    ro_s = jnp.stack(ops[1:4], axis=1)
    rd_s = jnp.stack(ops[4:7], axis=1)
    # active/t_init are reconstructed from the key — no sort payload needed
    active_s = key_s < jnp.int32(_KEY_INACTIVE)
    entered_n = jnp.sum((key_s < jnp.int32(_KEY_ENTERED_LIM))
                        .astype(jnp.int32))
    t_enc = jnp.where(active_s, jnp.inf, -jnp.inf)

    seed_rows = None
    if restart:
        if seed_codes is None:
            seed_codes = treelet_seed_codes(nodes, entries)
        nblk = n_pad // RAY_BLOCK
        pad_w = jnp.zeros((n_pad - n,), jnp.uint32)
        bw0 = jnp.concatenate([w0_s, pad_w]).reshape(nblk, RAY_BLOCK)
        bw1 = jnp.concatenate([w1_s, pad_w]).reshape(nblk, RAY_BLOCK)
        # per-block OR of the packed entered words (disjoint-bit sums would
        # overflow across 1024 lanes; fold with bitwise OR in log2 steps)
        def _orfold(m):
            k = RAY_BLOCK
            while k > 1:
                k //= 2
                m = m[:, :k] | m[:, k:2 * k]
            return m[:, 0]

        u0 = _orfold(bw0)
        u1 = _orfold(bw1)
        bits = jnp.arange(32, dtype=jnp.uint32)
        ent64 = jnp.concatenate(
            [((u0[:, None] >> bits) & 1).astype(bool),
             ((u1[:, None] >> bits) & 1).astype(bool)], axis=1)  # [nblk,64]
        cnt = jnp.sum(ent64.astype(jnp.int32), axis=1)
        # compact entered codes to the row head (PAD codes stay behind)
        skey = (~ent64).astype(jnp.int32)
        codes_b = jnp.broadcast_to(seed_codes[None, :], ent64.shape)
        _, codes_sorted = jax.lax.sort((skey, codes_b), num_keys=1,
                                       dimension=1)
        # count > 8 => 0: kernel falls back to the root walk there
        cnt = jnp.where((cnt >= 1) & (cnt <= WIDTH), cnt, 0)
        seed_rows = jnp.zeros((nblk, 16), jnp.int32)
        seed_rows = seed_rows.at[:, :WIDTH].set(codes_sorted[:, :WIDTH])
        seed_rows = seed_rows.at[:, WIDTH].set(cnt)

    rays = jnp.zeros((8, n_pad), jnp.float32)
    rays = rays.at[_RO:_RO + 3, :n].set(ro_s.T)
    rays = rays.at[_RD:_RD + 3, :n].set(rd_s.T)
    rays = rays.at[_TINIT, :n].set(t_enc)
    rays = rays.at[_TINIT, n:].set(-jnp.inf)   # padding lanes: inert
    rays = rays.at[_ACTIVE, :n].set(active_s.astype(jnp.float32))

    t, prim, _ = _kernel_call(nodes, entries, runs, rays, eps, interpret,
                              version=version,
                              entered=entered_n if version != 3 else None,
                              seed_rows=seed_rows)
    prim_s = prim[0, :n]
    t_s = jnp.where(prim_s >= 0, t[0, :n], jnp.inf)
    if payload:
        return t_s, prim_s, ro_s, rd_s, entered_n, order_idx, payload_s
    return t_s, prim_s, ro_s, rd_s, entered_n, order_idx


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "sort_rays",
                                             "with_stats", "sort_key",
                                             "version", "nstacks",
                                             "leaf_kind"))
def packet_traverse(nodes, entries, runs, ro, rd, t_init, active,
                    eps: float = 1e-4, interpret: bool = False,
                    sort_rays: bool = True, with_stats: bool = False,
                    sort_key: str = "treelet", version: int | None = None,
                    nstacks: int = 1, treelets=None, leaf_kind: str = "tri"):
    """Nearest-hit packet traversal.

    Args: packed tables from ``pack_packet_tables``; ``ro/rd f32[N,3]``;
    ``t_init f32[N]`` seeds per-lane best-t (cross-structure pruning);
    ``active bool[N]`` masks lanes out of the union entirely.
    ``sort_rays`` groups lanes into coherent packets first (results are
    exact either way; only the block unions change); ``sort_key`` picks the
    grouping key ('treelet' | 'morton', see _coherence_key).
    Returns ``(t f32[N] — t_init where unbeaten, prim i32[N] — -1)``.
    """
    if version is None:
        version = PACKET_VERSION if leaf_kind == "tri" else 2
    n = ro.shape[0]
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    m = nodes.shape[0]
    if RAY_BLOCK % nstacks:
        raise ValueError(f"nstacks={nstacks} must divide block {RAY_BLOCK}")

    # Pack the 8 per-ray fields into rows FIRST so the coherence reorder is
    # one row gather instead of 8 separate takes (measured ~10 ms → ~2 ms at
    # 230k rays: XLA takes are row-latency-bound, not byte-bound).
    # Inactive lanes are encoded as t_init = -inf: inside the kernel every
    # `< t_best + eps` comparison then fails, removing all per-pop
    # active-mask ANDs; their original t_init is restored on the way out.
    t_enc = jnp.where(active, t_init, -jnp.inf)
    packed = jnp.concatenate(
        [ro, rd, t_enc[:, None], active.astype(jnp.float32)[:, None]],
        axis=1)                                              # [N, 8]
    order_idx = None
    if sort_rays and n > RAY_BLOCK:
        packed, order_idx = _sort_fwd(nodes, entries, packed, ro, rd,
                                      sort_key, treelets=treelets)

    if with_stats and order_idx is not None:
        # an assert would vanish under `python -O` and the stats path would
        # silently return t/prim in sorted order without unsorting
        raise ValueError(
            "with_stats requires sort_rays=False to keep block identity")

    rays = jnp.zeros((8, n_pad), jnp.float32)
    rays = rays.at[:, :n].set(packed.T)
    rays = rays.at[_TINIT, n:].set(-jnp.inf)   # padding lanes: inert

    t, prim, iters = _kernel_call(nodes, entries, runs, rays, eps, interpret,
                                  version=version, nstacks=nstacks,
                                  leaf_kind=leaf_kind)
    if with_stats:
        t_out = jnp.where(active, t[0, :n], t_init)
        return t_out, prim[0, :n], iters[0, ::RAY_BLOCK]
    if order_idx is not None:
        t_out, p_out = _sort_inv(order_idx, t[0, :n], prim[0, :n])
    else:
        t_out, p_out = t[0, :n], prim[0, :n]
    # restore inactive lanes' original t (they carried -inf in-kernel)
    return jnp.where(active, t_out, t_init), p_out
