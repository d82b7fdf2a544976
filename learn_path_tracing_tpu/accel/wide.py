"""Wide (8-ary) BVH: collapse + lockstep wavefront traversal.

TPU-native acceleration layout: the reference's binary BVH walks ~60-100
nodes per ray with one AABB test each (15_module.py:756-779) — on a vector
machine it is far better to test 8 sibling AABBs per step (one fused VPU
op block) and cut the iteration count by ~3x, which also slashes the
per-iteration gather count (one wide-node row instead of many binary rows).

Host side, a binary FlatBVH (accel/bvh.py) is collapsed by repeatedly
expanding the largest-area frontier entry until each wide node has up to 8
children; children are either inner wide nodes or leaf runs (contiguous
prim ranges in the shared ``prim`` list, up to 63 prims per run).

Device side, traversal runs the same lockstep while_loop as
accel/traverse.py but with stack entries encoding either a wide-node index
(``>= 0``) or a leaf run (``-(start * 64 + count + 1)``).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core.pytree import pytree_dataclass
from ..geometry.aabb import EPSILON
from .bvh import FlatBVH

WIDTH = 8
_MAX_RUN = 63  # leaf-run length limit imposed by the stack encoding

_PAD = np.int32(-(2 ** 30))


def _encode_leaf(start: int, count: int) -> int:
    return -(start * 64 + count + 1)


def decode_leaf(code):
    """code i32[N] → (start, count) for leaf entries (code < 0, != PAD)."""
    v = -(code + 1)
    return v // 64, v % 64


@pytree_dataclass(meta_fields=("depth", "max_leaf"))
class WideBVH:
    child_low: jnp.ndarray    # f32[M, 8, 3]
    child_high: jnp.ndarray   # f32[M, 8, 3]
    child_entry: jnp.ndarray  # i32[M, 8] — node idx >=0 | leaf-run code | PAD
    prim: jnp.ndarray         # i32[P] leaf-ordered primitive indices
    depth: int                # max wide-tree depth (stack sizing)
    max_leaf: int             # longest leaf run (<= 63)


def collapse(flat: FlatBVH) -> WideBVH:
    left = np.asarray(flat.left)
    right = np.asarray(flat.right)
    low = np.asarray(flat.low)
    high = np.asarray(flat.high)
    data = np.asarray(flat.data)
    cut = np.asarray(flat.cut)

    def area(i):
        s = np.maximum(high[i] - low[i], 0)
        return float(s[0] * s[1] + s[1] * s[2] + s[2] * s[0])

    def slots_needed(e: int) -> int:
        if data[e] < 0:
            return 1
        prims = int(cut[data[e] + 1] - cut[data[e]])
        return max(1, -(-prims // _MAX_RUN))

    def frontier(b: int) -> list[int]:
        if data[b] >= 0:
            entries = [b]
        else:
            entries = [int(left[b]), int(right[b])]
        while True:
            total = sum(slots_needed(e) for e in entries)
            expandable = [
                e for e in entries if data[e] < 0 and
                total - 1 + slots_needed(int(left[e]))
                + slots_needed(int(right[e])) <= WIDTH
            ]
            if not expandable:
                return entries
            pick = max(expandable, key=area)
            k = entries.index(pick)
            entries[k:k + 1] = [int(left[pick]), int(right[pick])]

    wide_children: list[list[int]] = []
    wide_of_binary: dict[int, int] = {}
    queue = [0]
    depth_of = {0: 0}
    max_depth = 0
    while queue:
        b = queue.pop(0)
        wide_of_binary[b] = len(wide_children)
        kids = frontier(b)
        wide_children.append(kids)
        for e in kids:
            if data[e] < 0:
                queue.append(e)
                depth_of[e] = depth_of[b] + 1
                max_depth = max(max_depth, depth_of[e])

    m = len(wide_children)
    child_low = np.full((m, WIDTH, 3), np.float32(np.inf))
    child_high = np.full((m, WIDTH, 3), np.float32(-np.inf))
    child_low = child_low.astype(np.float32)
    child_high = child_high.astype(np.float32)
    child_entry = np.full((m, WIDTH), _PAD, np.int32)

    max_run = 1
    for w, kids in enumerate(wide_children):
        slot = 0
        for e in kids:
            if data[e] >= 0:
                start = int(cut[data[e]])
                end = int(cut[data[e] + 1])
                s = start
                while s < end:
                    c = min(_MAX_RUN, end - s)
                    if slot >= WIDTH:
                        raise ValueError("wide-node slot overflow")
                    child_low[w, slot] = low[e]
                    child_high[w, slot] = high[e]
                    child_entry[w, slot] = _encode_leaf(s, c)
                    max_run = max(max_run, c)
                    s += c
                    slot += 1
            else:
                if slot >= WIDTH:
                    raise ValueError("wide-node slot overflow")
                child_low[w, slot] = low[e]
                child_high[w, slot] = high[e]
                child_entry[w, slot] = wide_of_binary[e]
                slot += 1

    return WideBVH(
        child_low=jnp.asarray(child_low),
        child_high=jnp.asarray(child_high),
        child_entry=jnp.asarray(child_entry),
        prim=flat.prim,
        depth=int(max_depth) + 1,
        max_leaf=int(max_run),
    )


def traverse_wide(wbvh: WideBVH, ro, rd, leaf_test, eps: float = EPSILON):
    """Nearest-hit over a WideBVH; same contract as accel.traverse.traverse."""
    n = ro.shape[0]
    cap = wbvh.depth * (WIDTH - 1) + 3
    rows = jnp.arange(n)
    n_prim = wbvh.prim.shape[0]
    max_leaf = wbvh.max_leaf

    flat_low = wbvh.child_low.reshape(-1, WIDTH * 3)
    flat_high = wbvh.child_high.reshape(-1, WIDTH * 3)
    inv = 1.0 / rd

    def cond(state):
        return jnp.any(state[1] >= 0)

    def body(state):
        stack, sp, t_best, prim_best = state
        active = sp >= 0
        slot = jnp.clip(sp, 0, cap - 1)
        cur = stack[rows, slot]
        is_node = active & (cur >= 0)
        is_leaf = active & (cur < 0) & (cur != _PAD)

        # ---- leaf runs: up to max_leaf primitive tests ----
        start, count = decode_leaf(jnp.where(is_leaf, cur, jnp.int32(-1)))
        for k in range(max_leaf):
            pidx = jnp.take(wbvh.prim,
                            jnp.clip(start + k, 0, max(n_prim - 1, 0)), axis=0)
            valid = is_leaf & (k < count)
            t = leaf_test(pidx, valid, ro, rd)
            better = valid & (t < t_best)
            t_best = jnp.where(better, t, t_best)
            prim_best = jnp.where(better, pidx, prim_best)

        # ---- wide nodes: test 8 child AABBs, push hits ----
        node = jnp.maximum(cur, 0)
        clow = jnp.take(flat_low, node, axis=0).reshape(n, WIDTH, 3)
        chigh = jnp.take(flat_high, node, axis=0).reshape(n, WIDTH, 3)
        entry = jnp.take(wbvh.child_entry, node, axis=0)        # [N,8]

        ti_ = (clow - ro[:, None, :]) * inv[:, None, :]
        to_ = (chigh - ro[:, None, :]) * inv[:, None, :]
        t1 = jnp.min(jnp.maximum(ti_, to_), axis=-1)
        t0 = jnp.max(jnp.minimum(ti_, to_), axis=-1)
        hit8 = (t1 > t0 - eps) & (t1 > 0.0) & (entry != _PAD) \
            & is_node[:, None]                                   # [N,8]

        push_count = jnp.sum(hit8.astype(jnp.int32), axis=1)
        new_sp = jnp.where(
            active, sp - 1 + jnp.where(is_node, push_count, 0), sp)

        # push so slot 0 ends on top (left-to-right DFS order):
        # slot k lands at (sp - 1 + #hit slots with index >= k)
        suffix = jnp.cumsum(hit8[:, ::-1].astype(jnp.int32), axis=1)[:, ::-1]
        for k in range(WIDTH):
            pos = jnp.clip(sp - 1 + suffix[:, k], 0, cap - 1)
            write = hit8[:, k]
            stack = stack.at[rows, pos].set(
                jnp.where(write, entry[:, k], stack[rows, pos]))
        return stack, new_sp, t_best, prim_best

    stack0 = jnp.full((n, cap), _PAD, jnp.int32).at[:, 0].set(0)
    sp0 = jnp.zeros((n,), jnp.int32)
    t0_ = jnp.full((n,), jnp.inf, jnp.float32)
    p0 = jnp.full((n,), -1, jnp.int32)
    _, _, t_best, prim_best = jax.lax.while_loop(
        cond, body, (stack0, sp0, t0_, p0))
    return t_best, prim_best
