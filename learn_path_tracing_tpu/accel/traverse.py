"""Wavefront BVH traversal in pure XLA (lax.while_loop).

TPU-native re-design of the reference's per-thread stack machine
(15_module.py:756-779: fixed register stack with ``array_get/array_set``
static unrolls): here the *whole wavefront* steps in lockstep — every live
ray advances its own stack entry each iteration; rays that finish idle until
the last ray is done. States live in ``[N, depth+1]`` arrays; node fetches
are XLA gathers against the flat node table.

Traversal order and hit semantics match the reference exactly (unordered
child push, epsilon-relaxed slab test, strict nearest-t with first-found
tie-break), so BVH results are interchangeable with a brute-force scan.

The Pallas kernel in ops/ is the VMEM-resident fast path; this module is
the portable reference implementation and the fallback on CPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.aabb import aabb_hit
from ..geometry.sphere import T_MIN
from ..geometry.triangle import triangle_t
from .bvh import FlatBVH


def traverse(bvh: FlatBVH, ro, rd, leaf_test, eps: float = T_MIN):
    """Nearest-hit traversal.

    ``leaf_test(prim_idx i32[N], valid bool[N], ro, rd) -> t f32[N]`` must
    return +inf for invalid/missed lanes and respect the epsilon cut.

    Returns ``(t f32[N] (+inf miss), prim i32[N] (-1 miss))``.
    """
    n = ro.shape[0]
    depth_cap = bvh.max_depth + 2
    max_leaf = bvh.max_leaf
    n_prim = bvh.prim.shape[0]
    rows = jnp.arange(n)

    def cond(state):
        sp = state[1]
        return jnp.any(sp >= 0)

    def body(state):
        stack, sp, t_best, prim_best = state
        active = sp >= 0
        slot = jnp.clip(sp, 0, depth_cap - 1)
        cur = stack[rows, slot]

        low = jnp.take(bvh.low, cur, axis=0)
        high = jnp.take(bvh.high, cur, axis=0)
        hitbox = aabb_hit(low, high, ro, rd) & active

        data = jnp.take(bvh.data, cur, axis=0)
        is_leaf = (data >= 0) & hitbox

        # Leaf scan: up to max_leaf primitive tests, statically unrolled.
        leaf_id = jnp.maximum(data, 0)
        start = jnp.take(bvh.cut, leaf_id, axis=0)
        count = jnp.take(bvh.cut, leaf_id + 1, axis=0) - start
        for k in range(max_leaf):
            pidx = jnp.take(bvh.prim, jnp.clip(start + k, 0, max(n_prim - 1, 0)),
                            axis=0)
            valid = is_leaf & (k < count)
            t = leaf_test(pidx, valid, ro, rd)
            better = valid & (t < t_best)
            t_best = jnp.where(better, t, t_best)
            prim_best = jnp.where(better, pidx, prim_best)

        # Stack update (mirrors 15_module.py:645-655): on an inner-node hit,
        # overwrite the current slot with `left` and push `right`; otherwise pop.
        left = jnp.take(bvh.left, cur, axis=0)
        right = jnp.take(bvh.right, cur, axis=0)
        push = hitbox & ~is_leaf
        stack = stack.at[rows, slot].set(jnp.where(push, left, stack[rows, slot]))
        new_sp = jnp.where(push, sp + 1, jnp.where(active, sp - 1, sp))
        new_slot = jnp.clip(new_sp, 0, depth_cap - 1)
        stack = stack.at[rows, new_slot].set(
            jnp.where(push, right, stack[rows, new_slot]))
        return stack, new_sp, t_best, prim_best

    stack0 = jnp.zeros((n, depth_cap), jnp.int32)
    sp0 = jnp.zeros((n,), jnp.int32)
    t0 = jnp.full((n,), jnp.inf, jnp.float32)
    p0 = jnp.full((n,), -1, jnp.int32)
    _, _, t_best, prim_best = jax.lax.while_loop(
        cond, body, (stack0, sp0, t0, p0))
    return t_best, prim_best


def make_sphere_leaf_test(centers, radii, transparency, eps: float = T_MIN):
    """Leaf test over a sphere table (same quadratic semantics as
    geometry.sphere.intersect_spheres, one primitive per lane)."""

    def leaf_test(pidx, valid, ro, rd):
        c = jnp.take(centers, pidx, axis=0)
        r = jnp.take(radii, pidx, axis=0)
        tr = jnp.take(transparency, pidx, axis=0)
        oc = ro - c
        half_b = jnp.sum(oc * rd, axis=-1)
        cterm = jnp.sum(oc * oc, axis=-1) - r * r
        disc = half_b * half_b - cterm
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_near = -half_b - sq
        t_far = -half_b + sq
        t = jnp.where((t_near < eps) & (tr > 0.0), t_far, t_near)
        ok = valid & (disc >= 0.0) & (t > eps)
        return jnp.where(ok, t, jnp.inf)

    return leaf_test


def make_triangle_leaf_test(v0, v1, v2, eps: float = T_MIN):
    """Leaf test over a triangle vertex-position table ``v0/v1/v2: f32[T,3]``."""

    def leaf_test(pidx, valid, ro, rd):
        p1 = jnp.take(v0, pidx, axis=0)
        p2 = jnp.take(v1, pidx, axis=0)
        p3 = jnp.take(v2, pidx, axis=0)
        t = triangle_t(p1, p2, p3, ro, rd, eps=eps)
        return jnp.where(valid, t, jnp.inf)

    return leaf_test
