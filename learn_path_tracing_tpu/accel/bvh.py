"""Host-side SAH BVH builder → flat device arrays.

Re-implements the reference's top-down sweep-SAH build
(/root/reference/legacy/PT_in_one_weekend/11_bvh.py:233-329, subclassed at
15_module.py:560-754) with numpy-vectorized sweeps:

- per node, per axis: stable argsort of primitive centroids, prefix/suffix
  AABB accumulations, cost = n0*area0 + n1*area1 (half-surface areas),
  minimum over (axis, split);
- split while depth < max_depth and count > max_leaf_objects;
- flattened to the same structure the reference serializes: a node table
  ``BVHNode{left, right, aabb, data}`` plus CSR leaf offsets and a leaf
  primitive table (we store primitive *indices*; the reference inlines
  primitive structs — conversion happens in scene/serialize.py).

Node ordering matches the reference exactly (children appended in build
order), so BVHs loaded from legacy ``.world.npy`` files and BVHs built here
traverse identically.

Known reference quirk NOT replicated: the mesh builder sorts by the full
centroid *vector* (lexicographic, effectively x-only) for all three axes
(15_module.py:681 — missing ``[axis]``), degrading its SAH to single-axis.
We sort per-axis as the sphere builder does (11_bvh.py:240).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.pytree import pytree_dataclass

INF = np.float32(np.inf)


@pytree_dataclass(meta_fields=("max_depth", "max_leaf"))
class FlatBVH:
    """Flat BVH as device arrays. ``data[i] >= 0`` marks a leaf whose
    primitives are ``prim[cut[data[i]] : cut[data[i]+1]]``."""

    left: jnp.ndarray    # i32[M]
    right: jnp.ndarray   # i32[M]
    low: jnp.ndarray     # f32[M,3]
    high: jnp.ndarray    # f32[M,3]
    data: jnp.ndarray    # i32[M]  leaf id or -1
    cut: jnp.ndarray     # i32[L+1]
    prim: jnp.ndarray    # i32[P]  primitive indices in leaf order
    max_depth: int
    max_leaf: int

    @property
    def n_nodes(self) -> int:
        return self.left.shape[0]


def _half_area(low, high):
    size = np.maximum(high - low, 0.0)
    return size[..., 0] * size[..., 1] + size[..., 1] * size[..., 2] \
        + size[..., 2] * size[..., 0]


def _split_node(idx, plow, phigh, centroid):
    """SAH sweep over one node's primitive set. Returns
    (left_idx, right_idx, left_aabb, right_aabb)."""
    n = idx.shape[0]
    best = (np.inf, None, None)  # cost, axis, split position
    orders = []
    for axis in range(3):
        order = idx[np.argsort(centroid[idx, axis], kind="stable")]
        orders.append(order)
        lo = plow[order]
        hi = phigh[order]
        # prefix: bounds of order[:i+1]; suffix: bounds of order[i+1:]
        pre_low = np.minimum.accumulate(lo, axis=0)
        pre_high = np.maximum.accumulate(hi, axis=0)
        suf_low = np.minimum.accumulate(lo[::-1], axis=0)[::-1]
        suf_high = np.maximum.accumulate(hi[::-1], axis=0)[::-1]
        counts = np.arange(1, n, dtype=np.float64)
        cost = counts * _half_area(pre_low[:-1], pre_high[:-1]) \
            + (n - counts) * _half_area(suf_low[1:], suf_high[1:])
        i = int(np.argmin(cost))
        if cost[i] < best[0]:
            best = (cost[i], axis, i)
    _, axis, i = best
    order = orders[axis]
    lo = plow[order]
    hi = phigh[order]
    left_aabb = (lo[: i + 1].min(0), hi[: i + 1].max(0))
    right_aabb = (lo[i + 1:].min(0), hi[i + 1:].max(0))
    return order[: i + 1], order[i + 1:], left_aabb, right_aabb


def build_bvh(plow, phigh, centroid=None, max_depth: int = 16,
              max_leaf: int = 4, backend: str = "auto") -> FlatBVH:
    """Build a FlatBVH over primitives with per-primitive AABBs
    ``plow/phigh: f32[N,3]`` (spheres: center∓radius; triangles: vertex
    min/max). ``centroid`` defaults to the AABB center.

    ``backend``: 'auto' tries the native C++ builder (accel/native.py,
    ~10x faster, identical output) and falls back to numpy; 'numpy' or
    'native' force one.
    """
    plow = np.asarray(plow, np.float32)
    phigh = np.asarray(phigh, np.float32)
    if centroid is None:
        centroid = 0.5 * (plow + phigh)
    centroid = np.asarray(centroid, np.float32)
    n = plow.shape[0]
    if n == 0:
        raise ValueError("empty primitive set")

    if backend in ("auto", "native"):
        from .native import build_bvh_native

        res = build_bvh_native(plow, phigh, centroid, max_depth, max_leaf)
        if res is not None:
            left, right, low, high, data, cut, prim = res
            return FlatBVH(
                left=jnp.asarray(left), right=jnp.asarray(right),
                low=jnp.asarray(low), high=jnp.asarray(high),
                data=jnp.asarray(data), cut=jnp.asarray(cut),
                prim=jnp.asarray(prim),
                max_depth=int(max_depth),
                max_leaf=int((cut[1:] - cut[:-1]).max(initial=1)),
            )
        if backend == "native":
            raise RuntimeError("native BVH builder unavailable")

    nodes = []  # [left, right, low, high, data]
    queue = []  # (depth, idx array), aligned with nodes
    root_aabb = (plow.min(0), phigh.max(0))
    nodes.append([-1, -1, root_aabb[0], root_aabb[1], -1])
    queue.append((0, np.arange(n, dtype=np.int64)))
    leaves = []

    i = 0
    while i < len(queue):
        depth, idx = queue[i]
        if depth < max_depth and idx.shape[0] > max_leaf:
            li, ri, laabb, raabb = _split_node(idx, plow, phigh, centroid)
            nodes[i][0] = len(nodes)
            nodes.append([-1, -1, laabb[0], laabb[1], -1])
            queue.append((depth + 1, li))
            nodes[i][1] = len(nodes)
            nodes.append([-1, -1, raabb[0], raabb[1], -1])
            queue.append((depth + 1, ri))
        else:
            nodes[i][4] = len(leaves)
            leaves.append(idx)
        i += 1

    cut = np.zeros(len(leaves) + 1, np.int32)
    for k, leaf in enumerate(leaves):
        cut[k + 1] = cut[k] + leaf.shape[0]
    prim = (np.concatenate(leaves) if leaves else np.zeros(0)).astype(np.int32)
    actual_max_leaf = int((cut[1:] - cut[:-1]).max(initial=1))

    return FlatBVH(
        left=jnp.asarray(np.array([x[0] for x in nodes], np.int32)),
        right=jnp.asarray(np.array([x[1] for x in nodes], np.int32)),
        low=jnp.asarray(np.stack([x[2] for x in nodes]).astype(np.float32)),
        high=jnp.asarray(np.stack([x[3] for x in nodes]).astype(np.float32)),
        data=jnp.asarray(np.array([x[4] for x in nodes], np.int32)),
        cut=jnp.asarray(cut),
        prim=jnp.asarray(prim),
        max_depth=int(max_depth),
        max_leaf=actual_max_leaf,
    )


def bvh_stats(bvh: FlatBVH) -> dict:
    data = np.asarray(bvh.data)
    cut = np.asarray(bvh.cut)
    sizes = cut[1:] - cut[:-1]
    return {
        "nodes": int(data.shape[0]),
        "leaves": int((data >= 0).sum()),
        "prims": int(cut[-1]),
        "max_leaf_size": int(sizes.max(initial=0)),
        "mean_leaf_size": float(sizes.mean()) if sizes.size else 0.0,
    }
