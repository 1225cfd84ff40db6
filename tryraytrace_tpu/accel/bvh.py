"""Host-side BVH builder emitting a *threaded* linear BVH.

Parity target: BVH::build / build_recursive (reference bvh.cpp:32-113):
top-down recursion, split axis = longest extent of the node bounds,
full centroid sort on that axis, median split by count, leaf iff
exactly one primitive, preorder (depth-first) node emission so the
left child is ``node_idx + 1``, and degenerate per-primitive AABBs
padded by 1e-3 (bvh.cpp:21-27).  Like the reference, the build
*reorders the primitive array* -- here as an explicit permutation
applied to all SoA arrays (SceneArrays.permuted) instead of an
in-place AoS sort.

TPU-first change: in addition to child indices we emit *miss links*
(preorder skip pointers).  The reference walks the tree with a
per-thread stack (renderer.cu:387-424) pushing right-then-left, i.e.
plain preorder.  A threaded traversal

    next = (hit and internal) ? node + 1 : miss_link[node]

visits nodes in exactly the same order with the same t_max pruning,
but needs *no stack at all* -- per-ray state is one int32.  That turns
the traversal into a branch-free lockstep loop, which is what the TPU
VPU wants (divergent per-lane stacks are the CUDA pattern that must
not be copied).

Because the median split is by count, the tree is balanced: node
count is exactly ``2n - 1`` and the right-child index of a node
covering ``m`` primitives is ``node + 2*(m_left)``, which lets us
assign miss links in a single preorder pass.
"""

from __future__ import annotations

import dataclasses

import numpy as np

AABB_PAD = np.float32(1e-3)  # bvh.cpp:21-27


@dataclasses.dataclass
class LinearBVH:
    """Flat threaded BVH. ``M = 2n - 1`` nodes, preorder layout."""

    bounds: np.ndarray     # [M, 6] f32: min xyz, max xyz
    leaf_prim: np.ndarray  # [M] i32: primitive index if leaf, else -1
    miss: np.ndarray       # [M] i32: preorder skip pointer; M = done
    left: np.ndarray       # [M] i32: left child (-1 for leaf)   [debug/tests]
    right: np.ndarray      # [M] i32: right child (-1 for leaf)  [debug/tests]
    axis: np.ndarray       # [M] i32: split axis (debug parity, bvh.h:26)
    perm: np.ndarray       # [N] i32: perm[slot] = original primitive index

    @property
    def num_nodes(self) -> int:
        return int(self.bounds.shape[0])

    @property
    def sentinel(self) -> int:
        return self.num_nodes

    def max_depth(self) -> int:
        """Tree depth (root = 1); bounds the traversal trip count."""
        if self.num_nodes == 0:
            return 0
        depth = np.zeros(self.num_nodes, dtype=np.int32)
        depth[0] = 1
        for i in range(self.num_nodes):
            if self.left[i] >= 0:
                depth[self.left[i]] = depth[i] + 1
                depth[self.right[i]] = depth[i] + 1
        return int(depth.max())


def primitive_bounds(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray) -> np.ndarray:
    """Padded per-triangle AABBs [N, 6] (get_object_bounds, bvh.cpp:11-29)."""
    lo = np.minimum(np.minimum(v0, v1), v2).astype(np.float32)
    hi = np.maximum(np.maximum(v0, v1), v2).astype(np.float32)
    thin = (hi - lo) < AABB_PAD
    lo = np.where(thin, lo - AABB_PAD, lo)
    hi = np.where(thin, hi + AABB_PAD, hi)
    return np.concatenate([lo, hi], axis=-1)


def centroids(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray) -> np.ndarray:
    """Triangle centroids (get_centroid, bvh.cpp:5-8; note 0.333333f)."""
    return ((v0 + v1 + v2) * np.float32(0.333333)).astype(np.float32)


def build_bvh(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
              use_native: bool = True) -> LinearBVH:
    n = int(v0.shape[0])
    if n == 0:
        e = np.empty
        return LinearBVH(e((0, 6), np.float32), e(0, np.int32), e(0, np.int32),
                         e(0, np.int32), e(0, np.int32), e(0, np.int32),
                         e(0, np.int32))
    pb = primitive_bounds(v0, v1, v2)
    cent = centroids(v0, v1, v2)

    if use_native:
        from tryraytrace_tpu import native

        if native.available():
            res = native.bvh_build(cent, pb)
            if res is not None:
                perm, node_bounds, leaf_prim, miss, m = res
                return _rebuild_links(node_bounds, leaf_prim, miss, perm)

    return _build_python(pb, cent)


def _build_python(pb: np.ndarray, cent: np.ndarray) -> LinearBVH:
    n = pb.shape[0]
    m = 2 * n - 1
    bounds = np.empty((m, 6), dtype=np.float32)
    leaf_prim = np.full(m, -1, dtype=np.int32)
    miss = np.full(m, m, dtype=np.int32)
    left = np.full(m, -1, dtype=np.int32)
    right = np.full(m, -1, dtype=np.int32)
    axis_arr = np.zeros(m, dtype=np.int32)
    order = np.arange(n, dtype=np.int64)

    # Iterative preorder build; the work stack carries (start, end,
    # miss_link).  Because allocation order is preorder and subtree
    # sizes are known (2k-1), a stack processed LIFO with right pushed
    # first yields exactly the reference's depth-first node numbering.
    stack = [(0, n, m)]
    next_node = 0
    while stack:
        start, end, miss_link = stack.pop()
        idx = next_node
        next_node += 1
        seg = order[start:end]
        bb = pb[seg]
        lo = bb[:, :3].min(axis=0)
        hi = bb[:, 3:].max(axis=0)
        bounds[idx, :3] = lo
        bounds[idx, 3:] = hi
        miss[idx] = miss_link
        if end - start == 1:
            leaf_prim[idx] = start  # post-permutation slot
            continue
        # Split axis: longest extent, reference tie-break (bvh.cpp:76-79).
        size = hi - lo
        ax = 0
        if size[1] > size[0]:
            ax = 1
        if size[2] > size[1] and size[2] > size[0]:
            ax = 2
        axis_arr[idx] = ax
        # Sort this segment by centroid along ax (bvh.cpp:85-93).
        seg_sorted = seg[np.argsort(cent[seg, ax], kind="stable")]
        order[start:end] = seg_sorted
        mid = start + (end - start) // 2
        left_idx = idx + 1
        right_idx = idx + 2 * (mid - start)  # preorder: after left subtree
        left[idx] = left_idx
        right[idx] = right_idx
        # LIFO: push right first so left is processed (allocated) next.
        stack.append((mid, end, miss_link))
        stack.append((start, mid, right_idx))

    return LinearBVH(bounds, leaf_prim, miss, left, right, axis_arr,
                     order.astype(np.int32))


def _rebuild_links(bounds, leaf_prim, miss, perm) -> LinearBVH:
    """Derive left/right/axis from a (bounds, leaf_prim, miss) triple
    produced by the native builder (preorder layout)."""
    m = bounds.shape[0]
    left = np.full(m, -1, dtype=np.int32)
    right = np.full(m, -1, dtype=np.int32)
    internal = leaf_prim < 0
    idx = np.nonzero(internal)[0]
    left[idx] = idx + 1
    # right child = miss link of the left child's subtree root.
    right[idx] = miss[idx + 1]
    return LinearBVH(bounds.astype(np.float32), leaf_prim.astype(np.int32),
                     miss.astype(np.int32), left, right,
                     np.zeros(m, np.int32), perm.astype(np.int32))
