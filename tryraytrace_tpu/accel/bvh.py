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
    """Flat threaded BVH, preorder layout.

    With ``leaf_size=1`` (the reference's singleton-leaf shape,
    bvh.cpp:67-72) there are exactly ``2n - 1`` nodes.  Fat leaves
    (``leaf_size > 1``) hold up to that many *contiguous* primitives;
    they trade tree depth for per-visit work, which is the right
    trade on TPU where the per-visit row fetch is the cost unit and
    in-row vector math is effectively free.
    """

    bounds: np.ndarray      # [M, 6] f32: min xyz, max xyz
    leaf_prim: np.ndarray   # [M] i32: first primitive slot if leaf, else -1
    leaf_count: np.ndarray  # [M] i32: primitives in leaf (0 for internal)
    miss: np.ndarray        # [M] i32: preorder skip pointer; M = done
    left: np.ndarray        # [M] i32: left child (-1 for leaf)   [debug/tests]
    right: np.ndarray       # [M] i32: right child (-1 for leaf)  [debug/tests]
    axis: np.ndarray        # [M] i32: split axis (debug parity, bvh.h:26)
    perm: np.ndarray        # [N] i32: perm[slot] = original primitive index
    # Build-time quad collapse mapping ({root: [child ids]}), stashed
    # by upload_scene so bounds-dependent criteria ("sa"/"dp") stay
    # REFIT-STABLE: a refit repacks the table with this mapping (same
    # rows, new bounds) instead of re-collapsing on moved bounds,
    # which could change the table shape and force a recompile.
    # None until a quad upload computes it; refit_bvh carries it over.
    quad_children: dict | None = None
    # Criterion the stashed mapping was computed under -- upload_scene
    # recomputes the stash when a re-upload asks for a different
    # quad_collapse (an A/B sweep sharing a prebuilt bvh must not
    # silently pack the old criterion's mapping).
    quad_children_crit: str | None = None

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
              use_native: bool = True, leaf_size: int = 1,
              method: str = "median",
              c_isect: float = 0.4) -> LinearBVH:
    """Build a threaded BVH.

    method="median": the reference's algorithm exactly (longest axis,
    centroid sort, median split by count; bvh.cpp:47-113).
    method="sah": binned surface-area-heuristic build -- same node
    layout and traversal contract, typically 25-50% fewer node visits
    on mesh scenes.  Closest-hit results are identical either way.
    method="sbvh": SAH plus spatial splits (Stich et al. 2009 style):
    overlapping nodes may be split by a plane, with straddling
    triangles *referenced* from both sides under clipped bounds --
    ``perm`` then maps reference slots to primitives surjectively
    (duplicates allowed).  Cuts node visits further on scenes with
    long thin triangles.  Results identical (duplicate references
    carry identical triangle data; closest-hit is order-independent).
    """
    n = int(v0.shape[0])
    if n == 0:
        e = np.empty
        return LinearBVH(e((0, 6), np.float32), e(0, np.int32), e(0, np.int32),
                         e(0, np.int32), e(0, np.int32), e(0, np.int32),
                         e(0, np.int32), e(0, np.int32))
    pb = primitive_bounds(v0, v1, v2)
    cent = centroids(v0, v1, v2)

    if method == "sah":
        # The native builder hardcodes the tuned c_isect; non-default
        # values (cost-model sweeps) take the NumPy path.
        if use_native and c_isect == 0.4:
            from tryraytrace_tpu import native

            if native.available():
                res = native.bvh_build_sah(cent, pb, leaf_size)
                if res is not None:
                    (perm, bounds, leaf_prim, leaf_count, miss, left,
                     right, axis, _) = res
                    return LinearBVH(bounds, leaf_prim, leaf_count,
                                     miss, left, right, axis, perm)
        return _build_sah(pb, cent, leaf_size, c_isect=c_isect)
    if method == "sbvh":
        return _build_sbvh(pb, v0, v1, v2, leaf_size)

    if use_native and leaf_size == 1:
        from tryraytrace_tpu import native

        if native.available():
            res = native.bvh_build(cent, pb)
            if res is not None:
                perm, node_bounds, leaf_prim, miss, axis, m = res
                return _rebuild_links(node_bounds, leaf_prim, miss, axis,
                                      perm)

    return _build_python(pb, cent, leaf_size)


def _num_nodes(m: int, leaf_size: int, cache: dict) -> int:
    """Node count of a median-split-by-count subtree over m prims."""
    got = cache.get(m)
    if got is not None:
        return got
    if m <= leaf_size:
        result = 1
    else:
        half = m // 2
        result = 1 + _num_nodes(half, leaf_size, cache) + _num_nodes(
            m - half, leaf_size, cache)
    cache[m] = result
    return result


def _build_python(pb: np.ndarray, cent: np.ndarray,
                  leaf_size: int = 1) -> LinearBVH:
    n = pb.shape[0]
    count_cache: dict = {}
    m = _num_nodes(n, leaf_size, count_cache)
    bounds = np.empty((m, 6), dtype=np.float32)
    leaf_prim = np.full(m, -1, dtype=np.int32)
    leaf_count = np.zeros(m, dtype=np.int32)
    miss = np.full(m, m, dtype=np.int32)
    left = np.full(m, -1, dtype=np.int32)
    right = np.full(m, -1, dtype=np.int32)
    axis_arr = np.zeros(m, dtype=np.int32)
    order = np.arange(n, dtype=np.int64)

    # Iterative preorder build; the work stack carries (start, end,
    # miss_link).  Allocation order is preorder, and subtree node
    # counts are deterministic (median split by count), so the right
    # child's index is known before the left subtree is built --
    # that's what lets miss links resolve in one pass.
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
        if end - start <= leaf_size:
            leaf_prim[idx] = start  # post-permutation slot
            leaf_count[idx] = end - start
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
        right_idx = idx + 1 + _num_nodes(mid - start, leaf_size, count_cache)
        left[idx] = left_idx
        right[idx] = right_idx
        # LIFO: push right first so left is processed (allocated) next.
        stack.append((mid, end, miss_link))
        stack.append((start, mid, right_idx))

    return LinearBVH(bounds, leaf_prim, leaf_count, miss, left, right,
                     axis_arr, order.astype(np.int32))



def _flatten_preorder(t_lo, t_hi, t_left, t_right, t_axis, t_start,
                      t_count, perm) -> LinearBVH:
    """Preorder flatten with miss links, shared by the SAH and SBVH
    builders (the native builder mirrors it in csrc/trt_native.cpp):
    assigns final node ids depth-first-left, threading each node's
    miss link to the next preorder node outside its subtree.
    ``t_count[tid] > 0`` marks a leaf holding ``t_count`` contiguous
    reference slots starting at ``t_start``."""
    mm = len(t_lo)
    bounds = np.empty((mm, 6), np.float32)
    leaf_prim = np.full(mm, -1, np.int32)
    leaf_count = np.zeros(mm, np.int32)
    miss = np.full(mm, mm, np.int32)
    left = np.full(mm, -1, np.int32)
    right = np.full(mm, -1, np.int32)
    axis_arr = np.zeros(mm, np.int32)
    next_node = 0
    stack = [(0, mm)]  # (temp id, miss link in FINAL ids)
    while stack:
        tid, miss_link = stack.pop()
        nid = next_node
        next_node += 1
        bounds[nid, :3] = t_lo[tid]
        bounds[nid, 3:] = t_hi[tid]
        miss[nid] = miss_link
        axis_arr[nid] = t_axis[tid]
        if t_count[tid] > 0:
            leaf_prim[nid] = t_start[tid]
            leaf_count[nid] = t_count[tid]
            continue
        # Left child is allocated next (preorder); its subtree size
        # tells us the right child's final id.
        lsize = _subtree_size(t_left[tid], t_left, t_right)
        l_id = nid + 1
        r_id = nid + 1 + lsize
        left[nid] = l_id
        right[nid] = r_id
        stack.append((t_right[tid], miss_link))
        stack.append((t_left[tid], r_id))

    return LinearBVH(bounds[:next_node], leaf_prim[:next_node],
                     leaf_count[:next_node], miss[:next_node],
                     left[:next_node], right[:next_node],
                     axis_arr[:next_node],
                     np.asarray(perm, dtype=np.int32))


def _build_sah(pb: np.ndarray, cent: np.ndarray, leaf_size: int,
               n_bins: int = 16, c_trav: float = 1.0,
               c_isect: float = 0.4) -> LinearBVH:
    """Binned SAH top-down build (Wald 2007 style).

    ``c_isect`` is deliberately low: in the fused-row traversal a leaf's
    inline Moller-Trumbore tests are free vector math riding the row
    fetch, so the real cost unit is the NODE VISIT, not the primitive
    test.  On the teapot scene c_isect 1.5 -> 0.4 cut mean visits per
    primary ray from 17 to 7.4 at identical images (measured sweep in
    docs/PERFORMANCE.md).

    Two passes: a recursive phase producing a temporary child-linked
    tree (subtree sizes are data-dependent, unlike the median split),
    then a preorder flatten that assigns the final node ids and miss
    links expected by the threaded traversal.
    """
    n = pb.shape[0]
    order = np.arange(n, dtype=np.int64)
    cmin = pb[:, :3]
    cmax = pb[:, 3:]

    # Temp tree storage.
    t_lo: list[np.ndarray] = []
    t_hi: list[np.ndarray] = []
    t_left: list[int] = []
    t_right: list[int] = []
    t_axis: list[int] = []
    t_start: list[int] = []
    t_count: list[int] = []

    def half_area(lo, hi):
        d = np.maximum(hi - lo, 0.0)
        return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]

    def rec(start: int, end: int) -> int:
        idx = len(t_lo)
        seg = order[start:end]
        lo = cmin[seg].min(axis=0)
        hi = cmax[seg].max(axis=0)
        t_lo.append(lo)
        t_hi.append(hi)
        t_left.append(-1)
        t_right.append(-1)
        t_axis.append(0)
        t_start.append(start)
        t_count.append(end - start)
        m = end - start
        if m <= 1:
            return idx

        c = cent[seg]
        clo = c.min(axis=0)
        chi = c.max(axis=0)
        best = None  # (cost, axis, bin_split, assignment)
        for ax in range(3):
            extent = chi[ax] - clo[ax]
            if extent <= 0:
                continue
            bins = np.minimum(
                ((c[:, ax] - clo[ax]) / extent * n_bins).astype(np.int64),
                n_bins - 1)
            # Per-bin counts and bounds.
            counts = np.bincount(bins, minlength=n_bins)
            blo = np.full((n_bins, 3), np.inf, np.float32)
            bhi = np.full((n_bins, 3), -np.inf, np.float32)
            for b in range(n_bins):
                mask = bins == b
                if counts[b]:
                    blo[b] = cmin[seg[mask]].min(axis=0)
                    bhi[b] = cmax[seg[mask]].max(axis=0)
            # Sweep: prefix/suffix areas.
            for split in range(1, n_bins):
                nl = counts[:split].sum()
                nr = m - nl
                if nl == 0 or nr == 0:
                    continue
                llo = blo[:split].min(axis=0)
                lhi = bhi[:split].max(axis=0)
                rlo = blo[split:].min(axis=0)
                rhi = bhi[split:].max(axis=0)
                cost = (half_area(llo, lhi) * nl
                        + half_area(rlo, rhi) * nr)
                if best is None or cost < best[0]:
                    best = (cost, ax, split, bins)

        parent_area = half_area(lo, hi)
        leaf_cost = c_isect * m
        if best is not None and parent_area > 0:
            split_cost = c_trav + c_isect * best[0] / parent_area
        else:
            split_cost = np.inf
        if (m <= leaf_size and
                (best is None or split_cost >= leaf_cost)):
            return idx  # SAH says leaf (and it fits a fat-leaf row)
        if best is None:
            # All centroids identical: force an even split.
            mid = start + m // 2
        else:
            _, ax, split, bins = best
            t_axis[idx] = ax
            left_mask = bins < split
            left_seg = seg[left_mask]
            right_seg = seg[~left_mask]
            if len(left_seg) == 0 or len(right_seg) == 0:
                mid = start + m // 2
            else:
                order[start:start + len(left_seg)] = left_seg
                order[start + len(left_seg):end] = right_seg
                mid = start + len(left_seg)
        t_left[idx] = rec(start, mid)
        t_right[idx] = rec(mid, end)
        t_count[idx] = 0
        return idx

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))
    try:
        rec(0, n)
    finally:
        sys.setrecursionlimit(old_limit)

    return _flatten_preorder(t_lo, t_hi, t_left, t_right, t_axis,
                             t_start, t_count, order)


def _clip_tri_slab(v0, v1, v2, axis: int, lo_p, hi_p):
    """Bounds of each triangle clipped to the slab
    ``lo_p <= x[axis] <= hi_p`` -> (lo[R,3], hi[R,3]).

    The clipped polygon's vertices are exactly: original vertices
    inside the slab, plus triangle-edge intersections with the two
    slab planes -- bounds over that candidate set are the exact
    clipped-triangle bounds (no polygon bookkeeping needed).
    Empty intersections yield lo > hi.
    """
    pts = np.stack([v0, v1, v2], axis=1)          # [R, 3, 3]
    r = pts.shape[0]
    cands = [pts]
    masks = [(pts[:, :, axis] >= lo_p[:, None])
             & (pts[:, :, axis] <= hi_p[:, None])]
    edges = ((0, 1), (1, 2), (2, 0))
    for plane in (lo_p, hi_p):
        for a, b in edges:
            pa, pb = pts[:, a], pts[:, b]
            da = pa[:, axis] - plane
            db = pb[:, axis] - plane
            cross = (da * db) < 0.0  # strict: endpoints handled above
            denom = np.where(cross, pb[:, axis] - pa[:, axis], 1.0)
            t = np.clip((plane - pa[:, axis]) / denom, 0.0, 1.0)
            p = pa + (pb - pa) * t[:, None]
            cands.append(p[:, None, :])
            masks.append(cross[:, None])
    cand = np.concatenate(cands, axis=1)          # [R, 9, 3]
    mask = np.concatenate(masks, axis=1)[..., None]
    lo = np.where(mask, cand, np.inf).min(axis=1).astype(np.float32)
    hi = np.where(mask, cand, -np.inf).max(axis=1).astype(np.float32)
    return lo, hi


def _pad_thin(lo: np.ndarray, hi: np.ndarray):
    """Degenerate-extent padding, same rule as primitive_bounds."""
    thin = (hi - lo) < AABB_PAD
    return (np.where(thin, lo - AABB_PAD, lo),
            np.where(thin, hi + AABB_PAD, hi))


def _build_sbvh(pb: np.ndarray, v0: np.ndarray, v1: np.ndarray,
                v2: np.ndarray, leaf_size: int, n_bins: int = 16,
                c_trav: float = 1.0, c_isect: float = 0.4,
                alpha: float = 1e-5, max_ref_factor: float = 2.0
                ) -> LinearBVH:
    """Spatial-split BVH (Stich et al., "Spatial Splits in Bounding
    Volume Hierarchies", HPG 2009) adapted to the fused-row threaded
    layout: object splits exactly as _build_sah, plus chopped-binning
    spatial split candidates whenever the object split's children
    overlap by more than ``alpha`` of the root area.  A straddling
    triangle is *referenced* on both sides with exact clipped bounds
    (_clip_tri_slab); total references are capped at
    ``max_ref_factor * n`` after which spatial splits stop.

    Same node/traversal contract as the other builders; ``perm`` maps
    leaf slots to primitive ids surjectively.
    """
    n = pb.shape[0]
    # Reference pool (grows on spatial splits).
    ref_prim = list(range(n))
    ref_lo = [pb[i, :3].copy() for i in range(n)]
    ref_hi = [pb[i, 3:].copy() for i in range(n)]
    max_refs = int(max_ref_factor * n)

    t_lo: list[np.ndarray] = []
    t_hi: list[np.ndarray] = []
    t_left: list[int] = []
    t_right: list[int] = []
    t_axis: list[int] = []
    t_refs: list[list[int] | None] = []  # leaf reference lists

    def half_area(lo, hi):
        d = np.maximum(hi - lo, 0.0)
        return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]

    root_lo = pb[:, :3].min(axis=0)
    root_hi = pb[:, 3:].max(axis=0)
    root_area = max(half_area(root_lo, root_hi), 1e-30)

    def rec(refs: np.ndarray) -> int:
        idx = len(t_lo)
        rlo = np.stack([ref_lo[i] for i in refs])
        rhi = np.stack([ref_hi[i] for i in refs])
        lo = rlo.min(axis=0)
        hi = rhi.max(axis=0)
        t_lo.append(lo)
        t_hi.append(hi)
        t_left.append(-1)
        t_right.append(-1)
        t_axis.append(0)
        t_refs.append(None)
        m = len(refs)
        if m <= 1:
            t_refs[idx] = list(refs)
            return idx

        cent = (rlo + rhi) * 0.5
        clo = cent.min(axis=0)
        chi = cent.max(axis=0)

        # --- object split (binned SAH over reference bounds) ---
        best_obj = None  # (cost, axis, bins, split, llo, lhi, rlo, rhi)
        for ax in range(3):
            extent = chi[ax] - clo[ax]
            if extent <= 0:
                continue
            bins = np.minimum(
                ((cent[:, ax] - clo[ax]) / extent * n_bins).astype(np.int64),
                n_bins - 1)
            counts = np.bincount(bins, minlength=n_bins)
            blo = np.full((n_bins, 3), np.inf, np.float32)
            bhi = np.full((n_bins, 3), -np.inf, np.float32)
            for b in range(n_bins):
                msk = bins == b
                if counts[b]:
                    blo[b] = rlo[msk].min(axis=0)
                    bhi[b] = rhi[msk].max(axis=0)
            for split in range(1, n_bins):
                nl = counts[:split].sum()
                nr = m - nl
                if nl == 0 or nr == 0:
                    continue
                llo = blo[:split].min(axis=0)
                lhi = bhi[:split].max(axis=0)
                rlo2 = blo[split:].min(axis=0)
                rhi2 = bhi[split:].max(axis=0)
                cost = half_area(llo, lhi) * nl + half_area(rlo2, rhi2) * nr
                if best_obj is None or cost < best_obj[0]:
                    best_obj = (cost, ax, bins, split,
                                llo, lhi, rlo2, rhi2)

        # --- spatial split (chopped binning), gated by child overlap ---
        best_sp = None  # (cost, axis, plane)
        try_spatial = len(ref_prim) < max_refs and best_obj is not None
        if try_spatial:
            _, _, _, _, ollo, olhi, orlo, orhi = best_obj
            o_lo = np.maximum(ollo, orlo)
            o_hi = np.minimum(olhi, orhi)
            if np.all(o_hi > o_lo):
                overlap = half_area(o_lo, o_hi)
            else:
                overlap = 0.0
            try_spatial = overlap / root_area > alpha
        if try_spatial:
            prims = np.array([ref_prim[i] for i in refs])
            tv0, tv1, tv2 = v0[prims], v1[prims], v2[prims]
            for ax in range(3):
                extent = hi[ax] - lo[ax]
                if extent <= 0:
                    continue
                width = extent / n_bins
                b0 = np.minimum(((rlo[:, ax] - lo[ax]) / width)
                                .astype(np.int64), n_bins - 1)
                b1 = np.minimum(((rhi[:, ax] - lo[ax]) / width)
                                .astype(np.int64), n_bins - 1)
                b0 = np.maximum(b0, 0)
                b1 = np.maximum(b1, b0)
                blo = np.full((n_bins, 3), np.inf, np.float32)
                bhi = np.full((n_bins, 3), -np.inf, np.float32)
                for b in range(n_bins):
                    span = (b0 <= b) & (b1 >= b)
                    if not span.any():
                        continue
                    p_lo = np.full(span.sum(), lo[ax] + b * width,
                                   np.float32)
                    p_hi = p_lo + width
                    cl, ch = _clip_tri_slab(tv0[span], tv1[span],
                                            tv2[span], ax, p_lo, p_hi)
                    # Clipped piece cannot exceed the reference bounds.
                    cl = np.maximum(cl, rlo[span])
                    ch = np.minimum(ch, rhi[span])
                    ok = (cl <= ch).all(axis=-1)
                    if ok.any():
                        blo[b] = np.minimum(blo[b], cl[ok].min(axis=0))
                        bhi[b] = np.maximum(bhi[b], ch[ok].max(axis=0))
                entry = np.bincount(b0, minlength=n_bins)
                exit_ = np.bincount(b1, minlength=n_bins)
                for split in range(1, n_bins):
                    nl = entry[:split].sum()
                    nr = exit_[split:].sum()
                    if nl == 0 or nr == 0:
                        continue
                    llo = blo[:split].min(axis=0)
                    lhi = bhi[:split].max(axis=0)
                    rlo2 = blo[split:].min(axis=0)
                    rhi2 = bhi[split:].max(axis=0)
                    cost = (half_area(llo, lhi) * nl
                            + half_area(rlo2, rhi2) * nr)
                    if best_sp is None or cost < best_sp[0]:
                        best_sp = (cost, ax, lo[ax] + split * width)

        parent_area = half_area(lo, hi)
        leaf_cost = c_isect * m
        obj_cost = (c_trav + c_isect * best_obj[0] / parent_area
                    if best_obj is not None and parent_area > 0 else np.inf)
        sp_cost = (c_trav + c_isect * best_sp[0] / parent_area
                   if best_sp is not None and parent_area > 0 else np.inf)
        if m <= leaf_size and leaf_cost <= min(obj_cost, sp_cost):
            t_refs[idx] = list(refs)
            return idx

        left_refs = right_refs = None
        if sp_cost < obj_cost and best_sp is not None:
            _, ax, plane = best_sp
            rl, rr = [], []
            prims = np.array([ref_prim[i] for i in refs])
            fully_l = rhi[:, ax] <= plane
            fully_r = rlo[:, ax] >= plane
            straddle = ~fully_l & ~fully_r
            rl = [int(r) for r in refs[fully_l]]
            rr = [int(r) for r in refs[fully_r]]
            sidx = np.nonzero(straddle)[0]
            if sidx.size and len(ref_prim) + sidx.size <= max_refs:
                sp_prims = prims[sidx]
                neg_inf = np.full(sidx.size, -np.inf, np.float32)
                pos_inf = np.full(sidx.size, np.inf, np.float32)
                pl = np.full(sidx.size, plane, np.float32)
                cl_lo, cl_hi = _clip_tri_slab(v0[sp_prims], v1[sp_prims],
                                              v2[sp_prims], ax,
                                              neg_inf, pl)
                cr_lo, cr_hi = _clip_tri_slab(v0[sp_prims], v1[sp_prims],
                                              v2[sp_prims], ax,
                                              pl, pos_inf)
                for j, si in enumerate(sidx):
                    old = refs[si]

                    def side(clip_lo, clip_hi, is_left):
                        # Conservative base: ref box cut at the plane
                        # (always non-empty for a straddling box);
                        # tighten by the clipped-triangle bounds when
                        # the clip is non-empty (a padded thin box can
                        # straddle while the triangle itself doesn't).
                        base_lo = rlo[si].copy()
                        base_hi = rhi[si].copy()
                        if is_left:
                            base_hi[ax] = plane
                        else:
                            base_lo[ax] = plane
                        s_lo = np.maximum(clip_lo, base_lo)
                        s_hi = np.minimum(clip_hi, base_hi)
                        if not np.all(s_lo <= s_hi):
                            s_lo, s_hi = base_lo, base_hi
                        return _pad_thin(s_lo.astype(np.float32),
                                         s_hi.astype(np.float32))

                    l_lo, l_hi = side(cl_lo[j], cl_hi[j], True)
                    r_lo, r_hi = side(cr_lo[j], cr_hi[j], False)
                    # Left side reuses the ref slot; right side is new.
                    ref_lo[old] = l_lo.astype(np.float32)
                    ref_hi[old] = l_hi.astype(np.float32)
                    rl.append(int(old))
                    ref_prim.append(int(ref_prim[old]))
                    ref_lo.append(r_lo.astype(np.float32))
                    ref_hi.append(r_hi.astype(np.float32))
                    rr.append(len(ref_prim) - 1)
            else:
                # Budget exhausted: send straddlers to the smaller side.
                for si in sidx:
                    c = (rlo[si, ax] + rhi[si, ax]) * 0.5
                    (rl if c < plane else rr).append(int(refs[si]))
            if len(rl) == 0 or len(rr) == 0:
                left_refs = right_refs = None
            else:
                t_axis[idx] = ax
                left_refs = np.array(rl, dtype=np.int64)
                right_refs = np.array(rr, dtype=np.int64)

        if left_refs is None:
            if best_obj is None:
                half = m // 2
                left_refs, right_refs = refs[:half], refs[half:]
            else:
                _, ax, bins, split, *_ = best_obj
                t_axis[idx] = ax
                lmask = bins < split
                left_refs, right_refs = refs[lmask], refs[~lmask]

        t_left[idx] = rec(left_refs)
        t_right[idx] = rec(right_refs)
        return idx

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))
    try:
        rec(np.arange(n, dtype=np.int64))
    finally:
        sys.setrecursionlimit(old_limit)

    # Emit the final reference order (leaf refs contiguous), then the
    # same preorder flatten with miss links as the SAH build.
    order: list[int] = []
    t_start = [0] * len(t_lo)
    t_count = [0] * len(t_lo)
    for tid, refs in enumerate(t_refs):
        if refs is not None:
            t_start[tid] = len(order)
            t_count[tid] = len(refs)
            order.extend(ref_prim[i] for i in refs)

    return _flatten_preorder(t_lo, t_hi, t_left, t_right, t_axis,
                             t_start, t_count, order)


def _subtree_size(tid: int, t_left, t_right) -> int:
    size = 0
    stack = [tid]
    while stack:
        t = stack.pop()
        size += 1
        if t_left[t] >= 0:
            stack.append(t_left[t])
            stack.append(t_right[t])
    return size


def thread_octant(bvh: LinearBVH, octant: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-octant threading: (next_hit, next_miss) int32[M].

    For ray-direction octant ``octant`` (bit k set = d_k < 0), the DFS
    order at every internal node descends into the geometrically
    *near* child first: children are median-split along the node's
    axis with the left child on the low-coordinate side (bvh.cpp
    sorts ascending), so near = left iff the ray points positive on
    that axis.  Near-first order makes the t_max pruning in the
    traversal (renderer.cu:402 semantics) actually cut work -- the
    reference's fixed left-first push order never did.

    Closest-hit results are order-independent (strict < on t), so
    this is a pure performance transform.
    """
    m = bvh.num_nodes
    next_hit = np.full(m, m, np.int32)
    next_miss = np.full(m, m, np.int32)
    if m == 0:
        return next_hit, next_miss
    stack = [(0, m)]
    while stack:
        n, cont = stack.pop()
        next_miss[n] = cont
        if bvh.leaf_prim[n] >= 0:
            next_hit[n] = cont
            continue
        neg = (octant >> int(bvh.axis[n])) & 1
        near, far = ((int(bvh.right[n]), int(bvh.left[n])) if neg
                     else (int(bvh.left[n]), int(bvh.right[n])))
        next_hit[n] = near
        stack.append((far, cont))
        stack.append((near, far))
    return next_hit, next_miss


NUM_OCTANTS = 8


def leaf_slot_rows(v0, v1, v2, leaf_fmt: str = "mt"):
    """Per-triangle leaf slot payload for the fused tables: (v0, e1,
    e2) for "mt" (stride 9; edges precomputed at pack time,
    bit-identical to in-step subtraction) or the Baldwin-Weber
    (n, v0, bu, bv) transform for "bw" (stride 12,
    ops/intersect.baldwin_rows -- ~30% fewer VPU ops per slot in the
    step program).  Both formats self-mask on all-zero pad slots."""
    from tryraytrace_tpu.ops.intersect import baldwin_rows

    if leaf_fmt == "bw":
        return baldwin_rows(v0, v1, v2)
    if leaf_fmt != "mt":
        raise ValueError(f"unknown leaf_fmt {leaf_fmt!r}")
    return np.concatenate([v0, v1 - v0, v2 - v0], axis=-1)


# Per-slot leaf storage strides: "mt" rows are (v0, e1, e2), "bw" rows
# the Baldwin-Weber (n, v0, bu, bv) transform.  SINGLE SOURCE for both
# pack widths (here) and decode offsets (ops/intersect.py re-imports
# this dict) -- adding a format in one place only cannot desync them.
LEAF_STRIDE = {"mt": 9, "bw": 12}


def traversal_row_width(leaf_size: int, leaf_fmt: str = "mt") -> int:
    """bounds(6) + K inline triangle slots (stride*K) + prim_start +
    prim_count + next_hit[8] + next_miss[8] = stride*K + 24 floats."""
    return LEAF_STRIDE[leaf_fmt] * leaf_size + 24


def pack_traversal_table(bvh: LinearBVH, v0: np.ndarray, v1: np.ndarray,
                         v2: np.ndarray,
                         leaf_size: int | None = None,
                         leaf_fmt: str = "mt") -> np.ndarray:
    """Fused traversal rows: float32[M, 9K + 24].

    One HBM row fetch per node visit feeds everything a traversal
    step needs: the AABB test (cols 0:6), up to K inline leaf
    triangles for Moller-Trumbore (cols 6:6+9K -- leaf primitives are
    contiguous after the build's reorder, so ids are prim_start + j),
    and the per-octant threaded continuations (last 16 cols, absolute
    node ids with sentinel M = done).  Measured on TPU v5e, a gather's
    cost is ~4 ns/lane *independent of row width* (4..112 floats) as
    long as the table stays small (<~3 MB), so wide fat-leaf rows are
    effectively free and the only thing that matters is the number of
    node visits -- which fat leaves reduce.
    """
    m = bvh.num_nodes
    k = int(leaf_size if leaf_size is not None
            else max(1, bvh.leaf_count.max() if m else 1))
    st = LEAF_STRIDE[leaf_fmt]
    w = traversal_row_width(k, leaf_fmt)
    if m == 0:
        return np.zeros((0, w), np.float32)
    if m and bvh.leaf_count.max() > k:
        raise ValueError(f"leaf_size {k} < max leaf count {bvh.leaf_count.max()}")
    table = np.zeros((m, w), np.float32)
    table[:, 0:6] = bvh.bounds

    tri_cat = leaf_slot_rows(v0, v1, v2, leaf_fmt)  # [T, stride]
    leaf_nodes = np.nonzero(bvh.leaf_count > 0)[0]
    for node in leaf_nodes:
        start = int(bvh.leaf_prim[node])
        cnt = int(bvh.leaf_count[node])
        table[node, 6:6 + st * cnt] = tri_cat[start:start + cnt].reshape(-1)
    col = 6 + st * k
    table[:, col] = bvh.leaf_prim.astype(np.float32)       # prim_start (-1 internal)
    table[:, col + 1] = bvh.leaf_count.astype(np.float32)  # prim_count
    for o in range(NUM_OCTANTS):
        nh, nm = thread_octant(bvh, o)
        table[:, col + 2 + o] = nh.astype(np.float32)
        table[:, col + 10 + o] = nm.astype(np.float32)
    return table


# --- Fat-node traversal table (traversal v3) -------------------------
#
# The threaded table fetches every *tested* node; the fat-node layout
# instead stores BOTH children's boxes in the parent row, so the
# traversal only ever fetches nodes already known to be hit, descends
# front-to-back by actual entry distance (better t_max pruning than
# any static order), and keeps pending far children in a per-lane
# register short-stack (free elementwise shifts; no per-lane memory
# indexing).  ~0.5x the row fetches of the threaded walk.
#
# Row layout float32[M, 2 + max(12 + 2, 9K)]:
#   col 0: prim_start (-1 for internal nodes)
#   col 1: prim_count
#   internal: cols 2:8 boxL, 8:14 boxR, 14: childL id, 15: childR id
#   leaf:     cols 2:2+9K inline triangles
FATNODE_STACK_DEPTH = 32  # mirrors the reference's stack (renderer.cu:387)


def fatnode_row_width(leaf_size: int, leaf_fmt: str = "mt") -> int:
    return 2 + max(14, LEAF_STRIDE[leaf_fmt] * leaf_size)


def pack_fatnode_table(bvh: LinearBVH, v0: np.ndarray, v1: np.ndarray,
                       v2: np.ndarray,
                       leaf_size: int | None = None,
                       leaf_fmt: str = "mt") -> np.ndarray:
    m = bvh.num_nodes
    k = int(leaf_size if leaf_size is not None
            else max(1, bvh.leaf_count.max() if m else 1))
    st = LEAF_STRIDE[leaf_fmt]
    w = fatnode_row_width(k, leaf_fmt)
    if m == 0:
        return np.zeros((0, w), np.float32)
    if bvh.max_depth() > FATNODE_STACK_DEPTH:
        raise ValueError(f"tree depth {bvh.max_depth()} exceeds the "
                         f"{FATNODE_STACK_DEPTH}-deep traversal stack")
    table = np.zeros((m, w), np.float32)
    table[:, 0] = bvh.leaf_prim.astype(np.float32)
    table[:, 1] = bvh.leaf_count.astype(np.float32)

    internal = np.nonzero(bvh.leaf_count == 0)[0]
    table[internal, 2:8] = bvh.bounds[bvh.left[internal]]
    table[internal, 8:14] = bvh.bounds[bvh.right[internal]]
    table[internal, 14] = bvh.left[internal].astype(np.float32)
    table[internal, 15] = bvh.right[internal].astype(np.float32)

    tri_cat = leaf_slot_rows(v0, v1, v2, leaf_fmt)
    for node in np.nonzero(bvh.leaf_count > 0)[0]:
        start = int(bvh.leaf_prim[node])
        cnt = int(bvh.leaf_count[node])
        table[node, 2:2 + st * cnt] = tri_cat[start:start + cnt].reshape(-1)
    return table


# --- Pair-row traversal table (traversal v4, "pair") -----------------
#
# Stackless pair walk: an internal row holds BOTH children's boxes, so
# each fetched row tests two boxes and branches 3 ways (near-hit ->
# near row; far-hit only -> far row; both miss -> the threaded
# continuation).  Unlike the fat-node layout there is NO per-lane
# stack: the continuation of a near subtree threads straight into the
# far child's row without knowing far's box result -- entering a
# missed far node is absorbed by containment (an internal far's
# children both miss; a leaf far's contained triangles all miss inside
# the window), wasting at most one row per threaded far-entry.  A
# one-slot per-lane "skip register" (entry(far) -> cont(X), pushed on
# near-hit/far-miss, LIFO-consumed) removes most of those wasted
# entries exactly (scripts/sim_pair_walk.py: 21-28% fewer gathers
# than the threaded walk on the bench scenes; deeper registers add
# <1%).  Replaces the reference's stack walk (renderer.cu:387-424)
# like the threaded layout, but at ~0.8x the row fetches.
#
# Row layout float32[M, 10 + max(15, 9K)]:
#   col 0: prim_start (-1 for internal)
#   col 1: prim_count
#   cols 2:10: per-octant continuation after this node's subtree
#              (== thread_octant next_miss; sentinel M = done)
#   internal: cols 10:16 boxL, 16:22 boxR, 22 childL, 23 childR,
#             24 split axis (near = childL iff ray non-negative on it)
#   leaf:     cols 10:10+9K inline triangles (no own-box test: leaf
#             tris are inside the parent-tested leaf box, and the MT
#             window gates exactly)

PAIR_COL_CONT = 2    # 8 per-octant continuation links
PAIR_COL_BODY = 10   # boxes+children (internal) / triangles (leaf)


def pair_row_width(leaf_size: int, leaf_fmt: str = "mt") -> int:
    return PAIR_COL_BODY + max(15, LEAF_STRIDE[leaf_fmt] * leaf_size)


def pack_pair_table(bvh: LinearBVH, v0: np.ndarray, v1: np.ndarray,
                    v2: np.ndarray,
                    leaf_size: int | None = None,
                    leaf_fmt: str = "mt") -> np.ndarray:
    m = bvh.num_nodes
    k = int(leaf_size if leaf_size is not None
            else max(1, bvh.leaf_count.max() if m else 1))
    st = LEAF_STRIDE[leaf_fmt]
    w = pair_row_width(k, leaf_fmt)
    if m == 0:
        return np.zeros((0, w), np.float32)
    if bvh.leaf_count.max() > k:
        raise ValueError(f"leaf_size {k} < max leaf count {bvh.leaf_count.max()}")
    table = np.zeros((m, w), np.float32)
    table[:, 0] = bvh.leaf_prim.astype(np.float32)
    table[:, 1] = bvh.leaf_count.astype(np.float32)
    for o in range(NUM_OCTANTS):
        _, nm = thread_octant(bvh, o)
        table[:, PAIR_COL_CONT + o] = nm.astype(np.float32)

    internal = np.nonzero(bvh.leaf_count == 0)[0]
    table[internal, PAIR_COL_BODY:PAIR_COL_BODY + 6] = (
        bvh.bounds[bvh.left[internal]])
    table[internal, PAIR_COL_BODY + 6:PAIR_COL_BODY + 12] = (
        bvh.bounds[bvh.right[internal]])
    table[internal, PAIR_COL_BODY + 12] = bvh.left[internal].astype(np.float32)
    table[internal, PAIR_COL_BODY + 13] = bvh.right[internal].astype(np.float32)
    table[internal, PAIR_COL_BODY + 14] = bvh.axis[internal].astype(np.float32)

    tri_cat = leaf_slot_rows(v0, v1, v2, leaf_fmt)
    for node in np.nonzero(bvh.leaf_count > 0)[0]:
        start = int(bvh.leaf_prim[node])
        cnt = int(bvh.leaf_count[node])
        table[node, PAIR_COL_BODY:PAIR_COL_BODY + st * cnt] = (
            tri_cat[start:start + cnt].reshape(-1))
    return table


# --- Quad-row traversal table (traversal v5, "quad") ------------------
#
# The pair walk generalized to 4-wide collapsed rows: the binary tree
# is collapsed into a 4-ary one (each collapsed node's children are
# original binary nodes -- greedy largest-surface-area expansion), and
# an internal row holds all (up to) four children's boxes.  A fetched
# row tests four boxes and jumps to the FIRST hit child in per-octant
# approximate front-to-back order (children sorted by centroid
# projected on the octant direction); subtree continuations thread to
# the next ordered sibling's entry unconditionally -- entering a
# missed sibling is absorbed by containment exactly like the pair
# walk's far child.  A 3-slot per-lane skip-register file (entry ->
# thread successor, pushed for each known-missed later sibling at
# descend time, LIFO) removes most of that waste.  Decision sim
# (scripts/sim_pair_walk.py multi_walk): 0.52-0.64x the threaded
# walk's gathers on the bench scenes -- 19-29% below the landed pair
# walk -- at the same ~4 ns/lane row-fetch cost (3 extra slab tests
# and the register selects ride the gather).  Rows are compacted
# (absorbed binary internals drop out), so the table SHRINKS vs pair:
# ~half the internal rows.  Replaces the reference's int stack[32]
# walk (renderer.cu:387-424) like the threaded/pair layouts.
#
# Row layout float32[R, 10 + max(37, 9K)]:
#   col 0: prim_start (-1 for internal)
#   col 1: prim_count
#   cols 2:10: per-octant cont*256 + position->slot permutation
#             (2 bits/position; 0 for leaf rows) -- packed so the
#             walk's octant mux reads ONE column per octant.  Exact
#             in f32 while R <= 32767 (cont*256+255 < 2^23).
#   internal body (cols 10:39):
#     +0:24   4 child boxes, canonical (build) slot order; pad slots
#             hold inverted boxes (lo=+inf, hi=-inf: never hit)
#     +24:28  4 child entry row ids (pad: sentinel R)
#     +28     nslots (2..4)
#   leaf:     cols 10:10+9K inline triangles (as the pair table)

QUAD_WIDTH = 4
QUAD_COL_CONT = 2
QUAD_COL_BODY = 10
QB_BOX = 0        # body-relative offsets
QB_ENT = 24
QB_NSLOTS = 28
QUAD_BODY_INT = 29


def quad_row_width(leaf_size: int, leaf_fmt: str = "mt") -> int:
    return QUAD_COL_BODY + max(QUAD_BODY_INT,
                               LEAF_STRIDE[leaf_fmt] * leaf_size)


def collapse_bvh(bvh: LinearBVH, width: int = QUAD_WIDTH,
                 criterion: str = "count") -> dict:
    """Collapse the binary BVH into a ``width``-ary tree.

    Returns {binary root id: [child binary ids]} for every collapsed
    node; children are original binary node ids (internal children
    become collapsed roots themselves, leaf children stay leaves).

    ``criterion`` picks which internal child each greedy expansion
    step splits into the row's remaining slots:

    * ``"count"`` -- subtree primitive count (the heavy subtree is
      the one worth splitting finer).  Topology-only: re-collapsing
      after a bounds refit reproduces the identical mapping.
    * ``"sa"`` -- child surface area.  A ray that fetched X's row
      enters child c with probability ~SA(c)/SA(X) (the SAH measure),
      and expanding c saves exactly that expected row fetch, so
      greedy-by-SA maximizes expected fetches removed per slot spent.
    * ``"dp"`` -- exact minimizer of the same objective sa
      approximates: E[internal row fetches] = sum over collapsed
      roots r of SA(r) under the SAH visit measure (leaf rows are
      fetched whenever entered regardless of the grouping, so they
      drop out of the objective).  Bottom-up DP over the binary tree:
      cost(x) = SA(x) + min over binary cuts of x's subtree with
      <= ``width`` frontier members of the internal members' costs
      (a handful of cut shapes at width 4).

    "sa"/"dp" depend on bounds, so re-collapsing after a refit could
    change the mapping; refit stability comes from upload_scene
    stashing the build-time mapping on LinearBVH.quad_children and the
    refit path repacking with it (same table shape, new bounds).
    """
    is_leaf = bvh.leaf_prim >= 0
    m = bvh.num_nodes
    if criterion == "dp":
        d = np.maximum(bvh.bounds[:, 3:] - bvh.bounds[:, :3], 0.0)
        sa = (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2]
              + d[:, 2] * d[:, 0]).astype(np.float64)
        cost = np.zeros(m, np.float64)
        best_cut: dict[int, list[int]] = {}

        def cuts(x):
            """All binary cuts of x's children frontier, width-capped."""
            out = []
            seen = set()
            stack = [(int(bvh.left[x]), int(bvh.right[x]))]
            while stack:
                cut = stack.pop()
                if cut in seen:
                    continue
                seen.add(cut)
                out.append(list(cut))
                if len(cut) >= width:
                    continue
                for i, c in enumerate(cut):
                    if not is_leaf[c]:
                        nxt = (cut[:i]
                               + (int(bvh.left[c]), int(bvh.right[c]))
                               + cut[i + 1:])
                        stack.append(tuple(nxt))
            return out

        for x in range(m - 1, -1, -1):
            if is_leaf[x]:
                continue
            best = None
            for cut in cuts(x):
                c_cost = sum(cost[c] for c in cut if not is_leaf[c])
                if best is None or c_cost < best[0]:
                    best = (c_cost, cut)
            cost[x] = sa[x] + best[0]
            best_cut[x] = best[1]
        children: dict[int, list[int]] = {}
        todo = [0]
        while todo:
            x = todo.pop()
            if is_leaf[x] or x in children:
                continue
            children[x] = best_cut[x]
            todo.extend(c for c in best_cut[x] if not is_leaf[c])
        return children
    if criterion == "count":
        # Subtree primitive counts, children-before-parents (the linear
        # layout stores children after their parent, so a reverse sweep
        # has both child counts ready).
        key = np.where(is_leaf, bvh.leaf_count, 0).astype(np.int64)
        for x in range(m - 1, -1, -1):
            if not is_leaf[x]:
                key[x] = key[bvh.left[x]] + key[bvh.right[x]]
    elif criterion == "sa":
        d = np.maximum(bvh.bounds[:, 3:] - bvh.bounds[:, :3], 0.0)
        key = (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2]
               + d[:, 2] * d[:, 0]).astype(np.float64)
    else:
        raise ValueError(f"unknown collapse criterion {criterion!r}")
    children: dict[int, list[int]] = {}
    todo = [0]
    while todo:
        x = todo.pop()
        if is_leaf[x] or x in children:
            continue
        out = [int(bvh.left[x]), int(bvh.right[x])]
        while len(out) < width:
            cands = [i for i, c in enumerate(out) if not is_leaf[c]]
            if not cands:
                break
            i = max(cands, key=lambda i: (key[out[i]], -out[i]))
            c = out.pop(i)
            out[i:i] = [int(bvh.left[c]), int(bvh.right[c])]
        children[x] = out
        todo.extend(c for c in out if not is_leaf[c])
    return children


def pack_quad_table(bvh: LinearBVH, v0: np.ndarray, v1: np.ndarray,
                    v2: np.ndarray,
                    leaf_size: int | None = None,
                    leaf_fmt: str = "mt",
                    collapse: str = "count",
                    perm_kind: str = "pos2slot",
                    children: dict | None = None) -> np.ndarray:
    """``children`` (optional) reuses a precomputed collapse mapping
    (LinearBVH.quad_children) instead of re-collapsing -- the refit
    path passes the build-time mapping so bounds-dependent criteria
    keep the table shape.  ``perm_kind`` selects the packed
    permutation byte's direction:

    * ``"pos2slot"`` (default) -- 2 bits per POSITION give the child
      SLOT at that front-to-back position (ops/traverse._quad_decode's
      mux network reads it).
    * ``"slot2pos"`` -- 2 bits per SLOT give that child's front-to-back
      POSITION (its rank).  The rank decode (_quad_decode_rank,
      quad_regs=0 only) argmins hit children by rank instead of muxing
      them into position order -- same first-entered child, fewer
      selects.  Pad slots bake rank 3; they are masked by nslots.
    """
    if perm_kind not in ("pos2slot", "slot2pos"):
        raise ValueError(f"unknown perm_kind {perm_kind!r}")
    m = bvh.num_nodes
    k = int(leaf_size if leaf_size is not None
            else max(1, bvh.leaf_count.max() if m else 1))
    st = LEAF_STRIDE[leaf_fmt]
    w = quad_row_width(k, leaf_fmt)
    if m == 0:
        return np.zeros((0, w), np.float32)
    if bvh.leaf_count.max() > k:
        raise ValueError(
            f"leaf_size {k} < max leaf count {bvh.leaf_count.max()}")
    is_leaf = bvh.leaf_prim >= 0
    if children is None:
        children = collapse_bvh(bvh, criterion=collapse)
    # Compact row ids: collapsed roots + binary leaves, in binary-id
    # order (the binary root is node 0, so its row is 0).  Absorbed
    # binary internals have no row.
    used = sorted(set(children.keys())
                  | set(np.nonzero(is_leaf)[0].tolist()))
    rowid = {b: r for r, b in enumerate(used)}
    nrows = len(used)
    if nrows > 32767:
        raise ValueError(
            f"quad table has {nrows} rows; the packed cont*256+perm "
            "column is exact in float32 only up to 32767 rows")
    assert used[0] == 0 or is_leaf[0]
    table = np.zeros((nrows, w), np.float32)
    table[:, 0] = bvh.leaf_prim[used].astype(np.float32)
    table[:, 1] = bvh.leaf_count[used].astype(np.float32)

    # Canonical slots + boxes + entries (octant-independent).
    b0 = QUAD_COL_BODY
    for x, kids in children.items():
        r = rowid[x]
        ns = len(kids)
        for i in range(QUAD_WIDTH):
            if i < ns:
                table[r, b0 + QB_BOX + 6 * i:b0 + QB_BOX + 6 * i + 6] = (
                    bvh.bounds[kids[i]])
                table[r, b0 + QB_ENT + i] = rowid[kids[i]]
            else:
                table[r, b0 + QB_BOX + 6 * i:b0 + QB_BOX + 6 * i + 3] = 1e30
                table[r, b0 + QB_BOX + 6 * i + 3:
                      b0 + QB_BOX + 6 * i + 6] = -1e30
                table[r, b0 + QB_ENT + i] = nrows
        table[r, b0 + QB_NSLOTS] = ns

    # Per-octant ordering (approximate front-to-back: centroid dot the
    # octant direction) -> the position permutation, and the threaded
    # continuations over the collapsed tree.
    cent = 0.5 * (bvh.bounds[:, :3] + bvh.bounds[:, 3:])
    for ob in range(NUM_OCTANTS):
        sign = np.array([1 - 2 * ((ob >> a) & 1) for a in range(3)],
                        np.float32)
        stack = [(0, nrows)]
        while stack:
            x, cont = stack.pop()
            if x not in children:
                table[rowid[x], QUAD_COL_CONT + ob] = cont * 256
                continue
            kids = children[x]
            key = (cent[kids] * sign).sum(-1)
            order = np.argsort(key, kind="stable")
            perm = 0
            if perm_kind == "pos2slot":
                for pos in range(QUAD_WIDTH):
                    slot = int(order[pos]) if pos < len(order) else 3
                    perm |= slot << (2 * pos)
            else:  # slot2pos: each child slot's front-to-back rank
                ranks = [3] * QUAD_WIDTH
                for pos, oi in enumerate(order):
                    ranks[int(oi)] = pos
                for slot in range(QUAD_WIDTH):
                    perm |= ranks[slot] << (2 * slot)
            table[rowid[x], QUAD_COL_CONT + ob] = cont * 256 + perm
            for pos, oi in enumerate(order):
                c = kids[oi]
                nxt = (rowid[kids[order[pos + 1]]]
                       if pos + 1 < len(order) else cont)
                stack.append((int(c), int(nxt)))

    tri_cat = leaf_slot_rows(v0, v1, v2, leaf_fmt)
    for x in np.nonzero(bvh.leaf_count > 0)[0]:
        start = int(bvh.leaf_prim[x])
        cnt = int(bvh.leaf_count[x])
        table[rowid[x], QUAD_COL_BODY:QUAD_COL_BODY + st * cnt] = (
            tri_cat[start:start + cnt].reshape(-1))
    return table


def pack_quad_oct_table(bvh: LinearBVH, v0: np.ndarray, v1: np.ndarray,
                        v2: np.ndarray,
                        leaf_size: int | None = None,
                        leaf_fmt: str = "mt",
                        collapse: str = "count",
                        children: dict | None = None
                        ) -> tuple[np.ndarray, int]:
    """Octant-baked quad table: same walk as pack_quad_table, but each
    collapsed INTERNAL node gets eight rows -- one per ray octant --
    with its child boxes and entry links already sorted front-to-back
    for that octant and its continuation resolved.  The decode then
    needs no permutation mux at all (the round-3 cost decomposition
    put the quad decode's select network at 1.81 ns/lane-step, the
    largest exposed non-gather bucket); leaf rows stay shared (their
    wide triangle bodies dominate the bytes) and keep per-octant
    continuation columns behind the same single 8-way mux internal
    rows reuse.

    Layout ([8*Ri + Rl, W] float32, returns (table, Ri)):
      rows [o*Ri, (o+1)*Ri): internal replicas for octant o (root at
        o*Ri -- the walk maps a fresh ``cur == 0`` to its lane's
        octant root); rows [8*Ri, 8*Ri+Rl): shared leaf rows.
      col 0: prim_start (-1 for internal), col 1: prim_count
      cols 2:10: per-octant continuation row id (plain f32; internal
        replicas store their own octant's cont in all 8 so the mux is
        uniform)
      internal body (cols 10:39): 4 child boxes in octant order;
        4 child entry row ids in octant order; nslots
      leaf body: cols 10:10+st*K inline triangles
    """
    m = bvh.num_nodes
    k = int(leaf_size if leaf_size is not None
            else max(1, bvh.leaf_count.max() if m else 1))
    st = LEAF_STRIDE[leaf_fmt]
    w = quad_row_width(k, leaf_fmt)
    if m == 0:
        return np.zeros((0, w), np.float32), 0
    if bvh.leaf_count.max() > k:
        raise ValueError(
            f"leaf_size {k} < max leaf count {bvh.leaf_count.max()}")
    is_leaf = bvh.leaf_prim >= 0
    if children is None:
        children = collapse_bvh(bvh, criterion=collapse)
    internals = sorted(children.keys())
    leaves = np.nonzero(is_leaf)[0].tolist()
    ri = len(internals)
    rl = len(leaves)
    nrows = 8 * ri + rl
    iidx = {b: i for i, b in enumerate(internals)}
    lidx = {b: 8 * ri + i for i, b in enumerate(leaves)}

    def row_of(b: int, octant: int) -> int:
        return (octant * ri + iidx[b]) if b in iidx else lidx[b]

    table = np.zeros((nrows, w), np.float32)
    # Leaf headers + triangle bodies (shared rows).
    tri_cat = leaf_slot_rows(v0, v1, v2, leaf_fmt)
    for x in leaves:
        r = lidx[x]
        table[r, 0] = float(bvh.leaf_prim[x])
        table[r, 1] = float(bvh.leaf_count[x])
        cnt = int(bvh.leaf_count[x])
        if cnt:
            start = int(bvh.leaf_prim[x])
            table[r, QUAD_COL_BODY:QUAD_COL_BODY + st * cnt] = (
                tri_cat[start:start + cnt].reshape(-1))
    table[:8 * ri, 0] = -1.0

    b0 = QUAD_COL_BODY
    cent = 0.5 * (bvh.bounds[:, :3] + bvh.bounds[:, 3:])
    for ob in range(NUM_OCTANTS):
        sign = np.array([1 - 2 * ((ob >> a) & 1) for a in range(3)],
                        np.float32)
        stack = [(0, nrows)]
        while stack:
            x, cont = stack.pop()
            if x not in children:
                table[lidx[x], QUAD_COL_CONT + ob] = cont
                continue
            r = ob * ri + iidx[x]
            table[r, QUAD_COL_CONT:QUAD_COL_CONT + 8] = cont
            kids = children[x]
            key = (cent[kids] * sign).sum(-1)
            order = np.argsort(key, kind="stable")
            ns = len(kids)
            table[r, b0 + QB_NSLOTS] = ns
            for pos in range(QUAD_WIDTH):
                if pos < ns:
                    c = kids[int(order[pos])]
                    table[r, b0 + QB_BOX + 6 * pos:
                          b0 + QB_BOX + 6 * pos + 6] = bvh.bounds[c]
                    table[r, b0 + QB_ENT + pos] = row_of(c, ob)
                    nxt = (row_of(kids[int(order[pos + 1])], ob)
                           if pos + 1 < ns else cont)
                    stack.append((int(c), int(nxt)))
                else:
                    # Pad slot.  The inverted box ALWAYS hits under
                    # the swapping slab test (aabb_hit takes min/max
                    # per axis, so lo=+1e30/hi=-1e30 spans the whole
                    # line) -- that is fine because its entry is the
                    # row's own continuation: a spurious pad "hit"
                    # selects exactly the fall-through target, and
                    # register pushes mask pads by nslots.  This keeps
                    # the decode free of an explicit nslots hit mask
                    # (the whole point of the octant layout).
                    table[r, b0 + QB_BOX + 6 * pos:
                          b0 + QB_BOX + 6 * pos + 3] = 1e30
                    table[r, b0 + QB_BOX + 6 * pos + 3:
                          b0 + QB_BOX + 6 * pos + 6] = -1e30
                    table[r, b0 + QB_ENT + pos] = cont
    return table, ri


# Packed hit-data row layout (float32[37]): everything shading needs
# about the hit primitive in one gather (rows are free to >= 112
# floats on v5e, docs/PERFORMANCE.md).
TRIMAT_WIDTH = 37
TM_TRI = slice(0, 9)          # v0 v1 v2
TM_ALBEDO = slice(9, 12)
TM_EMISSION = slice(12, 15)
TM_METALLIC = 15
TM_ROUGHNESS = 16
TM_IOR = 17
TM_TRANSMISSION = 18
TM_TEX_ID = 19
TM_AREA = 20                  # precomputed triangle area (NEE pdf)
TM_NRM = slice(21, 30)        # per-corner vertex normals (n0 n1 n2;
                              # all-zero = none -> geometric normal)
TM_UV = slice(30, 36)         # per-corner UVs (uv0 uv1 uv2)
TM_UV_FLAG = 36               # 1.0 = UVs valid (else planar mapping)


def pack_trimat_table(arrays) -> np.ndarray:
    """Fused triangle+material rows float32[T, 30] (BVH prim order)."""
    t = arrays.tri_v0.shape[0]
    out = np.zeros((t, TRIMAT_WIDTH), np.float32)
    out[:, TM_TRI] = np.concatenate(
        [arrays.tri_v0, arrays.tri_v1, arrays.tri_v2], axis=-1)
    out[:, TM_ALBEDO] = arrays.albedo
    out[:, TM_EMISSION] = arrays.emission
    out[:, TM_METALLIC] = arrays.metallic
    out[:, TM_ROUGHNESS] = arrays.roughness
    out[:, TM_IOR] = arrays.ior
    out[:, TM_TRANSMISSION] = arrays.transmission
    out[:, TM_TEX_ID] = arrays.tex_id.astype(np.float32)
    e1 = arrays.tri_v1 - arrays.tri_v0
    e2 = arrays.tri_v2 - arrays.tri_v0
    cr = np.cross(e1, e2)
    out[:, TM_AREA] = 0.5 * np.sqrt((cr * cr).sum(-1))
    if getattr(arrays, "nrm0", None) is not None:
        out[:, TM_NRM] = np.concatenate(
            [arrays.nrm0, arrays.nrm1, arrays.nrm2], axis=-1)
    if getattr(arrays, "uv0", None) is not None:
        out[:, TM_UV] = np.concatenate(
            [arrays.uv0, arrays.uv1, arrays.uv2], axis=-1)
        out[:, TM_UV_FLAG] = arrays.uv_mask
    return out


def refit_bvh(bvh: LinearBVH, v0: np.ndarray, v1: np.ndarray,
              v2: np.ndarray) -> LinearBVH:
    """Recompute node bounds for deformed geometry, reusing the tree.

    Beyond-reference: the reference builds its BVH once at startup and
    never rebuilds (bvh.cpp:32-45; SURVEY.md L3 "no refit, no
    rebuild"), so animated geometry is impossible there.  A refit is
    O(N) vs the O(N log^2 N) rebuild and keeps the topology (miss
    links, leaf spans, permutation) identical -- only ``bounds`` and
    the packed tables change, so the engine's compiled program is
    reused as-is (same shapes).

    ``v0/v1/v2`` are the *slot-ordered* triangle vertices (i.e. after
    ``arrays.permuted(bvh.perm)``), deformed but with unchanged
    topology.  Leaf bounds use the same degenerate-axis padding as the
    build (primitive_bounds); internal bounds are child unions,
    computed level-by-level bottom-up (vectorized per depth).  Note an
    SBVH's spatially *clipped* leaf boxes are refit to full triangle
    boxes -- still conservative/correct, just looser than a fresh
    spatial-split build.
    """
    m = bvh.num_nodes
    if m == 0:
        return bvh
    pb = primitive_bounds(v0, v1, v2)
    bounds = np.array(bvh.bounds, dtype=np.float32, copy=True)

    # Leaves: union over each leaf's contiguous primitive span.
    leaves = np.nonzero(bvh.leaf_count > 0)[0]
    if leaves.size:
        start = bvh.leaf_prim[leaves].astype(np.int64)
        count = bvh.leaf_count[leaves].astype(np.int64)
        lo = pb[start, :3].copy()
        hi = pb[start, 3:].copy()
        for k in range(1, int(count.max())):
            has = count > k
            idx = start + np.minimum(k, count - 1)
            lo = np.where(has[:, None], np.minimum(lo, pb[idx, :3]), lo)
            hi = np.where(has[:, None], np.maximum(hi, pb[idx, 3:]), hi)
        bounds[leaves, :3] = lo
        bounds[leaves, 3:] = hi

    # Internal nodes, deepest level first (preorder guarantees children
    # have larger ids, but per-level grouping vectorizes the sweep).
    depth = np.zeros(m, dtype=np.int32)
    internal = bvh.left >= 0
    for i in range(m):
        if internal[i]:
            depth[bvh.left[i]] = depth[i] + 1
            depth[bvh.right[i]] = depth[i] + 1
    for lvl in range(int(depth.max()), -1, -1):
        idx = np.nonzero(internal & (depth == lvl))[0]
        if not idx.size:
            continue
        l, r = bvh.left[idx], bvh.right[idx]
        bounds[idx, :3] = np.minimum(bounds[l, :3], bounds[r, :3])
        bounds[idx, 3:] = np.maximum(bounds[l, 3:], bounds[r, 3:])

    return dataclasses.replace(bvh, bounds=bounds)


def _rebuild_links(bounds, leaf_prim, miss, axis, perm) -> LinearBVH:
    """Derive left/right from a (bounds, leaf_prim, miss, axis) tuple
    produced by the native builder (preorder layout, singleton leaves)."""
    m = bounds.shape[0]
    left = np.full(m, -1, dtype=np.int32)
    right = np.full(m, -1, dtype=np.int32)
    internal = leaf_prim < 0
    idx = np.nonzero(internal)[0]
    left[idx] = idx + 1
    # right child = miss link of the left child's subtree root.
    right[idx] = miss[idx + 1]
    leaf_count = (~internal).astype(np.int32)
    return LinearBVH(bounds.astype(np.float32), leaf_prim.astype(np.int32),
                     leaf_count, miss.astype(np.int32), left, right,
                     axis.astype(np.int32), perm.astype(np.int32))


def estimate_surface_visits(bvh: LinearBVH, v0: np.ndarray, v1: np.ndarray,
                            v2: np.ndarray, n: int = 4096,
                            seed: int = 0) -> float:
    """Mean BVH node visits for a bounce-ray population: origins
    sampled on the scene's surfaces (area-weighted, offset along the
    interior-facing normal), directions uniform over that hemisphere.

    This is the engine's per-segment traversal cost estimator: on the
    bench scenes it matches the persistent engine's measured
    visits/ray within ~10% (teapot 6.3 est vs 6.9 measured,
    flythrough 13.8 vs 13.3), where outside-ray SAH sums and
    interior-point sampling both badly compress the range.  Used by
    the auto shading-cadence pick (engine/device_scene.py); the count
    walks the plain preorder miss links (no octant ordering, no
    closest-hit pruning) which is accurate enough for scheduling.
    """
    m = bvh.num_nodes
    if m == 0 or len(v0) == 0:
        return 0.0
    lo, hi = bvh.bounds[:, :3], bvh.bounds[:, 3:]
    leaf = bvh.leaf_prim >= 0
    rs = np.random.RandomState(seed)

    nrm = np.cross(v1 - v0, v2 - v0)
    area = 0.5 * np.linalg.norm(nrm, axis=1)
    total = area.sum()
    if total <= 0:
        return 0.0
    ti = rs.choice(len(v0), size=n, p=area / total)
    r1, r2 = rs.rand(n, 1), rs.rand(n, 1)
    su = np.sqrt(r1)
    pt = v0[ti] * (1 - su) + v1[ti] * (su * (1 - r2)) + v2[ti] * (su * r2)
    nn = nrm[ti] / np.maximum(np.linalg.norm(nrm[ti], axis=1,
                                             keepdims=True), 1e-20)
    center = (lo[0] + hi[0]) * 0.5
    flip = ((center - pt) * nn).sum(1) < 0
    nn[flip] = -nn[flip]
    d = rs.randn(n, 3)
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-20)
    wrong = (d * nn).sum(1) < 0
    d[wrong] = -d[wrong]
    o = (pt + nn * 1e-3).astype(np.float32)
    d = d.astype(np.float32)
    with np.errstate(divide="ignore"):
        inv = np.where(np.abs(d) > 1e-12, 1.0 / np.where(d == 0.0, 1.0, d),
                       np.float32(1e12))

    cur = np.zeros(n, np.int64)
    visits = np.zeros(n, np.int64)
    alive = np.ones(n, bool)
    # Each step visits one node per live ray; bound the walk at the
    # theoretical maximum (every node once).
    for _ in range(m + 1):
        if not alive.any():
            break
        c = np.where(alive, cur, 0)
        visits += alive
        t1 = (lo[c] - o) * inv
        t2 = (hi[c] - o) * inv
        tn = np.minimum(t1, t2).max(1)
        tf = np.maximum(t1, t2).min(1)
        hit = tf >= np.maximum(tn, 0.0)
        nxt = np.where(hit & ~leaf[c], c + 1, bvh.miss[c])
        cur = np.where(alive, nxt, cur)
        alive = cur < m
    return float(visits.mean())
