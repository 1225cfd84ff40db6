"""Decision sim: DIRECT 4-ary SAH construction vs binary-SAH-then-
collapse (VERDICT r4 #4).

The production quad walk (ops/traverse.py _quad_decode) runs over a
4-ary tree obtained by COLLAPSING a binary SAH build
(accel/bvh.collapse_bvh, criterion "dp" = exact bottom-up cut DP
minimizing the sum of surface areas over collapsed roots).  The
collapse can only choose cuts that exist in the binary topology; a
direct 4-ary builder searches a strictly larger space, optimizing the
walk's true cost unit -- E[row fetches per ray] ~ sum over rows of
SA(row)/SA(root) -- at construction time.

Builder here: top-down W-wide SAH (the classic wide-BVH recipe).  At
each node, start with {S}; repeatedly binned-SAH-split the part whose
split improves the W-ary cost most, until W parts or no split helps:

  cost(S) = C_row + sum_i SA(c_i)/SA(S) * cost(c_i)
  leaf(S) = C_row + c_leaf * |S|      (|S| <= K slots ride the row)

with C_row = 1 (every fetched row costs one gather regardless of
arity) and c_leaf the measured ~free bw leaf slot (0.024 ns vs the
7.68 ns step, docs/PERFORMANCE.md 2b.3b) priced at a small epsilon to
break ties toward fatter leaves.

Output: mean gathers/ray for {classic threaded binary, collapse-dp
W4s3 quad, direct W4s3 quad} over the three ray populations of
scripts/sim_pair_walk.py, plus the mix ratio.  Keep/kill gate
(VERDICT r4): chip A/B only if direct shows >=5% fewer gathers/ray
than the dp collapse.

Usage: python scripts/sim_quad4_build.py [--scene teapot|cow|flythrough]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from scripts.sim_pair_walk import (  # noqa: E402
    MISS_T,
    bounce_rays,
    classic_walk,
    leaf_tris,
    multi_walk,
    primary_rays,
    shadow_rays,
)
from tryraytrace_tpu.accel.bvh import build_bvh  # noqa: E402
from tryraytrace_tpu.camera.controller import CameraController  # noqa: E402

NBINS = 16


def _sa(lo, hi):
    e = np.maximum(hi - lo, 0.0)
    return 2.0 * (e[..., 0] * e[..., 1] + e[..., 1] * e[..., 2]
                  + e[..., 2] * e[..., 0])


def _bounds_of(pb, idx):
    return pb[idx, :3].min(0), pb[idx, 3:].max(0)


def _best_binary_split(pb, cent, idx):
    """Binned SAH split of primitive subset ``idx`` -> (left_idx,
    right_idx, sah_halves) or None when unsplittable.  sah_halves =
    SA(L)*|L| + SA(R)*|R| surrogate is NOT used; we return the two
    child boxes' areas and counts and let the caller price them."""
    best = None
    lo_all, hi_all = _bounds_of(pb, idx)
    c = cent[idx]
    for axis in range(3):
        cmin, cmax = c[:, axis].min(), c[:, axis].max()
        if cmax - cmin < 1e-12:
            continue
        rel = (c[:, axis] - cmin) / (cmax - cmin)
        b = np.minimum((rel * NBINS).astype(np.int64), NBINS - 1)
        counts = np.bincount(b, minlength=NBINS)
        # Bin bounds.
        blo = np.full((NBINS, 3), np.inf)
        bhi = np.full((NBINS, 3), -np.inf)
        for k in range(NBINS):
            m = b == k
            if m.any():
                blo[k] = pb[idx[m], :3].min(0)
                bhi[k] = pb[idx[m], 3:].max(0)
        # Prefix/suffix sweeps.
        l_lo = np.minimum.accumulate(blo, 0)
        l_hi = np.maximum.accumulate(bhi, 0)
        r_lo = np.minimum.accumulate(blo[::-1], 0)[::-1]
        r_hi = np.maximum.accumulate(bhi[::-1], 0)[::-1]
        l_cnt = np.cumsum(counts)
        for k in range(NBINS - 1):
            nl = l_cnt[k]
            nr = len(idx) - nl
            if nl == 0 or nr == 0:
                continue
            score = (_sa(l_lo[k], l_hi[k]) * nl
                     + _sa(r_lo[k + 1], r_hi[k + 1]) * nr)
            if best is None or score < best[0]:
                best = (score, axis, k, cmin, cmax)
    if best is None:
        return None
    _, axis, k, cmin, cmax = best
    rel = (c[:, axis] - cmin) / (cmax - cmin)
    b = np.minimum((rel * NBINS).astype(np.int64), NBINS - 1)
    m = b <= k
    return idx[m], idx[~m]


def build_quad4(v0, v1, v2, k_leaf=8, width=4, c_leaf=0.01):
    """Direct top-down W-ary SAH build.

    Returns (bounds [M,6], leaf_prim [M], leaf_count [M], children
    {row: [child rows]}, perm) with preorder node ids (root 0) --
    the shape scripts/sim_pair_walk.multi_walk consumes.
    """
    n = len(v0)
    pad = 1e-3
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    deg = (hi - lo) < pad
    lo = np.where(deg, lo - pad, lo)
    hi = np.where(deg, hi + pad, hi)
    pb = np.concatenate([lo, hi], -1).astype(np.float64)
    cent = 0.5 * (lo + hi)

    bounds, leaf_prim, leaf_count, children = [], [], [], {}
    perm = []

    def leaf_cost(cnt):
        return 1.0 + c_leaf * cnt

    def emit(idx) -> int:
        nid = len(bounds)
        blo, bhi = _bounds_of(pb, idx)
        bounds.append(np.concatenate([blo, bhi]))
        leaf_prim.append(-1)
        leaf_count.append(0)

        parts = None
        if len(idx) > k_leaf:
            # Greedy W-way partition: split the part with the largest
            # SA*count product first (the biggest expected-cost term),
            # then keep splitting while parts < width and a part is
            # over the leaf budget OR splitting lowers the priced cost.
            parts = [idx]
            while len(parts) < width:
                # Pick the most expensive splittable part.
                order = sorted(
                    range(len(parts)),
                    key=lambda i: -(_sa(*_bounds_of(pb, parts[i]))
                                    * len(parts[i])))
                done = True
                for i in order:
                    p = parts[i]
                    if len(p) <= 1:
                        continue
                    sp = _best_binary_split(pb, cent, p)
                    if sp is None:
                        continue
                    a, b = sp
                    sa_p = _sa(*_bounds_of(pb, p))
                    sa_a = _sa(*_bounds_of(pb, a))
                    sa_b = _sa(*_bounds_of(pb, b))
                    # Price: keeping p as one child costs
                    # SA(p)*cost(p); splitting costs SA(a)*cost(a) +
                    # SA(b)*cost(b) but consumes a slot.  With slots
                    # still free, split while the priced sum improves
                    # or p cannot be a leaf.
                    keep = sa_p * leaf_cost(min(len(p), k_leaf))
                    split = (sa_a * leaf_cost(min(len(a), k_leaf))
                             + sa_b * leaf_cost(min(len(b), k_leaf)))
                    if len(p) > k_leaf or split < keep:
                        parts.pop(i)
                        parts.extend([a, b])
                        done = False
                        break
                if done:
                    break
            if len(parts) == 1:
                parts = None

        if parts is None:
            # Leaf.
            leaf_prim[nid] = len(perm)
            leaf_count[nid] = len(idx)
            perm.extend(int(i) for i in idx)
            return nid

        # Order children by centroid on the longest axis (the walk
        # re-orders per octant anyway; any stable order works).
        kids = []
        for p in sorted(parts, key=lambda p: float(
                _bounds_of(pb, p)[0].sum())):
            kids.append(emit(p))
        children[nid] = kids
        return nid

    emit(np.arange(n, dtype=np.int64))
    import types

    bvh_like = types.SimpleNamespace(
        bounds=np.asarray(bounds, np.float32),
        leaf_prim=np.asarray(leaf_prim, np.int64),
        leaf_count=np.asarray(leaf_count, np.int64),
        num_nodes=len(bounds),
    )
    return bvh_like, children, np.asarray(perm, np.int64)


def _multi_walk_direct(bvh_like, children, tris, cnt, k, o, d, cap,
                       anyhit, skip_regs):
    """multi_walk over a prebuilt (bvh_like, children) 4-ary tree --
    monkey-wire collapse_bvh to return the direct tree's mapping."""
    import scripts.sim_pair_walk as sim

    orig = sim.collapse_bvh
    sim.collapse_bvh = lambda *a, **kw: children
    try:
        return sim.multi_walk(bvh_like, tris, cnt, k, o, d, cap, 4,
                              anyhit, skip_regs=skip_regs)
    finally:
        sim.collapse_bvh = orig


def run_scene(name, leaf=8, c_isect=0.4, c_leaf=0.01):
    from tryraytrace_tpu.benchmarks import build_config

    cfg_name = {"teapot": "teapot512", "cow": "cow800",
                "flythrough": "flythrough1080"}[name]
    arrays, *_ = build_config(cfg_name)
    v0, v1, v2 = arrays.tri_v0, arrays.tri_v1, arrays.tri_v2

    # Control: binary SAH + dp collapse (the production default).
    bvh = build_bvh(v0, v1, v2, leaf_size=leaf, method="sah",
                    c_isect=c_isect)
    ab = arrays.permuted(bvh.perm)
    tris, cnt = leaf_tris(bvh, ab.tri_v0, ab.tri_v1, ab.tri_v2, leaf)

    # Candidate: direct 4-ary build.
    q4, children, perm = build_quad4(v0, v1, v2, k_leaf=leaf,
                                     c_leaf=c_leaf)
    k4 = int(q4.leaf_count.max())
    tris4 = np.zeros((q4.num_nodes, k4, 3, 3), np.float32)
    cnt4 = np.zeros((q4.num_nodes,), np.int64)
    for nid in np.nonzero(q4.leaf_count > 0)[0]:
        s, c = int(q4.leaf_prim[nid]), int(q4.leaf_count[nid])
        ids = perm[s:s + c]
        tris4[nid, :c, 0] = v0[ids]
        tris4[nid, :c, 1] = v1[ids]
        tris4[nid, :c, 2] = v2[ids]
        cnt4[nid] = c

    n_rows_ctl = None
    cam = CameraController().get_params(320, 180)
    pops = {}
    o, d = primary_rays(cam, 320, 180)
    pops["primary"] = (o, d, np.full(len(o), MISS_T), False)
    o, d = bounce_rays(arrays, 40000)
    pops["bounce"] = (o, d, np.full(len(o), MISS_T), False)
    o, d, cap = shadow_rays(arrays, 40000)
    pops["shadow"] = (o, d, cap, True)

    results = {}
    for pop, (o, d, cap, anyhit) in pops.items():
        g1, t1, oc1 = classic_walk(bvh, tris, cnt, leaf, o, d, cap,
                                   anyhit)
        gc, tc, occ, _ = multi_walk(bvh, tris, cnt, leaf, o, d, cap, 4,
                                    anyhit, skip_regs=3, collapse="dp")
        gd, td, ocd, wd = _multi_walk_direct(q4, children, tris4, cnt4,
                                             k4, o, d, cap, anyhit, 3)
        if anyhit:
            assert (oc1 == occ).all() and (oc1 == ocd).all()
        else:
            np.testing.assert_array_equal(t1, tc)
            np.testing.assert_array_equal(t1, td)
        results[pop] = {
            "classic": float(g1.mean()),
            "collapse_dp": float(gc.mean() / g1.mean()),
            "direct4": float(gd.mean() / g1.mean()),
            "direct4_floor": float((gd - wd).mean() / g1.mean()),
        }
    mixes = {}
    for key in ("classic",):
        surf = 0.5 * (results["primary"][key] + results["bounce"][key])
        mixes[key] = 0.61 * surf + 0.39 * results["shadow"][key]
    for key in ("collapse_dp", "direct4"):
        surf = 0.5 * (results["primary"][key]
                      * results["primary"]["classic"]
                      + results["bounce"][key]
                      * results["bounce"]["classic"])
        mixes[key] = (0.61 * surf + 0.39 * results["shadow"][key]
                      * results["shadow"]["classic"]) / mixes["classic"]
    n_rows_ctl = bvh.num_nodes
    print(json.dumps({
        "scene": name, "leaf": leaf, "c_isect": c_isect,
        "c_leaf": c_leaf, "binary_nodes": n_rows_ctl,
        "direct_rows": q4.num_nodes,
        "direct_internal": len(children),
        "direct_maxleaf": k4,
        **results,
        "mix_ratio": {k: mixes[k] for k in ("collapse_dp", "direct4")},
    }, indent=1))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="teapot")
    ap.add_argument("--leaf", type=int, default=8)
    ap.add_argument("--c-isect", type=float, default=0.4)
    ap.add_argument("--c-leaf", type=float, default=0.01)
    args = ap.parse_args()
    run_scene(args.scene, args.leaf, args.c_isect, args.c_leaf)
