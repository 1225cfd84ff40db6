"""Decision sim: temporal ray-path prediction (VERDICT r4 #4, the
hash-based-prediction direction of PAPERS.md 1910.01304, adapted to
this engine's cost model).

Idea: a persistent-wave lane renders the SAME pixel's samples
back-to-back, so the previous sample's hit triangle (surface rays) or
occluder triangle (NEE shadow rays) is an almost-free predictor -- one
int32 of lane state, no cross-lane traffic, no hash table.  On walk
start the lane spends its FIRST row fetch on the predicted triangle's
leaf row instead of the root:

  - closest-hit: a prediction hit seeds t_max with a near-final t, so
    every subsequent box test prunes against the true distance from
    step one (fewer visits);
  - any-hit (shadow): a predicted occluder that still occludes ends
    the walk after ONE fetch (vs ~3.7 today).

Cost = +1 row fetch per walk where the prediction misses (and the
walk then runs from the root as before, minus the t seeded).  This
sim measures exact gather counts per ray for the production W4s3
quad walk with and without prediction, using honestly-degraded
predictors: for each population we draw TWO correlated ray sets (the
same pixels/surface points with fresh RNG -- exactly what
sample s vs s+1 looks like) and predict set B from set A's results.

Output: gathers/ray {none, predicted} per population + the headline
mix ratio.  Keep/kill gate: engine implementation only if the mix
saves >= 5%.

Usage: python scripts/sim_prediction.py [--scene teapot|cow|flythrough]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from scripts.sim_pair_walk import (  # noqa: E402
    MISS_T,
    box_hit,
    leaf_tris,
    mt,
    multi_links,
    primary_rays,
    safe_inv,
)
from tryraytrace_tpu.accel.bvh import build_bvh, collapse_bvh  # noqa: E402
from tryraytrace_tpu.camera.controller import CameraController  # noqa: E402


def leaf_ids(bvh, k):
    """[M, k] global (slot-ordered) primitive ids per leaf row."""
    m = bvh.num_nodes
    ids = np.full((m, k), -1, np.int64)
    for n in np.nonzero(bvh.leaf_count > 0)[0]:
        s, c = int(bvh.leaf_prim[n]), int(bvh.leaf_count[n])
        ids[n, :c] = np.arange(s, s + c)
    return ids


def quad_walk_ids(bvh, children, tris, cnt, ids, k, o, d, t_cap,
                  anyhit=False, skip_regs=3, prim_node=None,
                  pred_prim=None):
    """W4 collapsed walk tracking the winning primitive id; optional
    predicted-primitive warm start.

    ``pred_prim`` [n]: global prim id predicted for each ray (-1 =
    none).  A predicted ray spends one extra gather fetching the
    predicted prim's leaf row (prim_node[pred]) and MT-testing all its
    slots first; any-hit rays that get occluded there never walk.
    Returns (gathers, best_t, hit_prim, occl).
    """
    m = bvh.num_nodes
    lo, hi = bvh.bounds[:, :3], bvh.bounds[:, 3:]
    inv = safe_inv(d)
    oct_ = ((d[:, 0] < 0).astype(np.int32)
            | ((d[:, 1] < 0).astype(np.int32) << 1)
            | ((d[:, 2] < 0).astype(np.int32) << 2))
    slots, _, conts = multi_links(bvh, children, 4)
    is_leaf = bvh.leaf_prim >= 0
    is_coll = np.zeros(m, bool)
    for x in children:
        is_coll[x] = True
    n = o.shape[0]
    cur = np.zeros(n, np.int64)
    best = t_cap.copy()
    hitp = np.full(n, -1, np.int64)
    gath = np.zeros(n, np.int64)
    alive = np.ones(n, bool)
    occl = np.zeros(n, bool)

    if pred_prim is not None:
        pred = pred_prim >= 0
        pn = np.where(pred, prim_node[np.maximum(pred_prim, 0)], 0)
        gath += pred  # the warm-start fetch
        t = mt(tris[pn, :, 0], tris[pn, :, 1], tris[pn, :, 2],
               o[:, None], d[:, None])
        t = np.where((np.arange(k)[None] < cnt[pn, None]) & (t > 0)
                     & (t < best[:, None]) & pred[:, None], t, MISS_T)
        am = t.argmin(-1)
        tmin = t[np.arange(n), am]
        got = tmin < best
        best = np.where(got, tmin, best)
        hitp = np.where(got, ids[pn, am], hitp)
        if anyhit:
            occl |= got
            alive &= ~occl

    reg_e = np.full((max(skip_regs, 1), n), -1, np.int64)
    reg_s = np.full((max(skip_regs, 1), n), -1, np.int64)
    while alive.any():
        c = np.where(alive, cur, 0)
        gath += alive
        leaf_here = is_leaf[c] & alive
        if leaf_here.any():
            cl = c[leaf_here]
            t = mt(tris[cl, :, 0], tris[cl, :, 1], tris[cl, :, 2],
                   o[leaf_here, None], d[leaf_here, None])
            t = np.where((np.arange(k)[None] < cnt[cl, None]) & (t > 0)
                         & (t < best[leaf_here, None]), t, MISS_T)
            am = t.argmin(-1)
            tmin = t[np.arange(len(cl)), am]
            got = tmin < best[leaf_here]
            bb = best[leaf_here]
            hh = hitp[leaf_here]
            bb[got] = tmin[got]
            hh[got] = ids[cl, am][got]
            best[leaf_here] = bb
            hitp[leaf_here] = hh
            if anyhit:
                oc = occl[leaf_here]
                oc |= got
                occl[leaf_here] = oc
        sl = slots[oct_, c]
        valid = sl < m
        sc = np.where(valid, sl, 0)
        hit = np.stack([box_hit(lo[sc[:, j]], hi[sc[:, j]], o, inv,
                                np.float32(1e-4), best)
                        for j in range(4)], -1) & valid
        first = np.argmax(hit, -1)
        anyh = hit.any(-1)
        nxt_int = np.where(anyh, sl[np.arange(n), first], conts[oct_, c])
        nxt = np.where(is_coll[c], nxt_int, conts[oct_, c])
        if skip_regs:
            for j in range(3, 0, -1):
                if j + 1 < 4:
                    succ = np.where(valid[:, j + 1], sl[:, j + 1],
                                    conts[oct_, c])
                else:
                    succ = conts[oct_, c]
                push = (is_coll[c] & alive & anyh & valid[:, j]
                        & ~hit[:, j] & (first < j))
                for r in range(skip_regs - 1, 0, -1):
                    reg_e[r] = np.where(push, reg_e[r - 1], reg_e[r])
                    reg_s[r] = np.where(push, reg_s[r - 1], reg_s[r])
                reg_e[0] = np.where(push, sl[:, j], reg_e[0])
                reg_s[0] = np.where(push, succ, reg_s[0])
            for _ in range(2):
                for r in range(skip_regs):
                    m_ = (nxt == reg_e[r]) & (reg_e[r] >= 0) & alive
                    nxt = np.where(m_, reg_s[r], nxt)
                    reg_e[r] = np.where(m_, -1, reg_e[r])
        cur = np.where(alive, nxt, cur)
        alive = (cur < m) & ~(occl if anyhit else np.zeros(n, bool))
    return gath, best, hitp, occl


def correlated_bounce(arrays, n, seed):
    """Two diffuse-bounce sets from the SAME surface points with
    independent directions (sample s vs s+1 at one hit point)."""
    rs = np.random.RandomState(seed)
    v0, v1, v2 = arrays.tri_v0, arrays.tri_v1, arrays.tri_v2
    nrm = np.cross(v1 - v0, v2 - v0)
    area = 0.5 * np.linalg.norm(nrm, axis=1)
    ti = rs.choice(len(v0), size=n, p=area / area.sum())
    r1, r2 = rs.rand(n, 1), rs.rand(n, 1)
    su = np.sqrt(r1)
    pt = v0[ti] * (1 - su) + v1[ti] * (su * (1 - r2)) + v2[ti] * (su * r2)
    nn = nrm[ti] / np.maximum(np.linalg.norm(nrm[ti], axis=1,
                                             keepdims=True), 1e-20)
    flip = rs.rand(n) < 0.5
    nn[flip] = -nn[flip]
    o = (pt + nn * 1e-3).astype(np.float32)

    def hemi():
        d = rs.randn(n, 3)
        d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-20)
        wrong = (d * nn).sum(1) < 0
        d[wrong] = -d[wrong]
        return d.astype(np.float32)

    return o, hemi(), hemi()


def correlated_shadow(arrays, n, seed):
    """Two NEE segments from the SAME surface points to independent
    light-triangle samples."""
    rs = np.random.RandomState(seed)
    o, _, _ = correlated_bounce(arrays, n, seed)
    li = np.nonzero((arrays.emission != 0).any(-1))[0]

    def seg():
        pick = li[rs.randint(len(li), size=n)]
        r1, r2 = rs.rand(n, 1), rs.rand(n, 1)
        su = np.sqrt(r1)
        lp = (arrays.tri_v0[pick] * (1 - su)
              + arrays.tri_v1[pick] * (su * (1 - r2))
              + arrays.tri_v2[pick] * (su * r2))
        v = lp - o
        dist = np.linalg.norm(v, axis=-1, keepdims=True)
        return ((v / np.maximum(dist, 1e-20)).astype(np.float32),
                (dist[:, 0] - 1e-3).astype(np.float32))

    dA, capA = seg()
    dB, capB = seg()
    return o, dA, capA, dB, capB


def run_scene(name, leaf=8, c_isect=0.4):
    from tryraytrace_tpu.benchmarks import build_config

    cfg_name = {"teapot": "teapot512", "cow": "cow800",
                "flythrough": "flythrough1080"}[name]
    arrays, *_ = build_config(cfg_name)
    bvh = build_bvh(arrays.tri_v0, arrays.tri_v1, arrays.tri_v2,
                    leaf_size=leaf, method="sah", c_isect=c_isect)
    ab = arrays.permuted(bvh.perm)
    tris, cnt = leaf_tris(bvh, ab.tri_v0, ab.tri_v1, ab.tri_v2, leaf)
    ids = leaf_ids(bvh, leaf)
    # prim -> its leaf node.
    prim_node = np.zeros(arrays.num_objects, np.int64)
    for nn in np.nonzero(bvh.leaf_count > 0)[0]:
        s, c = int(bvh.leaf_prim[nn]), int(bvh.leaf_count[nn])
        prim_node[s:s + c] = nn
    children = collapse_bvh(bvh, criterion="dp")

    def walk(o, d, cap, anyhit, pred=None):
        return quad_walk_ids(bvh, children, tris, cnt, ids, leaf, o, d,
                             cap, anyhit, 3, prim_node, pred)

    results = {}
    cam = CameraController().get_params(320, 180)

    # Primary: set A = pixel-centre rays (the predictor source is the
    # same pixel's previous sample), set B = rays through a tent-
    # jittered offset -- regenerate with a half-pixel shift.
    oA, dA = primary_rays(cam, 320, 180)
    rs = np.random.RandomState(7)
    # Jitter B by perturbing direction within the pixel footprint.
    pix_du = np.asarray(cam.cx, np.float32) / 320.0
    pix_dv = np.asarray(cam.cy, np.float32) / 180.0
    jx = rs.rand(len(dA), 1).astype(np.float32) - 0.5
    jy = rs.rand(len(dA), 1).astype(np.float32) - 0.5
    dB = dA + pix_du * jx + pix_dv * jy
    dB /= np.linalg.norm(dB, axis=-1, keepdims=True)
    dB = dB.astype(np.float32)
    capP = np.full(len(oA), MISS_T)
    gA, tA, pA, _ = walk(oA, dA, capP, False)
    gB0, tB0, pB0, _ = walk(oA, dB, capP, False)
    gB1, tB1, pB1, _ = walk(oA, dB, capP, False, pred=pA)
    np.testing.assert_array_equal(tB0, tB1)
    np.testing.assert_array_equal(pB0, pB1)
    results["primary"] = {
        "none": float(gB0.mean()), "pred": float(gB1.mean()),
        "ratio": float(gB1.mean() / gB0.mean()),
        "pred_hit_rate": float((pA == pB0)[pB0 >= 0].mean()),
    }

    # Bounce: same surface point, fresh hemisphere draw.
    o, dA, dB = correlated_bounce(arrays, 40000, 1)
    capB_ = np.full(len(o), MISS_T)
    gA, tA, pA, _ = walk(o, dA, capB_, False)
    gB0, tB0, pB0, _ = walk(o, dB, capB_, False)
    gB1, tB1, pB1, _ = walk(o, dB, capB_, False, pred=pA)
    np.testing.assert_array_equal(tB0, tB1)
    results["bounce"] = {
        "none": float(gB0.mean()), "pred": float(gB1.mean()),
        "ratio": float(gB1.mean() / gB0.mean()),
        "pred_hit_rate": float((pA == pB0)[pB0 >= 0].mean()),
    }

    # Shadow: same surface point, fresh light sample; predictor = A's
    # occluding primitive (valid only when A was occluded).
    o, dA, capA, dB, capBs = correlated_shadow(arrays, 40000, 2)
    gA, tA, pA, ocA = walk(o, dA, capA, True)
    predS = np.where(ocA, pA, -1)
    gB0, tB0, pB0, ocB0 = walk(o, dB, capBs, True)
    gB1, tB1, pB1, ocB1 = walk(o, dB, capBs, True, pred=predS)
    np.testing.assert_array_equal(ocB0, ocB1)
    results["shadow"] = {
        "none": float(gB0.mean()), "pred": float(gB1.mean()),
        "ratio": float(gB1.mean() / gB0.mean()),
        "occl_rate": float(ocB0.mean()),
        "pred_valid_rate": float((predS >= 0).mean()),
    }

    mix0 = (0.61 * 0.5 * (results["primary"]["none"]
                          + results["bounce"]["none"])
            + 0.39 * results["shadow"]["none"])
    mix1 = (0.61 * 0.5 * (results["primary"]["pred"]
                          + results["bounce"]["pred"])
            + 0.39 * results["shadow"]["pred"])
    print(json.dumps({"scene": name, "leaf": leaf,
                      "nodes": bvh.num_nodes, **results,
                      "mix_none": mix0, "mix_pred": mix1,
                      "mix_ratio": mix1 / mix0}, indent=1))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="teapot")
    ap.add_argument("--leaf", type=int, default=8)
    ap.add_argument("--c-isect", type=float, default=0.4)
    args = ap.parse_args()
    run_scene(args.scene, args.leaf, args.c_isect)
