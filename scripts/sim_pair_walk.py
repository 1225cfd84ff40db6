"""Gather-count simulation: threaded single-box walk vs stackless
pair-row walk (child boxes stored at the parent, NO stack).

Decision experiment for the next traversal iteration.  The measured
cost unit on v5e is the in-loop row gather (~4 ns/lane/step, width
free to >=112 f32, docs/PERFORMANCE.md section 1), so "gathers per
ray" is the whole cost model.  The fat-node variant (child boxes at
parent + register short-stack) already halved fetches but lost to
stack traffic; this scheme keeps the halving and drops the stack:

  * internal row X holds BOTH children's boxes + per-octant links
    (near, far, cont); a step tests both boxes and branches 3 ways:
        near-hit -> entry(near)
        far-hit only -> entry(far)
        both miss -> cont(X)      (the classic miss-chain skip)
  * leaf rows hold the inline triangles only (no box test: the tris
    are contained in the leaf box, and MT math rides the gather free);
  * the continuation of a near subtree threads to entry(far) WITHOUT
    knowing far's box result (that bit would be a stack).  Entering a
    missed far node is safe by containment -- an internal far re-tests
    its children (all inside far, both miss, one wasted gather), a
    leaf far MT-tests contained triangles (all miss, one wasted
    gather).  The waste is bounded by one row per threaded far-entry.

This script counts exact gathers per ray for both schemes on the real
bench scenes over three ray populations (primary camera rays, diffuse
bounce rays from surface sampling, NEE shadow rays), with full
closest-hit t_max pruning / any-hit early exit, and asserts both
schemes find identical hits.  Pure NumPy, no TPU needed.

Usage: python scripts/sim_pair_walk.py [--scene teapot|flythrough|cow]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from tryraytrace_tpu.accel.bvh import (build_bvh, collapse_bvh,  # noqa: E402
                                       thread_octant)
from tryraytrace_tpu.camera.controller import CameraController  # noqa: E402
from tryraytrace_tpu.scene.cornell import create_cornell_box  # noqa: E402
from tryraytrace_tpu.scene.model import flatten_scene  # noqa: E402

EPS_T = np.float32(1e-4)
MISS_T = np.float32(1e20)


def safe_inv(d):
    return np.where(np.abs(d) > 1e-12, 1.0 / np.where(d == 0, 1.0, d),
                    np.float32(1e12)).astype(np.float32)


def box_hit(lo, hi, o, inv, t_min, t_max):
    t1 = (lo - o) * inv
    t2 = (hi - o) * inv
    tn = np.minimum(t1, t2).max(-1)
    tf = np.maximum(t1, t2).min(-1)
    return (tf >= tn) & (tf > t_min) & (tn < t_max)


def mt(v0, v1, v2, o, d):
    e1 = v1 - v0
    e2 = v2 - v0
    h = np.cross(d, e2)
    a = (e1 * h).sum(-1)
    par = np.abs(a) < 1e-5
    f = 1.0 / np.where(par, 1.0, a)
    s = o - v0
    u = f * (s * h).sum(-1)
    q = np.cross(s, e1)
    v = f * (d * q).sum(-1)
    t = f * (e2 * q).sum(-1)
    ok = (~par) & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > 1e-5)
    return np.where(ok, t, 0.0).astype(np.float32)


def leaf_tris(bvh, v0, v1, v2, k):
    """[M, k, 3, 3] padded leaf triangle vertices (degenerate pad)."""
    m = bvh.num_nodes
    tri = np.zeros((m, k, 3, 3), np.float32)
    cnt = np.zeros((m,), np.int32)
    for n in np.nonzero(bvh.leaf_count > 0)[0]:
        s, c = int(bvh.leaf_prim[n]), int(bvh.leaf_count[n])
        tri[n, :c, 0] = v0[s:s + c]
        tri[n, :c, 1] = v1[s:s + c]
        tri[n, :c, 2] = v2[s:s + c]
        cnt[n] = c
    return tri, cnt


def classic_walk(bvh, tris, cnt, k, o, d, t_cap, anyhit=False):
    """Threaded single-box walk.  Returns (gathers, best_t)."""
    m = bvh.num_nodes
    lo, hi = bvh.bounds[:, :3], bvh.bounds[:, 3:]
    inv = safe_inv(d)
    oct_ = ((d[:, 0] < 0).astype(np.int32)
            | ((d[:, 1] < 0).astype(np.int32) << 1)
            | ((d[:, 2] < 0).astype(np.int32) << 2))
    nh = np.stack([thread_octant(bvh, ob)[0] for ob in range(8)])
    nm = np.stack([thread_octant(bvh, ob)[1] for ob in range(8)])
    n = o.shape[0]
    cur = np.zeros(n, np.int64)
    best = t_cap.copy()
    gath = np.zeros(n, np.int64)
    alive = np.ones(n, bool)
    occl = np.zeros(n, bool)
    is_leaf = bvh.leaf_prim >= 0
    while alive.any():
        c = np.where(alive, cur, 0)
        gath += alive
        hit = box_hit(lo[c], hi[c], o, inv, EPS_T, best) & alive
        lf = hit & is_leaf[c]
        if lf.any():
            t = mt(tris[c[lf], :, 0], tris[c[lf], :, 1], tris[c[lf], :, 2],
                   o[lf, None], d[lf, None])  # [L, k]
            t = np.where((np.arange(k)[None] < cnt[c[lf], None]) & (t > 0)
                         & (t < best[lf, None]), t, MISS_T)
            tmin = t.min(-1)
            got = tmin < best[lf]
            bb = best[lf]
            bb[got] = tmin[got]
            best[lf] = bb
            if anyhit:
                oc = occl[lf]
                oc |= got
                occl[lf] = oc
        nxt = np.where(hit & ~is_leaf[c], nh[oct_, c], nm[oct_, c])
        cur = np.where(alive, nxt, cur)
        alive = (cur < m) & ~(occl if anyhit else np.zeros(n, bool))
    return gath, best, occl


def pair_links(bvh):
    """Per-octant pair-walk links.

    entry(N) = N's own row id (internal row for internal N, leaf row
    for leaf N; the sim reuses node ids as row ids).  For each octant:
      near[X], far[X]  (children of internal X in octant order)
      cont[N]          (continuation after N's subtree)
    """
    m = bvh.num_nodes
    nears = np.zeros((8, m), np.int64)
    fars = np.zeros((8, m), np.int64)
    conts = np.full((8, m), m, np.int64)
    for ob in range(8):
        stack = [(0, m)]
        while stack:
            n_, cont = stack.pop()
            conts[ob, n_] = cont
            if bvh.leaf_prim[n_] >= 0:
                continue
            neg = (ob >> int(bvh.axis[n_])) & 1
            near, far = ((int(bvh.right[n_]), int(bvh.left[n_])) if neg
                         else (int(bvh.left[n_]), int(bvh.right[n_])))
            nears[ob, n_] = near
            fars[ob, n_] = far
            stack.append((far, cont))
            stack.append((near, far))
    return nears, fars, conts


def pair_walk(bvh, tris, cnt, k, o, d, t_cap, anyhit=False,
              skip_regs=0):
    """Stackless pair-row walk.  Returns (gathers, best_t).

    ``skip_regs``: depth of the known-miss skip register file.  At an
    internal X with near hit and far MISS, the walk descends near and
    pushes (entry(far) -> cont(X)); any later jump that targets
    entry(far) redirects to cont(X), skipping the known-missed far
    entry.  Pending fars are consumed innermost-first (LIFO), so a
    shallow register file catches most of the waste with O(1) lane
    state; overwritten entries just fall back to the containment
    re-test (conservative, still exact)."""
    m = bvh.num_nodes
    lo, hi = bvh.bounds[:, :3], bvh.bounds[:, 3:]
    inv = safe_inv(d)
    oct_ = ((d[:, 0] < 0).astype(np.int32)
            | ((d[:, 1] < 0).astype(np.int32) << 1)
            | ((d[:, 2] < 0).astype(np.int32) << 2))
    nears, fars, conts = pair_links(bvh)
    is_leaf = bvh.leaf_prim >= 0
    n = o.shape[0]
    # Entry: root row (if root is a leaf, its leaf row).
    cur = np.zeros(n, np.int64)
    best = t_cap.copy()
    gath = np.zeros(n, np.int64)
    waste = np.zeros(n, np.int64)
    alive = np.ones(n, bool)
    occl = np.zeros(n, bool)
    reg_e = np.full((max(skip_regs, 1), n), -1, np.int64)  # target ids
    reg_s = np.full((max(skip_regs, 1), n), -1, np.int64)  # redirects
    while alive.any():
        c = np.where(alive, cur, 0)
        gath += alive
        # Waste: entered a row whose own box (vs the current t_max)
        # misses -- the gathers a hit-bit stack would have skipped.
        waste += alive & ~box_hit(lo[c], hi[c], o, inv, EPS_T, best)
        leaf_here = is_leaf[c] & alive
        # Leaf row: MT the inline triangles, continue on the thread.
        if leaf_here.any():
            cl = c[leaf_here]
            t = mt(tris[cl, :, 0], tris[cl, :, 1], tris[cl, :, 2],
                   o[leaf_here, None], d[leaf_here, None])
            t = np.where((np.arange(k)[None] < cnt[cl, None]) & (t > 0)
                         & (t < best[leaf_here, None]), t, MISS_T)
            tmin = t.min(-1)
            got = tmin < best[leaf_here]
            bb = best[leaf_here]
            bb[got] = tmin[got]
            best[leaf_here] = bb
            if anyhit:
                oc = occl[leaf_here]
                oc |= got
                occl[leaf_here] = oc
        # Internal row: test both children, 3-way branch.
        nr = nears[oct_, c]
        fr = fars[oct_, c]
        hit_n = box_hit(lo[nr], hi[nr], o, inv, EPS_T, best)
        hit_f = box_hit(lo[fr], hi[fr], o, inv, EPS_T, best)
        nxt_int = np.where(hit_n, nr, np.where(hit_f, fr, conts[oct_, c]))
        nxt = np.where(is_leaf[c], conts[oct_, c], nxt_int)
        if skip_regs:
            # Push on descend-near-with-far-missed: entry(far)->cont(X).
            push = (~is_leaf[c]) & hit_n & ~hit_f & alive
            for r in range(skip_regs - 1, 0, -1):
                reg_e[r] = np.where(push, reg_e[r - 1], reg_e[r])
                reg_s[r] = np.where(push, reg_s[r - 1], reg_s[r])
            reg_e[0] = np.where(push, fr, reg_e[0])
            reg_s[0] = np.where(push, conts[oct_, c], reg_s[0])
            # Redirect a jump that targets a known-missed far; consume.
            for r in range(skip_regs):
                m_ = (nxt == reg_e[r]) & (reg_e[r] >= 0) & alive
                nxt = np.where(m_, reg_s[r], nxt)
                reg_e[r] = np.where(m_, -1, reg_e[r])
        cur = np.where(alive, nxt, cur)
        alive = (cur < m) & ~(occl if anyhit else np.zeros(n, bool))
    return gath, best, occl, waste


def multi_links(bvh, children, width):
    """Per-octant W-ary walk links over the collapsed tree.

    For each octant: ordered child slots (approximate front-to-back:
    sort by centroid projected on the octant direction), per-slot
    entry row, and cont threading (cont(slot i) = entry(slot i+1),
    cont(last) = cont(X)).  Row ids reuse binary node ids.
    """
    m = bvh.num_nodes
    cent = 0.5 * (bvh.bounds[:, :3] + bvh.bounds[:, 3:])
    slots = np.full((8, m, width), m, np.int64)   # entry of slot j
    nslots = np.zeros((m,), np.int64)
    conts = np.full((8, m), m, np.int64)
    sign = np.array([[1 - 2 * ((ob >> a) & 1) for a in range(3)]
                     for ob in range(8)], np.float32)
    for ob in range(8):
        stack = [(0, m)]
        while stack:
            x, cont = stack.pop()
            conts[ob, x] = cont
            if x not in children:
                continue
            kids = children[x]
            key = (cent[kids] * sign[ob]).sum(-1)
            order = [kids[i] for i in np.argsort(key, kind="stable")]
            nslots[x] = len(order)
            for j, c in enumerate(order):
                slots[ob, x, j] = c
                nxt = order[j + 1] if j + 1 < len(order) else cont
                stack.append((c, nxt))
    return slots, nslots, conts


def multi_walk(bvh, tris, cnt, k, o, d, t_cap, width, anyhit=False,
               skip_regs=0, collapse="count"):
    """Stackless W-ary collapsed-row walk (pair_walk generalized).

    At a collapsed row X: test all child boxes, jump to the first hit
    slot in octant order, else cont(X).  Subtree continuations thread
    to the next slot's entry unconditionally (containment absorbs
    entries into missed slots: one wasted gather each).  Skip
    registers record slots proven missed at descend time and redirect
    later jumps past them (chains resolved by repeated passes).
    """
    m = bvh.num_nodes
    lo, hi = bvh.bounds[:, :3], bvh.bounds[:, 3:]
    inv = safe_inv(d)
    oct_ = ((d[:, 0] < 0).astype(np.int32)
            | ((d[:, 1] < 0).astype(np.int32) << 1)
            | ((d[:, 2] < 0).astype(np.int32) << 2))
    children = collapse_bvh(bvh, width, criterion=collapse)
    slots, _, conts = multi_links(bvh, children, width)
    is_leaf = bvh.leaf_prim >= 0
    is_coll = np.zeros(m, bool)
    for x in children:
        is_coll[x] = True
    n = o.shape[0]
    cur = np.zeros(n, np.int64)
    best = t_cap.copy()
    gath = np.zeros(n, np.int64)
    waste = np.zeros(n, np.int64)
    alive = np.ones(n, bool)
    occl = np.zeros(n, bool)
    reg_e = np.full((max(skip_regs, 1), n), -1, np.int64)
    reg_s = np.full((max(skip_regs, 1), n), -1, np.int64)
    while alive.any():
        c = np.where(alive, cur, 0)
        gath += alive
        waste += alive & ~box_hit(lo[c], hi[c], o, inv, EPS_T, best)
        leaf_here = is_leaf[c] & alive
        if leaf_here.any():
            cl = c[leaf_here]
            t = mt(tris[cl, :, 0], tris[cl, :, 1], tris[cl, :, 2],
                   o[leaf_here, None], d[leaf_here, None])
            t = np.where((np.arange(k)[None] < cnt[cl, None]) & (t > 0)
                         & (t < best[leaf_here, None]), t, MISS_T)
            tmin = t.min(-1)
            got = tmin < best[leaf_here]
            bb = best[leaf_here]
            bb[got] = tmin[got]
            best[leaf_here] = bb
            if anyhit:
                oc = occl[leaf_here]
                oc |= got
                occl[leaf_here] = oc
        # Collapsed internal row: test all W child slots.
        sl = slots[oct_, c]                       # [n, W]
        valid = sl < m
        sc = np.where(valid, sl, 0)
        hit = np.stack([box_hit(lo[sc[:, j]], hi[sc[:, j]], o, inv,
                                EPS_T, best)
                        for j in range(width)], -1) & valid
        first = np.argmax(hit, -1)                 # first hit slot
        anyh = hit.any(-1)
        nxt_int = np.where(anyh, sl[np.arange(n), first], conts[oct_, c])
        nxt = np.where(is_coll[c], nxt_int, conts[oct_, c])
        if skip_regs:
            # Push missed slots AFTER the descended one: jump target
            # entry(slot j) redirects to its thread successor
            # (entry(slot j+1) or cont(X)).
            for j in range(width - 1, 0, -1):
                if j + 1 < width:
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
            # Redirect (resolve chains with a few passes).
            for _ in range(2):
                for r in range(skip_regs):
                    m_ = (nxt == reg_e[r]) & (reg_e[r] >= 0) & alive
                    nxt = np.where(m_, reg_s[r], nxt)
                    reg_e[r] = np.where(m_, -1, reg_e[r])
        cur = np.where(alive, nxt, cur)
        alive = (cur < m) & ~(occl if anyhit else np.zeros(n, bool))
    return gath, best, occl, waste


def primary_rays(cam, w, h):
    pos = np.asarray(cam.pos, np.float32)
    cx = np.asarray(cam.cx, np.float32)
    cy = np.asarray(cam.cy, np.float32)
    cdir = np.asarray(cam.dir, np.float32)
    pix = np.arange(w * h)
    x = (pix % w).astype(np.float32)
    y = (h - 1 - pix // w).astype(np.float32)
    sx = ((x + 0.5) / w - 0.5)[:, None]
    sy = ((y + 0.5) / h - 0.5)[:, None]
    d = cx * sx + cy * sy + cdir
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(pos, d.shape).astype(np.float32)
    return o.copy(), d.astype(np.float32)


def bounce_rays(arrays, n, seed=1):
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
    d = rs.randn(n, 3)
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-20)
    wrong = (d * nn).sum(1) < 0
    d[wrong] = -d[wrong]
    return (pt + nn * 1e-3).astype(np.float32), d.astype(np.float32)


def shadow_rays(arrays, n, seed=2):
    """Surface points -> random light-triangle points (NEE segments)."""
    rs = np.random.RandomState(seed)
    o, _ = bounce_rays(arrays, n, seed)
    li = np.nonzero((arrays.emission != 0).any(-1))[0]
    pick = li[rs.randint(len(li), size=n)]
    r1, r2 = rs.rand(n, 1), rs.rand(n, 1)
    su = np.sqrt(r1)
    lp = (arrays.tri_v0[pick] * (1 - su)
          + arrays.tri_v1[pick] * (su * (1 - r2))
          + arrays.tri_v2[pick] * (su * r2))
    seg = lp - o
    dist = np.linalg.norm(seg, axis=-1, keepdims=True)
    d = (seg / np.maximum(dist, 1e-20)).astype(np.float32)
    return o, d, (dist[:, 0] - 1e-3).astype(np.float32)


def run_scene(name, leaf=8, c_isect=0.4):
    from tryraytrace_tpu.benchmarks import build_config
    cfg_name = {"teapot": "teapot512", "cow": "cow800",
                "flythrough": "flythrough1080"}[name]
    arrays, *_ = build_config(cfg_name)
    bvh = build_bvh(arrays.tri_v0, arrays.tri_v1, arrays.tri_v2,
                    leaf_size=leaf, method="sah", c_isect=c_isect)
    arrays = arrays.permuted(bvh.perm)
    k = leaf
    tris, cnt = leaf_tris(bvh, arrays.tri_v0, arrays.tri_v1,
                          arrays.tri_v2, k)
    cam = CameraController().get_params(320, 180)
    results = {}

    pops = {}
    o, d = primary_rays(cam, 320, 180)
    pops["primary"] = (o, d, np.full(len(o), MISS_T), False)
    o, d = bounce_rays(arrays, 40000)
    pops["bounce"] = (o, d, np.full(len(o), MISS_T), False)
    o, d, cap = shadow_rays(arrays, 40000)
    pops["shadow"] = (o, d, cap, True)

    for pop, (o, d, cap, anyhit) in pops.items():
        g1, t1, oc1 = classic_walk(bvh, tris, cnt, k, o, d, cap, anyhit)
        g2, t2, oc2, waste = pair_walk(bvh, tris, cnt, k, o, d, cap,
                                       anyhit)
        g3, t3, oc3, _ = pair_walk(bvh, tris, cnt, k, o, d, cap, anyhit,
                                   skip_regs=1)
        g4, t4, oc4, _ = pair_walk(bvh, tris, cnt, k, o, d, cap, anyhit,
                                   skip_regs=2)
        if anyhit:
            assert (oc1 == oc3).all() and (oc1 == oc4).all()
        else:
            np.testing.assert_array_equal(t1, t3)
            np.testing.assert_array_equal(t1, t4)
        if anyhit:
            assert (oc1 == oc2).all(), "occlusion mismatch"
        else:
            np.testing.assert_array_equal(t1, t2)
        results[pop] = {"classic": float(g1.mean()),
                        "pair": float(g2.mean()),
                        "ratio": float(g2.mean() / g1.mean()),
                        "skip1": float(g3.mean() / g1.mean()),
                        "skip2": float(g4.mean() / g1.mean()),
                        "floor": float((g2 - waste).mean() / g1.mean())}
        for width in (4, 8):
            regs = {4: (0, 2, 3), 8: (0, 3, 6)}[width]
            for sr in regs:
                gw, tw, ocw, ww = multi_walk(bvh, tris, cnt, k, o, d,
                                             cap, width, anyhit,
                                             skip_regs=sr)
                if anyhit:
                    assert (oc1 == ocw).all(), f"w{width} occl mismatch"
                else:
                    np.testing.assert_array_equal(t1, tw)
                results[pop][f"w{width}s{sr}"] = float(gw.mean()
                                                       / g1.mean())
                if sr == 0:
                    results[pop][f"w{width}floor"] = float(
                        (gw - ww).mean() / g1.mean())
        # SAH-aware collapse A/B (round 4): same W=4 walk, expansion
        # by child surface area ("sa", greedy) or the exact
        # expected-fetch DP ("dp") instead of subtree primitive count.
        for crit in ("sa", "dp"):
            for sr in (2, 3):
                gw, tw, ocw, _ = multi_walk(bvh, tris, cnt, k, o, d,
                                            cap, 4, anyhit,
                                            skip_regs=sr, collapse=crit)
                if anyhit:
                    assert (oc1 == ocw).all(), f"{crit}-collapse occl mismatch"
                else:
                    np.testing.assert_array_equal(t1, tw)
                results[pop][f"w4s{sr}_{crit}"] = float(gw.mean()
                                                        / g1.mean())
    # Weighted by the headline mix: 61% surface (primary+bounce), 39%
    # shadow (BENCH_r01: 241.6M path / 156.3M NEE).
    surf = 0.5 * (results["primary"]["classic"] + results["bounce"]["classic"])
    surf_p = 0.5 * (results["primary"]["pair"] + results["bounce"]["pair"])
    mix_c = 0.61 * surf + 0.39 * results["shadow"]["classic"]
    mix_p = 0.61 * surf_p + 0.39 * results["shadow"]["pair"]
    results["mix"] = {"classic": mix_c, "pair": mix_p,
                      "ratio": mix_p / mix_c}
    print(json.dumps({"scene": name, "leaf": leaf, "c_isect": c_isect,
                      "nodes": bvh.num_nodes, **results}, indent=1))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="teapot")
    ap.add_argument("--leaf", type=int, default=8,
                    help="fat-leaf size (pair rows fit <=11 in the "
                         "free 112-float row budget)")
    ap.add_argument("--c-isect", type=float, default=0.4,
                    help="SAH intersection cost (0.4 = the threaded-"
                         "walk optimum; pair halves internal-visit "
                         "cost, so the optimum may shift)")
    args = ap.parse_args()
    run_scene(args.scene, args.leaf, args.c_isect)
