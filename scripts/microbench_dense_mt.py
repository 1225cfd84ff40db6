"""Dense all-pairs Moller-Trumbore: the keep/kill measurement for a
gather-free "MXU path tracing" engine.

BASELINE.md notes the 200 Mrays/s north star needs "an algorithmic
break from per-ray traversal".  The only gather-free formulation is
dense: intersect every live ray against every triangle, closest-hit by
a min-reduction over the triangle axis.  Two expressions:

* ``matmul``: the trilinear MT determinants factor into bilinear forms
  over per-ray features F = [d, o x d, o, 1] (10 wide) and per-triangle
  feature columns, so det/u_num/v_num/t_num for ALL pairs is ONE
  [R,10] @ [10,4T] matmul + a VPU epilogue (sign-folded comparisons,
  one reciprocal, min-reduce).  bf16-pair planes (hi + residual)
  recover ~f32 precision while keeping MXU-rate inputs; the K dim is
  padded to the 128-deep systolic array either way, so the pair trick
  is free but the pad caps MXU utilization at 20/128.
* ``vpu``: the reference-exact elementwise MT (ops/intersect.py
  formula) broadcast over T-blocks with a running min -- pure VPU,
  no gathers, bit-compatible with the oracle's per-pair math.

Cost model to beat (docs/PERFORMANCE.md): the persistent engine spends
~54 ns/segment on traversal at the headline (6.8 visits/ray at ~4.6
ns/lane-step over 0.6 utilization).  Dense is a win only if
ns/segment at T~6300 lands well under that; it scales O(T) vs the
BVH's O(log T), so check T~15k (flythrough) too.

Usage: python scripts/microbench_dense_mt.py [--rays 16384]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

EPS = 1e-5


def _tri_features(v0, v1, v2):
    """Per-triangle feature columns G [10, 4] blocks -> [10, 4T]."""
    e1 = v1 - v0
    e2 = v2 - v0
    n = np.cross(e1, e2)
    zero3 = np.zeros_like(v0)
    one = np.ones((len(v0), 1), np.float32)
    # Rows are ray-feature slots [d(3), c=o x d(3), o(3), 1]; columns
    # per triangle: det, u_num, v_num, t_num.
    det_col = np.concatenate([-n, zero3, zero3, 0 * one], axis=1)      # [T,10]
    u_col = np.concatenate([np.cross(v0, e2), e2, zero3, 0 * one], 1)
    v_col = np.concatenate([-np.cross(v0, e1), -e1, zero3, 0 * one], 1)
    t_col = np.concatenate([zero3, zero3, n, -(v0 * n).sum(1, keepdims=True)], 1)
    g = np.stack([det_col, u_col, v_col, t_col], axis=2)  # [T,10,4]
    return np.ascontiguousarray(g.transpose(1, 0, 2).reshape(10, -1))  # [10,4T]


def _split_pair(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def dense_matmul_closest(g, r_o, r_d, t_count):
    """Closest-hit t for all rays via one feature matmul (bf16-pair)."""
    c = jnp.cross(r_o, r_d)
    ones = jnp.ones((r_o.shape[0], 1), jnp.float32)
    f = jnp.concatenate([r_d, c, r_o, ones], axis=1)          # [R,10]
    f_hi, f_lo = _split_pair(f)
    g_hi, g_lo = _split_pair(g)
    fcat = jnp.concatenate([f_hi, f_lo], axis=1)              # [R,20]
    gcat = jnp.concatenate([g_hi, g_lo], axis=0)              # [20,4T]
    planes = jnp.dot(fcat, gcat, preferred_element_type=jnp.float32)
    planes = planes.reshape(r_o.shape[0], t_count, 4)
    det, un, vn, tn = (planes[..., i] for i in range(4))
    adet = jnp.abs(det)
    sgn = jnp.sign(det)
    us, vs, ts = un * sgn, vn * sgn, tn * sgn
    valid = ((adet >= EPS) & (us >= 0) & (us <= adet)
             & (vs >= 0) & (us + vs <= adet) & (ts > EPS * adet))
    t = ts / adet
    return jnp.min(jnp.where(valid, t, jnp.inf), axis=1)


def _mt_reference(b0, b1, b2, r_o, r_d):
    """ops/intersect.py's exact formula, inlined (script is run
    standalone; keep it dependency-free)."""
    e1 = b1 - b0
    e2 = b2 - b0
    h = jnp.cross(r_d, e2)
    a = (e1 * h).sum(-1)
    parallel = jnp.abs(a) < EPS
    f = 1.0 / jnp.where(parallel, jnp.float32(1.0), a)
    s = r_o - b0
    u = f * (s * h).sum(-1)
    q = jnp.cross(s, e1)
    v = f * (r_d * q).sum(-1)
    t = f * (e2 * q).sum(-1)
    valid = ((~parallel) & (u >= 0.0) & (u <= 1.0)
             & (v >= 0.0) & (u + v <= 1.0) & (t > EPS))
    return jnp.where(valid, t, jnp.float32(0.0))


def dense_vpu_closest(v0, v1, v2, r_o, r_d, block):
    """Reference-formula MT broadcast over T-blocks, running min."""

    t_count = v0.shape[0]
    pad = (-t_count) % block
    if pad:
        # Degenerate all-zero triangles are guaranteed misses (det=0).
        z = jnp.zeros((pad, 3), jnp.float32)
        v0, v1, v2 = (jnp.concatenate([a, z]) for a in (v0, v1, v2))
        t_count += pad
    nblk = t_count // block

    def body(best, tri_block):
        b0, b1, b2 = tri_block
        t = _mt_reference(b0[None, :, :], b1[None, :, :], b2[None, :, :],
                          r_o[:, None, :], r_d[:, None, :])
        t = jnp.where(t > 0, t, jnp.inf)
        return jnp.minimum(best, jnp.min(t, axis=1)), None

    blocks = (v0.reshape(nblk, block, 3), v1.reshape(nblk, block, 3),
              v2.reshape(nblk, block, 3))
    best0 = jnp.full((r_o.shape[0],), jnp.inf, jnp.float32)
    best, _ = jax.lax.scan(body, best0, blocks)
    return best


def timeit(fn, reps=5):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


def _scene_tris(name, t_target, rng):
    """Random triangles with scene-like scale (box ~100 units)."""
    v0 = (rng.rand(t_target, 3).astype(np.float32) - 0.5) * 100
    e = (rng.rand(t_target, 2, 3).astype(np.float32) - 0.5) * 6
    return v0, v0 + e[:, 0], v0 + e[:, 1]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}")
    rng = np.random.RandomState(0)
    r = args.rays
    r_o = jnp.asarray((rng.rand(r, 3).astype(np.float32) - 0.5) * 80)
    d = rng.rand(r, 3).astype(np.float32) - 0.5
    r_d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))

    for t_count in (1024, 6400, 15360):
        v0, v1, v2 = _scene_tris("rand", t_count, rng)
        g = jnp.asarray(_tri_features(v0, v1, v2))
        j0, j1, j2 = map(jnp.asarray, (v0, v1, v2))

        mm = jax.jit(functools.partial(dense_matmul_closest, g,
                                       t_count=t_count))
        dt, out_mm = timeit(lambda: mm(r_o, r_d), args.reps)
        per = dt / r
        print(f"  T={t_count:>6} matmul : {dt * 1e3:9.3f} ms -> "
              f"{per * 1e9:7.1f} ns/segment ({1e-6 / per:7.2f} Mrays/s equiv)")

        vp = jax.jit(functools.partial(dense_vpu_closest, j0, j1, j2,
                                       block=512))
        dt, out_vp = timeit(lambda: vp(r_o, r_d), args.reps)
        per = dt / r
        print(f"  T={t_count:>6} vpu    : {dt * 1e3:9.3f} ms -> "
              f"{per * 1e9:7.1f} ns/segment ({1e-6 / per:7.2f} Mrays/s equiv)")

        # Agreement (hit-t where both hit; matmul is ~2^-22 approximate).
        a, b = np.asarray(out_mm), np.asarray(out_vp)
        both = np.isfinite(a) & np.isfinite(b)
        if both.any():
            rel = np.abs(a[both] - b[both]) / np.maximum(b[both], 1e-3)
            print(f"           agree on {both.mean():.3f} of rays, "
                  f"max rel t err {rel.max():.2e}; "
                  f"hit-mask mismatch {(np.isfinite(a) != np.isfinite(b)).mean():.2e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
