"""Moller-Trumbore ray/triangle intersection, vectorized.

Parity target: ``intersect`` (reference renderer.cu:235-268): eps 1e-5
parallel / self-hit guards, returns t > eps on hit else 0.  The CUDA
version early-outs per branch; here every lane computes the full
expression and invalid lanes are masked to 0 -- branch-free VPU code.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tryraytrace_tpu.core import vec

EPS = 1e-5

# Per-slot leaf storage strides: single-sourced in accel/bvh.py (the
# no-jax builder module) so pack widths and decode offsets can never
# disagree; re-exported here for the ops-side decode call sites.
from tryraytrace_tpu.accel.bvh import LEAF_STRIDE  # noqa: E402


def moller_trumbore(v0, v1, v2, r_o, r_d, xp=jnp):
    """Batched intersection: all args [..., 3]; returns t [...] (0 = miss)."""
    return moller_trumbore_pre(v0, v1 - v0, v2 - v0, r_o, r_d, xp)


def moller_trumbore_pre(v0, e1, e2, r_o, r_d, xp=jnp):
    """MT with precomputed edges e1 = v1 - v0, e2 = v2 - v0.

    Bit-identical to ``moller_trumbore`` (IEEE f32 subtraction is
    exact and deterministic, so edges computed at pack time equal
    edges computed in-step); packed leaf rows store (v0, e1, e2) so
    the hot loop skips 6 subtractions per triangle slot.  A zero
    (v0, e1, e2) slot is degenerate: a == 0 -> parallel -> miss,
    which is what makes pad slots self-masking."""
    h = vec.cross(r_d, e2, xp)
    a = vec.dot(e1, h, xp)
    parallel = xp.abs(a) < EPS
    f = 1.0 / xp.where(parallel, xp.float32(1.0), a)
    s = r_o - v0
    u = f * vec.dot(s, h, xp)
    q = vec.cross(s, e1, xp)
    v = f * vec.dot(r_d, q, xp)
    t = f * vec.dot(e2, q, xp)
    valid = (
        (~parallel)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t > EPS)
    )
    return xp.where(valid, t, xp.float32(0.0))


def baldwin_rows(v0, v1, v2) -> np.ndarray:
    """Pack-time Baldwin-Weber transform rows [T, 12]: (n, v0, bu, bv).

    n = e1 x e2 (unnormalized -- |n.d| equals Moller-Trumbore's |a|
    exactly in real arithmetic, so the 1e-5 parallel guard keeps its
    reference scale, renderer.cu:235-268); bu/bv are the barycentric
    gradient rows with dot(bu, e1) = 1, dot(bu, e2) = 0 (and the
    transpose for bv), divided out in float64 at pack time.  Degenerate
    triangles (|n| = 0) pack as all-zero rows, which the intersector
    rejects via the parallel guard -- the same self-masking contract as
    the zero (v0, e1, e2) pad slots."""
    e1 = (v1 - v0).astype(np.float64)
    e2 = (v2 - v0).astype(np.float64)
    n = np.cross(e1, e2)
    nn = (n * n).sum(-1, keepdims=True)
    safe = np.where(nn > 0, nn, 1.0)
    rows = np.concatenate([n, v0.astype(np.float64),
                           np.cross(e2, n) / safe,
                           np.cross(n, e1) / safe], axis=-1)
    return np.where(nn > 0, rows, 0.0).astype(np.float32)


def baldwin_intersect(rows, r_o, r_d, xp=jnp):
    """Precomputed-transform intersection: rows [..., 12] from
    ``baldwin_rows``; returns t [...] (0 = miss).

    Decision structure mirrors ``moller_trumbore``: the parallel guard
    tests |n.d| (= |a|) against the same 1e-5, the barycentric bounds
    are u >= 0, v >= 0, u + v <= 1, and the hit window is t > 1e-5.
    Everything is evaluated v0-relative (s = o - v0 first), keeping
    MT's cancellation behavior on large scene coordinates -- unlike
    the textbook absolute-plane form.  ~50 VPU ops per slot vs MT's
    ~72: one 3-vector subtract, three dot products and one fma-vector
    replace MT's two cross products and three dots."""
    n_ = rows[..., 0:3]
    v0 = rows[..., 3:6]
    bu = rows[..., 6:9]
    bv = rows[..., 9:12]
    nd = vec.dot(n_, r_d, xp)
    parallel = xp.abs(nd) < EPS
    f = 1.0 / xp.where(parallel, xp.float32(1.0), nd)
    s = r_o - v0
    t = -f * vec.dot(n_, s, xp)
    p = s + t[..., None] * r_d
    u = vec.dot(bu, p, xp)
    v = vec.dot(bv, p, xp)
    valid = (
        (~parallel)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > EPS)
    )
    return xp.where(valid, t, xp.float32(0.0))
