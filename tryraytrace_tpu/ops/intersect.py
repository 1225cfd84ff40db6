"""Moller-Trumbore ray/triangle intersection, vectorized.

Parity target: ``intersect`` (reference renderer.cu:235-268): eps 1e-5
parallel / self-hit guards, returns t > eps on hit else 0.  The CUDA
version early-outs per branch; here every lane computes the full
expression and invalid lanes are masked to 0 -- branch-free VPU code.
"""

from __future__ import annotations

import jax.numpy as jnp

from tryraytrace_tpu.core import vec

EPS = 1e-5


def moller_trumbore(v0, v1, v2, r_o, r_d, xp=jnp):
    """Batched intersection: all args [..., 3]; returns t [...] (0 = miss)."""
    e1 = v1 - v0
    e2 = v2 - v0
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
