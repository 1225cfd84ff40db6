"""Slab-method AABB/ray test, vectorized.

Parity target: AABB::hit (reference aabb.h:49-69).  Boxes are
``float32[..., 6]`` rows (min xyz, max xyz); the caller precomputes
the (safe) inverse ray direction.  Return condition is exactly
``tmax >= tmin && tmax > t_min && tmin < t_max``.
"""

from __future__ import annotations

import jax.numpy as jnp


def aabb_hit(bounds, r_o, r_inv_d, t_min, t_max, xp=jnp):
    """bounds [...,6], r_o/r_inv_d [...,3], t_min/t_max scalar or [...]."""
    t1 = (bounds[..., :3] - r_o) * r_inv_d
    t2 = (bounds[..., 3:] - r_o) * r_inv_d
    lo = xp.minimum(t1, t2).max(axis=-1)
    hi = xp.maximum(t1, t2).min(axis=-1)
    return (hi >= lo) & (hi > t_min) & (lo < t_max)


def aabb_slab(bounds, r_o, r_inv_d, t_min, t_max, xp=jnp):
    """Like aabb_hit but also returns the entry distance ``lo`` --
    the key for front-to-back child ordering in fat-node traversal."""
    t1 = (bounds[..., :3] - r_o) * r_inv_d
    t2 = (bounds[..., 3:] - r_o) * r_inv_d
    lo = xp.minimum(t1, t2).max(axis=-1)
    hi = xp.maximum(t1, t2).min(axis=-1)
    return lo, (hi >= lo) & (hi > t_min) & (lo < t_max)
