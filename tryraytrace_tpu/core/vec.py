"""SoA float3 math helpers, backend-generic (NumPy or jax.numpy).

The reference's ``Vec`` (common.h:24-97) is an AoS 16-byte-aligned
float3 compiled for host+device.  On TPU the natural layout is SoA:
vectors are arrays of shape ``[..., 3]`` (or three planes) and every
op below is vectorized over the leading axes.  All math is float32.

``toInt`` / ``clamp01`` reproduce common.h:114-128 (gamma 1/2.2
quantization) and live here so image_io and the display pipeline share
one definition, like the reference.
"""

from __future__ import annotations

import numpy as np


def dot(a, b, xp):
    """Batched dot product over the last axis, keepdims=False."""
    return (a * b).sum(axis=-1)


def dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def cross(a, b, xp):
    """Batched cross product over the last axis (common.h:88-90)."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return xp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def norm(a, xp):
    """Normalize over the last axis; zero vectors pass through unchanged
    (matches Vec::norm's ``if (len > 0)`` guard, common.h:70-76)."""
    len_sq = (a * a).sum(axis=-1, keepdims=True)
    length = xp.sqrt(len_sq)
    inv = xp.where(length > 0, 1.0 / xp.where(length > 0, length, 1.0), 1.0)
    return (a * inv).astype(a.dtype)


def length(a, xp):
    return xp.sqrt((a * a).sum(axis=-1))


def clamp01(x, xp):
    """clamp to [0,1] (common.h:114)."""
    return xp.clip(x, 0.0, 1.0)


GAMMA_EXP = np.float32(1.0 / 2.2)


def to_int(x, xp):
    """Linear float -> gamma-corrected 0..255 int (common.h:126-128)."""
    return (xp.power(clamp01(x, xp), GAMMA_EXP) * 255.0 + 0.5).astype(xp.int32)


def safe_inv(d, xp):
    """Safe reciprocal of a ray direction, sign-preserving at ~0.

    Reference renderer.cu:371-373: |x| < 1e-8 -> +-1e20, else 1/x.
    """
    tiny = xp.abs(d) < 1e-8
    big = xp.where(d >= 0, xp.float32(1e20), xp.float32(-1e20))
    return xp.where(tiny, big, 1.0 / xp.where(tiny, xp.float32(1.0), d))
