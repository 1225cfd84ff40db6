"""Texture sampling: bilinear filtering with wrap addressing.

TPUs have no texture units, so the reference's hardware sampler setup
(renderer.cu:80-129: wrap addressing, bilinear filter, normalized
float reads, normalized UV) is implemented explicitly as a 4-tap
gather.  The planar projection UV generation reproduces
renderer.cu:463-481 (axis by dominant normal, scale 0.01, V flip).
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_bilinear_wrap(tex, u, v, xp=jnp):
    """Sample tex [H,W,3] at normalized (u, v) [N] -> [N,3].

    Matches CUDA linear filtering: texel centers at (i+0.5)/W, sample
    point x = frac(u)*W - 0.5, wrap integer taps.
    """
    h, w = tex.shape[0], tex.shape[1]
    uf = u - xp.floor(u)
    vf = v - xp.floor(v)
    x = uf * w - 0.5
    y = vf * h - 0.5
    x0 = xp.floor(x)
    y0 = xp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(xp.int32) % w
    y0i = y0.astype(xp.int32) % h
    x1i = (x0i + 1) % w
    y1i = (y0i + 1) % h
    flat = tex.reshape(h * w, tex.shape[2])
    c00 = flat[y0i * w + x0i]
    c10 = flat[y0i * w + x1i]
    c01 = flat[y1i * w + x0i]
    c11 = flat[y1i * w + x1i]
    top = c00 * (1.0 - fx) + c10 * fx
    bot = c01 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def planar_uv(x_hit, n, scale, xp=jnp):
    """Planar-projection UVs from the hit point and face normal.

    renderer.cu:465-476: the projection plane is picked by the
    dominant |normal| axis (y first, then x, else z), coordinates are
    scaled by 0.01 and V is flipped.
    """
    nx = xp.abs(n[..., 0])
    ny = xp.abs(n[..., 1])
    y_dom = ny > 0.9
    x_dom = (~y_dom) & (nx > 0.9)
    u = xp.where(y_dom, x_hit[..., 0],
                 xp.where(x_dom, x_hit[..., 2], x_hit[..., 0]))
    v = xp.where(y_dom, x_hit[..., 2],
                 xp.where(x_dom, x_hit[..., 1], x_hit[..., 1]))
    u = u * scale
    v = 1.0 - v * scale  # V flip (renderer.cu:476)
    return u, v


def interp_uv(uv_row, b1, b2, xp=jnp):
    """Barycentric-interpolated (u, v) from a packed per-corner UV row
    [..., 6] = (u0 v0 u1 v1 u2 v2) -- the trimat TM_UV slice.

    Beyond-reference feature (the reference loader drops ``vt`` lines
    entirely, loader.cpp:61-68).  V is flipped once after
    interpolation: OBJ texture coordinates put v=0 at the image
    bottom while the PPM rows load top-down, matching the planar
    path's V flip convention (renderer.cu:476).
    """
    b0 = 1.0 - b1 - b2
    u = uv_row[..., 0] * b0 + uv_row[..., 2] * b1 + uv_row[..., 4] * b2
    v = uv_row[..., 1] * b0 + uv_row[..., 3] * b1 + uv_row[..., 5] * b2
    return u, 1.0 - v


def sample_textures(textures, tex_id, u, v, xp=jnp):
    """Multiplicative texture factor [N,3] (1 where tex_id < 0) at
    normalized texture coordinates (u, v).

    ``textures`` is a tuple of [H,W,3] arrays (slot k = tex_id k,
    bounded by MAX_TEXTURES=5 like renderer.cu:20).  Texture sizes
    differ, so each slot is sampled for the whole wave and selected by
    mask -- at most 5 gathers, usually 1.
    """
    factor = xp.ones(u.shape + (3,), dtype=xp.float32)
    if not textures:
        return factor
    for k, tex in enumerate(textures):
        texel = sample_bilinear_wrap(tex, u, v, xp)
        factor = xp.where((tex_id == k)[..., None], texel, factor)
    return factor
