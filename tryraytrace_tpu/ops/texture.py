"""Texture sampling: bilinear filtering with wrap addressing.

TPUs have no texture units, so the reference's hardware sampler setup
(renderer.cu:80-129: wrap addressing, bilinear filter, normalized
float reads, normalized UV) is implemented explicitly as a 4-tap
gather.  The planar projection UV generation reproduces
renderer.cu:463-481 (axis by dominant normal, scale 0.01, V flip).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Tiled-texture gather rows (persistent engine inline shading): the
# texture is cut into TEX_TILE x TEX_TILE base tiles, each stored as a
# (TEX_TILE+1)^2-texel row with a one-texel wrap apron on the right and
# bottom, so ANY bilinear 2x2 footprint whose lower tap falls inside
# the base tile is served by ONE row fetch from the engine's unified
# gather table (docs/PERFORMANCE.md: the per-step row gather is the
# scarce resource; its width is free to >= 112 f32).
TEX_TILE = 4
TEX_APRON = TEX_TILE + 1
TEX_ROW = TEX_APRON * TEX_APRON * 3  # 75 f32 per tile row


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


def build_texture_tiles(textures, xp=jnp):
    """Pack ``textures`` (tuple of [H,W,3]) into tiled gather rows.

    Returns (rows [R, TEX_ROW], metas, R) where metas[k] =
    {offset, tiles_x, w, h} locates texture k's tile grid inside the
    row block.  Tile (ty, tx) of texture k is row
    ``offset + ty*tiles_x + tx`` and holds texels
    (TEX_TILE*ty + i) % H x (TEX_TILE*tx + j) % W for i, j in
    [0, TEX_APRON) in [py][px][rgb] order -- the wrap happens here at
    build time, so tile_bilinear needs no modular arithmetic.
    """
    rows, metas, off = [], [], 0
    for tex in textures:
        h, w = int(tex.shape[0]), int(tex.shape[1])
        tx = -(-w // TEX_TILE)
        ty = -(-h // TEX_TILE)
        gy = (np.arange(ty, dtype=np.int64)[:, None] * TEX_TILE
              + np.arange(TEX_APRON, dtype=np.int64)[None, :]) % h
        gx = (np.arange(tx, dtype=np.int64)[:, None] * TEX_TILE
              + np.arange(TEX_APRON, dtype=np.int64)[None, :]) % w
        idx = gy[:, None, :, None] * w + gx[None, :, None, :]
        flat = tex.reshape(h * w, 3)
        rows.append(flat[idx.reshape(-1)].reshape(ty * tx, TEX_ROW))
        metas.append(dict(offset=off, tiles_x=tx, w=w, h=h))
        off += ty * tx
    return xp.concatenate(rows, axis=0), metas, off


def num_texture_tiles(textures) -> int:
    """Row count build_texture_tiles would produce (for budget gates,
    without touching device memory)."""
    return sum((-(-int(t.shape[1]) // TEX_TILE))
               * (-(-int(t.shape[0]) // TEX_TILE)) for t in textures)


def tile_coords(textures, metas, tex_id, u, v, xp=jnp):
    """Per-lane (tile_row, offx, offy, fx, fy) addressing the tiled
    rows of build_texture_tiles, with tap arithmetic identical to
    sample_bilinear_wrap (texel centers at (i+0.5)/W, wrap) so
    tile_bilinear reproduces its result bit for bit.  Lanes whose
    tex_id matches no texture get row 0 / zero weights (callers must
    not select them)."""
    zi = xp.zeros_like(tex_id)
    zf = xp.zeros_like(u)
    trow, offx, offy, fx, fy = zi, zi, zi, zf, zf
    for k, m in enumerate(metas):
        h, w = m["h"], m["w"]
        x = (u - xp.floor(u)) * w - 0.5
        y = (v - xp.floor(v)) * h - 0.5
        x0 = xp.floor(x)
        y0 = xp.floor(y)
        x0i = x0.astype(xp.int32) % w
        y0i = y0.astype(xp.int32) % h
        tx = x0i // TEX_TILE
        ty = y0i // TEX_TILE
        sel = tex_id == k
        trow = xp.where(sel, m["offset"] + ty * m["tiles_x"] + tx, trow)
        offx = xp.where(sel, x0i - tx * TEX_TILE, offx)
        offy = xp.where(sel, y0i - ty * TEX_TILE, offy)
        fx = xp.where(sel, x - x0, fx)
        fy = xp.where(sel, y - y0, fy)
    return trow, offx, offy, fx, fy


def tile_bilinear(row, offx, offy, fx, fy, xp=jnp):
    """Bilinear sample from gathered tile rows [N, >=TEX_ROW] (one row
    per lane, fetched through the engine's unified gather table).

    The four taps are extracted by one-hot select over the 5x5 apron
    grid (exact -- a single nonzero term per sum; per-lane dynamic
    indexing would be a second gather) and combined with the same
    top/bottom lerp association as sample_bilinear_wrap, so the result
    is bit-identical to the 4-tap path."""
    r = row[:, :TEX_ROW].reshape(-1, TEX_APRON, TEX_APRON, 3)
    i5 = xp.arange(TEX_APRON, dtype=offx.dtype)
    py0 = i5[None, :] == offy[:, None]
    py1 = i5[None, :] == (offy + 1)[:, None]
    px0 = i5[None, :] == offx[:, None]
    px1 = i5[None, :] == (offx + 1)[:, None]

    def tap(py, px):
        sel = (py[:, :, None] & px[:, None, :])[..., None]
        return (r * sel).sum(axis=(1, 2))

    c00, c10 = tap(py0, px0), tap(py0, px1)
    c01, c11 = tap(py1, px0), tap(py1, px1)
    fx3 = fx[..., None]
    fy3 = fy[..., None]
    top = c00 * (1.0 - fx3) + c10 * fx3
    bot = c01 * (1.0 - fx3) + c11 * fx3
    return top * (1.0 - fy3) + bot * fy3


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
