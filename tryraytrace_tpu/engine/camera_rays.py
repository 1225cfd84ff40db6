"""Primary ray generation: tent-filter AA + thin-lens depth of field.

Parity target: the ray-gen block of the megakernel
(reference renderer.cu:331-356).  One wave = all pixels of the frame;
pixel ``i`` is the reference's accumulation-buffer index
``i = (height - y - 1) * width + x`` (renderer.cu:322), i.e. row 0 of
the wave is the *top* image row, and ``i`` is also the RNG stream id
(cuRAND sequence = pixel, renderer.cu:326 -- here the hash stream).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tryraytrace_tpu.core import rng, vec

TWO_PI = np.float32(2.0 * np.pi)


def generate_rays(cam, width: int, height: int, seed, pixel_idx, xp=jnp):
    """Primary rays for pixel indices ``pixel_idx`` [N] -> (o, d) [N,3].

    ``seed`` is the per-sample RNG seed (uint32).  All draws use the
    fixed camera slots 0..3 (core/rng.py).
    """
    i = pixel_idx
    x = (i % width).astype(xp.float32)
    row = i // width
    y = (height - 1 - row).astype(xp.float32)  # buffer row -> "up" index

    u0 = rng.uniform(seed, i, 0, xp)
    u1 = rng.uniform(seed, i, 1, xp)
    u2 = rng.uniform(seed, i, 2, xp)
    u3 = rng.uniform(seed, i, 3, xp)

    # Tent-filter anti-aliasing jitter (renderer.cu:331-334).
    r1 = 2.0 * u0
    r2 = 2.0 * u1
    dx = xp.where(r1 < 1.0, xp.sqrt(r1) - 1.0, 1.0 - xp.sqrt(xp.maximum(2.0 - r1, 0.0)))
    dy = xp.where(r2 < 1.0, xp.sqrt(r2) - 1.0, 1.0 - xp.sqrt(xp.maximum(2.0 - r2, 0.0)))

    # Ideal pinhole direction (renderer.cu:337-338).
    sx = ((x + 0.5 + dx) / width - 0.5)[..., None]
    sy = ((y + 0.5 + dy) / height - 0.5)[..., None]
    dir_pinhole = vec.norm(cam.cx * sx + cam.cy * sy + cam.dir, xp)

    # Thin-lens sampling (renderer.cu:341-348).  When lens_radius == 0
    # the offset is exactly zero, matching the reference's skipped
    # branch (fixed-slot RNG makes the draw-count difference moot).
    lr = cam.lens_radius * xp.sqrt(u2)
    ltheta = TWO_PI * u3
    u_axis = vec.norm(cam.cx[None, :], xp)[0]
    v_axis = vec.norm(cam.cy[None, :], xp)[0]
    lens_offset = (
        u_axis * (lr * xp.cos(ltheta))[..., None]
        + v_axis * (lr * xp.sin(ltheta))[..., None]
    )

    # Focus-plane construction (renderer.cu:350-356).
    p_focus = cam.pos + dir_pinhole * cam.focus_dist
    r_o = cam.pos + lens_offset
    r_d = vec.norm(p_focus - r_o, xp)
    return r_o.astype(xp.float32), r_d.astype(xp.float32)
