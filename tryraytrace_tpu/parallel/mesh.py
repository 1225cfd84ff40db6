"""Device mesh construction for multi-chip rendering.

The reference is strictly single-GPU/single-process (SURVEY.md
section 5: no MPI/NCCL anywhere); its only parallel axes are SIMT
threads over pixels and the frame counter over time.  The TPU-native
scaling model maps those axes onto a 2-D ``jax.sharding.Mesh``:

  - ``dp`` (tile parallel): the image's pixel rows are sharded; the
    scene/BVH is replicated, so tracing needs *zero* cross-chip
    traffic -- the embarrassingly-parallel axis rides free.
  - ``sp`` (sample parallel): independent RNG sample streams per
    chip, combined with one ``psum`` over the accumulator -- the only
    collective in the frame, riding ICI.

Both axes compose (e.g. a v5e-8 as 4x2).  DCN enters only if a mesh
spans hosts, which JAX handles through the same API.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

TILE_AXIS = "dp"
SAMPLE_AXIS = "sp"


def make_mesh(devices=None, tile: int | None = None,
              sample: int | None = None) -> Mesh:
    """Build a (dp, sp) mesh over ``devices`` (default: all).

    With no explicit split, all devices go to the tile axis (the
    zero-communication layout).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if tile is None and sample is None:
        tile, sample = n, 1
    elif tile is None:
        tile = n // sample
    elif sample is None:
        sample = n // tile
    if tile * sample != n:
        raise ValueError(f"mesh {tile}x{sample} != {n} devices")
    arr = np.asarray(devices).reshape(tile, sample)
    return Mesh(arr, (TILE_AXIS, SAMPLE_AXIS))
