"""Counter-based random number generation.

The reference uses cuRAND with ``curand_init(1984 + frame, pixel, 0)``
(renderer.cu:325-326): one sequential generator per pixel per frame.
Sequential per-lane RNG state is hostile to a wavefront design (state
would have to be carried through compaction and branch masking), so we
replace it with a *counter-based* hash RNG: every draw is a pure
function ``u = U(seed, stream, draw_id)`` of

  - ``seed``    : frame/sample seed (uint32),
  - ``stream``  : pixel index (uint32),
  - ``draw_id`` : a fixed per-bounce slot layout (see DrawLayout).

This makes frames bit-reproducible, order-independent and identical
between the NumPy oracle and the JAX engine -- every backend computes
the exact same uint32s.  The hash is the public-domain PCG hash
(O'Neill; popularized for GPU rendering by Jarzynski & Olano,
"Hash Functions for GPU Rendering", JCGT 2020).

The same generator is exposed inside Pallas kernels by computing the
identical integer ops on the VPU (no pltpu.prng needed -- keeps the
oracle/TPU parity exact).
"""

from __future__ import annotations

import numpy as np

# Draw-slot layout
# ----------------
# Each path gets a fixed budget of draw ids so that every backend and
# every branch consumes the same addresses (branches are exclusive, so
# reusing slots across branches is sound and keeps the layout dense).
#
# camera (draws 0..3):             reference renderer.cu:331-347
#   0: AA tent r1      1: AA tent r2
#   2: lens radius     3: lens theta
# per bounce b (base = CAMERA_DRAWS + b * DRAWS_PER_BOUNCE):
#   +0: russian roulette           renderer.cu:563
#   +1: branch select              renderer.cu:567
#   +2: direction sample r1        (spec perturb / refr perturb / hemi)
#   +3: direction sample r2
#   +4: NEE light pick             renderer.cu:659
#   +5: NEE triangle sample r1     renderer.cu:663
#   +6: NEE triangle sample r2
CAMERA_DRAWS = 4
DRAWS_PER_BOUNCE = 8
SLOT_RR = 0
SLOT_BRANCH = 1
SLOT_DIR_R1 = 2
SLOT_DIR_R2 = 3
SLOT_LIGHT_PICK = 4
SLOT_LIGHT_R1 = 5
SLOT_LIGHT_R2 = 6

_INV_2_24 = np.float32(1.0 / 16777216.0)


def pcg(x, xp):
    """PCG output permutation hash on uint32 values (vectorized)."""
    x = x.astype(xp.uint32) if hasattr(x, "astype") else xp.uint32(x)
    state = x * xp.uint32(747796405) + xp.uint32(2891336453)
    word = ((state >> ((state >> xp.uint32(28)) + xp.uint32(4))) ^ state) * xp.uint32(277803737)
    return (word >> xp.uint32(22)) ^ word


def hash3(a, b, c, xp):
    """Mix three uint32 streams into one hash value."""
    a = _as_u32(a, xp)
    b = _as_u32(b, xp)
    c = _as_u32(c, xp)
    return pcg(a + pcg(b + pcg(c, xp), xp), xp)


def _as_u32(v, xp):
    if hasattr(v, "astype"):
        return v.astype(xp.uint32)
    return xp.uint32(np.uint32(v & 0xFFFFFFFF) if isinstance(v, int) else v)


def uniform(seed, stream, draw_id, xp):
    """U(seed, stream, draw_id) -> float32 uniform in [0, 1).

    Uses the top 24 bits of the hash so the float32 mantissa is exact.
    """
    if xp is np:
        # uint32 wraparound is the point of the hash; silence NumPy's
        # scalar-overflow warnings (JAX wraps silently by spec).
        with np.errstate(over="ignore"):
            bits = hash3(seed, stream, draw_id, xp)
            return (bits >> xp.uint32(8)).astype(xp.float32) * _INV_2_24
    bits = hash3(seed, stream, draw_id, xp)
    return (bits >> xp.uint32(8)).astype(xp.float32) * _INV_2_24


def sample_seed(frame_seed, spp: int, sample, xp=None):
    """Distinct RNG seed for sample ``sample`` of frame ``frame_seed``:
    ``1984 + frame*spp + sample`` with uint32 wraparound.

    The reference advances the cuRAND seed by the frame counter
    (renderer.cu:326); the in-frame sample index is folded in so
    spp > 1 per launch keeps distinct streams.  This is THE seed
    schedule: every engine and the oracle must use this one function
    (bit-identical streams are what golden tests and sharded vs
    single-chip equality rest on).  With ``xp`` (jnp or np) the
    inputs may be traced/array values.
    """
    if xp is None:
        return (1984 + frame_seed * spp + sample) & 0xFFFFFFFF
    return (xp.uint32(1984) + _as_u32(frame_seed, xp) * xp.uint32(spp)
            + _as_u32(sample, xp))
