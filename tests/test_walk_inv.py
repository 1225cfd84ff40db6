"""_walk_inv must be bit-identical to the two expressions it fused.

The shared TRAVERSE/SHADOW step used to compute
``where(ls3, 1/rd, safe_inv(rd))`` -- two lane-wide divisions.
_walk_inv does it with one; any bitwise deviation would break the
engine-equivalence and golden invariants (CLAUDE.md), so pin it here
on a grid that covers every branch: zeros, subnormals, +-tiny around
the 1e-8 guard, normal values, and huge values, for both lane modes.
"""

import numpy as np
import jax.numpy as jnp

from tryraytrace_tpu.core import vec
from tryraytrace_tpu.engine.persistent import _walk_inv


def _cases():
    vals = np.array(
        [0.0, -0.0, 1e-30, -1e-30, 9.99e-9, -9.99e-9, 1e-8, -1e-8,
         1.0000001e-8, -1.0000001e-8, 2e-8, -2e-8, 0.5, -0.5, 1.0,
         -1.0, 3.7, -3.7, 1e20, -1e20, 1e38, -1e38],
        dtype=np.float32)
    rng = np.random.RandomState(7)
    rand = rng.uniform(-2, 2, 2048).astype(np.float32)
    return np.concatenate([vals, rand])


def test_walk_inv_bit_identical():
    flat = _cases()
    n = (flat.size + 2) // 3
    rd = jnp.asarray(np.resize(flat, (n, 3)))
    for shadow in (False, True):
        ls = jnp.full((n,), shadow)
        ls3 = ls[..., None]
        ref = jnp.where(ls3, 1.0 / rd, vec.safe_inv(rd, jnp))
        got = _walk_inv(ls3, rd)
        ref_b = np.asarray(ref).view(np.uint32)
        got_b = np.asarray(got).view(np.uint32)
        # NaN-safe bitwise compare (1/0 -> inf appears for shadow rd=0)
        assert (ref_b == got_b).all(), (
            np.asarray(rd).reshape(-1, 3)[
                (ref_b != got_b).reshape(n, 3).any(1)])


def test_walk_inv_mixed_lanes():
    flat = _cases()
    n = (flat.size + 2) // 3
    rd = jnp.asarray(np.resize(flat, (n, 3)))
    ls = jnp.asarray((np.arange(n) % 2).astype(bool))
    ls3 = ls[..., None]
    ref = jnp.where(ls3, 1.0 / rd, vec.safe_inv(rd, jnp))
    got = _walk_inv(ls3, rd)
    assert (np.asarray(ref).view(np.uint32)
            == np.asarray(got).view(np.uint32)).all()
