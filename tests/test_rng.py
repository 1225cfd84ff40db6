"""The counter-based RNG must be bit-identical across backends -- that
is the foundation of oracle/TPU golden-image comparability."""

import numpy as np
import jax.numpy as jnp

from tryraytrace_tpu.core import rng


def test_cross_backend_bit_identical():
    pix = np.arange(4096, dtype=np.uint32)
    for seed in (0, 1984, 123456789):
        for draw in (0, 7, 31):
            a = rng.uniform(np.uint32(seed), pix, np.uint32(draw), np)
            b = np.asarray(rng.uniform(jnp.uint32(seed), jnp.asarray(pix),
                                       jnp.uint32(draw), jnp))
            np.testing.assert_array_equal(a, b)


def test_signed_int_inputs_match_unsigned():
    pix_i = np.arange(100, dtype=np.int32)
    pix_u = np.arange(100, dtype=np.uint32)
    a = rng.uniform(np.uint32(7), pix_i, np.uint32(3), np)
    b = rng.uniform(np.uint32(7), pix_u, np.uint32(3), np)
    np.testing.assert_array_equal(a, b)


def test_range_and_distribution():
    pix = np.arange(200_000, dtype=np.uint32)
    u = rng.uniform(np.uint32(42), pix, np.uint32(5), np)
    assert u.dtype == np.float32
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 5e-3
    assert abs(u.var() - 1 / 12) < 5e-3


def test_streams_decorrelated():
    pix = np.arange(10_000, dtype=np.uint32)
    a = rng.uniform(np.uint32(1), pix, np.uint32(0), np)
    b = rng.uniform(np.uint32(1), pix, np.uint32(1), np)
    c = rng.uniform(np.uint32(2), pix, np.uint32(0), np)
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.05
    assert abs(np.corrcoef(a, c)[0, 1]) < 0.05


def test_deterministic():
    pix = np.arange(16, dtype=np.uint32)
    a = rng.uniform(np.uint32(9), pix, np.uint32(2), np)
    b = rng.uniform(np.uint32(9), pix, np.uint32(2), np)
    np.testing.assert_array_equal(a, b)
