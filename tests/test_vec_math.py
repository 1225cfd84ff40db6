import numpy as np
import jax.numpy as jnp

from tryraytrace_tpu.core import vec
from tryraytrace_tpu.ops.intersect import moller_trumbore
from tryraytrace_tpu.ops.aabb import aabb_hit


def test_norm_zero_passthrough():
    a = np.zeros((2, 3), np.float32)
    np.testing.assert_array_equal(vec.norm(a, np), a)


def test_norm_unit_length():
    a = np.array([[3.0, 4.0, 0.0]], np.float32)
    out = vec.norm(a, np)
    np.testing.assert_allclose(out, [[0.6, 0.8, 0.0]], rtol=1e-6)


def test_cross_dot():
    a = np.array([[1, 0, 0]], np.float32)
    b = np.array([[0, 1, 0]], np.float32)
    np.testing.assert_array_equal(vec.cross(a, b, np), [[0, 0, 1]])
    assert vec.dot(a, b, np)[0] == 0


def test_to_int_gamma():
    # toInt(1) = 255, toInt(0) = 0, toInt(0.5) = 186 (common.h:126-128).
    x = np.array([0.0, 0.5, 1.0, 2.0, -1.0], np.float32)
    out = vec.to_int(x, np)
    assert out[0] == 0 and out[2] == 255 and out[3] == 255 and out[4] == 0
    assert out[1] == int(0.5 ** (1 / 2.2) * 255 + 0.5)


def test_safe_inv():
    d = np.array([1e-9, -1e-9, 2.0], np.float32)
    out = vec.safe_inv(d, np)
    np.testing.assert_allclose(out, [1e20, -1e20, 0.5])


def test_moller_trumbore_hit_and_miss():
    v0 = jnp.array([[0, 0, 0]], jnp.float32)
    v1 = jnp.array([[1, 0, 0]], jnp.float32)
    v2 = jnp.array([[0, 1, 0]], jnp.float32)
    o = jnp.array([[0.2, 0.2, -1.0]], jnp.float32)
    d = jnp.array([[0, 0, 1.0]], jnp.float32)
    t = moller_trumbore(v0, v1, v2, o, d)
    np.testing.assert_allclose(np.asarray(t), [1.0], rtol=1e-6)
    # outside barycentric range
    o2 = jnp.array([[0.9, 0.9, -1.0]], jnp.float32)
    assert float(moller_trumbore(v0, v1, v2, o2, d)[0]) == 0.0
    # parallel ray
    d3 = jnp.array([[1.0, 0, 0]], jnp.float32)
    assert float(moller_trumbore(v0, v1, v2, o, d3)[0]) == 0.0
    # behind origin
    o4 = jnp.array([[0.2, 0.2, 1.0]], jnp.float32)
    assert float(moller_trumbore(v0, v1, v2, o4, d)[0]) == 0.0


def test_aabb_hit_basics():
    bounds = jnp.array([[0, 0, 0, 1, 1, 1]], jnp.float32)
    o = jnp.array([[-1, 0.5, 0.5]], jnp.float32)
    # direction ~ (1, 0, 0) -> inverse (1, huge, huge)
    inv = jnp.array([[1.0, 1e9, 1e9]], jnp.float32)
    assert bool(aabb_hit(bounds, o, inv, 0.0, 1e20)[0])
    # box behind t_max
    assert not bool(aabb_hit(bounds, o, inv, 0.0, 0.5)[0])
    # box behind the origin
    o2 = jnp.array([[2.5, 0.5, 0.5]], jnp.float32)
    assert not bool(aabb_hit(bounds, o2, inv, 0.0, 1e20)[0])
    # origin inside the box
    o3 = jnp.array([[0.5, 0.5, 0.5]], jnp.float32)
    assert bool(aabb_hit(bounds, o3, inv, 0.0, 1e20)[0])
