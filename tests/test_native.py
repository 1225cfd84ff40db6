"""Native C++ runtime vs Python fallbacks: identical results.

These tests skip when the extension isn't built (``make -C csrc``);
the framework is fully functional either way -- native is a host-side
performance feature.
"""

import numpy as np
import pytest

from tryraytrace_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_parse_obj_matches_python(tmp_path):
    from tryraytrace_tpu.scene.objloader import _parse_obj_python

    obj = tmp_path / "m.obj"
    obj.write_text(
        "# hdr\nv 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\nvn 1 0 0\n"
        "f 1 2 3\nf 1 2 3 4\nf 1/1 2/2 3/3\nf 1 2 3/9\nf 9 2 3\nf 1 2\n"
        "v 2 bad\n")
    pv, pf = _parse_obj_python(obj)
    nv, nf = native.parse_obj(str(obj))
    np.testing.assert_array_equal(nv, pv)
    np.testing.assert_array_equal(nf, pf)


def test_parse_obj_reference_asset():
    from tryraytrace_tpu.scene.assets import find_asset
    from tryraytrace_tpu.scene.objloader import _parse_obj_python

    path = find_asset("teapot.obj")
    if path is None:
        pytest.skip("reference assets unavailable")
    pv, pf = _parse_obj_python(path)
    nv, nf = native.parse_obj(path)
    np.testing.assert_array_equal(nv, pv)
    np.testing.assert_array_equal(nf, pf)


def test_tonemap_matches_numpy():
    from tryraytrace_tpu.io.snapshot import tonemap_accum

    rng = np.random.RandomState(0)
    accum = (rng.rand(97, 13, 3) * 8.0).astype(np.float32)
    got = native.tonemap(accum, 4)
    want = tonemap_accum(accum, 4)
    # powf vs np.power can differ by 1 ULP at quantization boundaries.
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_tonemap_argb_matches_numpy():
    rng = np.random.RandomState(1)
    accum = (rng.rand(64, 3) * 4.0).astype(np.float32)
    got = native.tonemap_argb(accum, 2)
    avg = accum / 2.0
    from tryraytrace_tpu.core import vec

    rgb = vec.to_int(avg, np).astype(np.uint32)
    want = (np.uint32(255) << 24) | (rgb[:, 0] << 16) | (rgb[:, 1] << 8) | rgb[:, 2]
    diff = got != want
    assert diff.mean() < 0.05  # boundary-ULP disagreements only


def test_bvh_build_matches_python():
    from tryraytrace_tpu.accel.bvh import (_build_python, centroids,
                                           primitive_bounds)

    r = np.random.RandomState(7)
    base = r.uniform(-10, 10, size=(257, 1, 3)).astype(np.float32)
    tri = base + r.uniform(-1, 1, size=(257, 3, 3)).astype(np.float32)
    v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
    pb = primitive_bounds(v0, v1, v2)
    cent = centroids(v0, v1, v2)

    py = _build_python(pb, cent, leaf_size=1)
    res = native.bvh_build(cent, pb)
    assert res is not None
    perm, bounds, leaf_prim, miss, axis, m = res
    assert m == py.num_nodes
    np.testing.assert_array_equal(perm, py.perm)
    np.testing.assert_array_equal(leaf_prim, py.leaf_prim)
    np.testing.assert_array_equal(miss, py.miss)
    np.testing.assert_array_equal(axis, py.axis)
    np.testing.assert_allclose(bounds, py.bounds, rtol=0, atol=0)


def test_build_bvh_uses_native_transparently():
    from tryraytrace_tpu.accel.bvh import build_bvh

    r = np.random.RandomState(3)
    base = r.uniform(-5, 5, size=(64, 1, 3)).astype(np.float32)
    tri = base + r.uniform(-1, 1, size=(64, 3, 3)).astype(np.float32)
    a = build_bvh(tri[:, 0], tri[:, 1], tri[:, 2], use_native=True)
    b = build_bvh(tri[:, 0], tri[:, 1], tri[:, 2], use_native=False)
    np.testing.assert_array_equal(a.perm, b.perm)
    np.testing.assert_array_equal(a.miss, b.miss)
    np.testing.assert_array_equal(a.axis, b.axis)
    np.testing.assert_allclose(a.bounds, b.bounds)


def test_bvh_build_sah_matches_python():
    # The native binned-SAH fat-leaf builder (the PRODUCTION build
    # path) must be bit-identical to the NumPy one: same float32
    # geometry arithmetic (-ffp-contract=off), same float64 cost
    # comparisons, same stable partition and preorder flatten.
    from tryraytrace_tpu.accel.bvh import (_build_sah, centroids,
                                           primitive_bounds)

    r = np.random.RandomState(7)
    cases = []
    for n in (1, 2, 9, 257, 1000):
        base = r.uniform(-10, 10, size=(n, 1, 3)).astype(np.float32)
        cases.append(base + r.uniform(-1, 1, size=(n, 3, 3))
                     .astype(np.float32))
    # Degenerate: identical centroids force the even-split fallback.
    cases.append(np.tile(np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                                  np.float32), (64, 1, 1)))
    for tri in cases:
        v0, v1, v2 = tri[:, 0].copy(), tri[:, 1].copy(), tri[:, 2].copy()
        pb = primitive_bounds(v0, v1, v2)
        cent = centroids(v0, v1, v2)
        py = _build_sah(pb, cent, 8)
        res = native.bvh_build_sah(cent, pb, 8)
        assert res is not None
        perm, bounds, lp, lc, miss, left, right, axis, m = res
        assert m == py.num_nodes
        np.testing.assert_array_equal(perm, py.perm)
        np.testing.assert_array_equal(bounds, py.bounds)
        np.testing.assert_array_equal(lp, py.leaf_prim)
        np.testing.assert_array_equal(lc, py.leaf_count)
        np.testing.assert_array_equal(miss, py.miss)
        np.testing.assert_array_equal(left, py.left)
        np.testing.assert_array_equal(right, py.right)
        np.testing.assert_array_equal(axis, py.axis)


def test_build_bvh_sah_uses_native_transparently():
    from tryraytrace_tpu.accel.bvh import build_bvh

    r = np.random.RandomState(3)
    base = r.uniform(-5, 5, size=(200, 1, 3)).astype(np.float32)
    tri = base + r.uniform(-1, 1, size=(200, 3, 3)).astype(np.float32)
    a = build_bvh(tri[:, 0], tri[:, 1], tri[:, 2], use_native=True,
                  leaf_size=8, method="sah")
    b = build_bvh(tri[:, 0], tri[:, 1], tri[:, 2], use_native=False,
                  leaf_size=8, method="sah")
    np.testing.assert_array_equal(a.perm, b.perm)
    np.testing.assert_array_equal(a.miss, b.miss)
    np.testing.assert_array_equal(a.leaf_count, b.leaf_count)
    np.testing.assert_array_equal(a.bounds, b.bounds)
