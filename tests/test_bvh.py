"""BVH invariants (SURVEY.md section 4): every primitive in exactly one
leaf, parent bounds contain child bounds, preorder layout (left child =
node+1), valid miss links, permutation validity."""

import numpy as np

from tryraytrace_tpu.accel.bvh import build_bvh, primitive_bounds


def _random_tris(n, seed=0):
    r = np.random.RandomState(seed)
    base = r.uniform(-10, 10, size=(n, 1, 3)).astype(np.float32)
    tri = base + r.uniform(-1, 1, size=(n, 3, 3)).astype(np.float32)
    return tri[:, 0], tri[:, 1], tri[:, 2]


def test_structure_invariants():
    for n in (1, 2, 3, 7, 64, 257):
        v0, v1, v2 = _random_tris(n, seed=n)
        bvh = build_bvh(v0, v1, v2)
        m = bvh.num_nodes
        assert m == 2 * n - 1
        # permutation validity
        assert sorted(bvh.perm.tolist()) == list(range(n))
        # exactly n leaves, each holding one distinct primitive slot
        leaves = bvh.leaf_prim[bvh.leaf_prim >= 0]
        assert sorted(leaves.tolist()) == list(range(n))
        # preorder: internal nodes have left == idx + 1
        internal = np.nonzero(bvh.leaf_prim < 0)[0]
        np.testing.assert_array_equal(bvh.left[internal], internal + 1)
        # children in range, right after left
        assert (bvh.right[internal] > bvh.left[internal]).all()
        assert (bvh.right[internal] < m).all()
        # miss links point forward (preorder skip) or to the sentinel
        assert (bvh.miss > np.arange(m)).all()
        assert (bvh.miss <= m).all()


def test_parent_contains_children():
    v0, v1, v2 = _random_tris(100, seed=3)
    bvh = build_bvh(v0, v1, v2)
    internal = np.nonzero(bvh.leaf_prim < 0)[0]
    for i in internal:
        for c in (bvh.left[i], bvh.right[i]):
            assert (bvh.bounds[i, :3] <= bvh.bounds[c, :3] + 1e-6).all()
            assert (bvh.bounds[i, 3:] >= bvh.bounds[c, 3:] - 1e-6).all()


def test_leaf_bounds_contain_primitive():
    v0, v1, v2 = _random_tris(50, seed=4)
    bvh = build_bvh(v0, v1, v2)
    pv0, pv1, pv2 = v0[bvh.perm], v1[bvh.perm], v2[bvh.perm]
    pb = primitive_bounds(pv0, pv1, pv2)
    leaf_nodes = np.nonzero(bvh.leaf_prim >= 0)[0]
    for ln in leaf_nodes:
        p = bvh.leaf_prim[ln]
        np.testing.assert_allclose(bvh.bounds[ln, :3], pb[p, :3], atol=1e-6)
        np.testing.assert_allclose(bvh.bounds[ln, 3:], pb[p, 3:], atol=1e-6)


def test_degenerate_padding():
    # A flat axis gets +-1e-3 padding (bvh.cpp:21-27).
    v0 = np.array([[0, 0, 0]], np.float32)
    v1 = np.array([[1, 0, 0]], np.float32)
    v2 = np.array([[0, 1, 0]], np.float32)
    pb = primitive_bounds(v0, v1, v2)
    assert pb[0, 2] == -1e-3 and pb[0, 5] == 1e-3


def test_miss_link_semantics():
    # The miss link of any node is the next preorder node outside its
    # subtree: walking hit-everything visits 0..m-1 in order.
    v0, v1, v2 = _random_tris(33, seed=5)
    bvh = build_bvh(v0, v1, v2)
    m = bvh.num_nodes
    visited = []
    cur = 0
    while cur < m:
        visited.append(cur)
        cur = cur + 1 if bvh.leaf_prim[cur] < 0 else int(bvh.miss[cur])
    assert visited == list(range(m))
    # Walking miss-everything from the root terminates immediately.
    assert bvh.miss[0] == m


def test_empty_and_single():
    e = build_bvh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32),
                  np.zeros((0, 3), np.float32))
    assert e.num_nodes == 0
    v0, v1, v2 = _random_tris(1)
    b = build_bvh(v0, v1, v2)
    assert b.num_nodes == 1 and b.leaf_prim[0] == 0 and b.miss[0] == 1
