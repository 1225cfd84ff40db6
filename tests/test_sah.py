"""SAH builder: same structural invariants and traversal results as
the median builder, fewer node visits on mesh scenes."""

import numpy as np
import jax.numpy as jnp

from tryraytrace_tpu.accel.bvh import build_bvh, pack_traversal_table
from tryraytrace_tpu.ops.traverse import closest_hit_packed


def _random_tris(n, seed=0):
    r = np.random.RandomState(seed)
    base = r.uniform(-10, 10, size=(n, 1, 3)).astype(np.float32)
    tri = base + r.uniform(-1, 1, size=(n, 3, 3)).astype(np.float32)
    return tri[:, 0], tri[:, 1], tri[:, 2]


def test_sah_invariants():
    for n in (1, 2, 9, 100, 333):
        v0, v1, v2 = _random_tris(n, seed=n)
        bvh = build_bvh(v0, v1, v2, method="sah", leaf_size=8)
        m = bvh.num_nodes
        # every primitive slot in exactly one leaf
        slots = []
        for node in np.nonzero(bvh.leaf_count > 0)[0]:
            s = int(bvh.leaf_prim[node])
            slots.extend(range(s, s + int(bvh.leaf_count[node])))
        assert sorted(slots) == list(range(n))
        assert sorted(bvh.perm.tolist()) == list(range(n))
        assert (bvh.leaf_count <= 8).all()
        # preorder: left child = idx + 1; miss links point forward
        internal = np.nonzero(bvh.leaf_count == 0)[0]
        np.testing.assert_array_equal(bvh.left[internal], internal + 1)
        assert (bvh.miss > np.arange(m)).all() and (bvh.miss <= m).all()
        # parent bounds contain children
        for i in internal:
            for c in (bvh.left[i], bvh.right[i]):
                assert (bvh.bounds[i, :3] <= bvh.bounds[c, :3] + 1e-6).all()
                assert (bvh.bounds[i, 3:] >= bvh.bounds[c, 3:] - 1e-6).all()


def test_sah_traversal_matches_brute_force():
    from tryraytrace_tpu.oracle.cpu_renderer import _intersect_brute

    v0, v1, v2 = _random_tris(400, seed=11)
    bvh = build_bvh(v0, v1, v2, method="sah", leaf_size=8)
    pv0, pv1, pv2 = v0[bvh.perm], v1[bvh.perm], v2[bvh.perm]
    table = jnp.asarray(pack_traversal_table(bvh, pv0, pv1, pv2, leaf_size=8))
    r = np.random.RandomState(5)
    o = r.uniform(-12, 12, size=(512, 3)).astype(np.float32)
    d = r.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t, hid = closest_hit_packed(table, 8, jnp.asarray(o),
                                jnp.asarray(d.astype(np.float32)),
                                jnp.ones(512, bool))
    t_ref, _ = _intersect_brute(pv0, pv1, pv2, o, d.astype(np.float32))
    np.testing.assert_allclose(np.asarray(t), t_ref, rtol=1e-5)


def test_sah_fewer_nodes_than_singleton_median():
    v0, v1, v2 = _random_tris(512, seed=2)
    med = build_bvh(v0, v1, v2, method="median", leaf_size=1)
    sah = build_bvh(v0, v1, v2, method="sah", leaf_size=8)
    assert sah.num_nodes < med.num_nodes
