"""Threaded-BVH traversal must agree with brute-force intersection on
random scenes -- the core correctness check for the TPU-first
stackless design."""

import numpy as np
import jax.numpy as jnp

from tryraytrace_tpu.accel.bvh import build_bvh
from tryraytrace_tpu.ops.traverse import any_hit, closest_hit


def _random_scene(n_tris, seed):
    r = np.random.RandomState(seed)
    base = r.uniform(-5, 5, size=(n_tris, 1, 3)).astype(np.float32)
    tri = base + r.uniform(-0.8, 0.8, size=(n_tris, 3, 3)).astype(np.float32)
    return tri[:, 0], tri[:, 1], tri[:, 2]


def _random_rays(n_rays, seed):
    r = np.random.RandomState(seed + 1000)
    o = r.uniform(-8, 8, size=(n_rays, 3)).astype(np.float32)
    d = r.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d.astype(np.float32)


def _brute_closest(v0, v1, v2, o, d):
    from tryraytrace_tpu.oracle.cpu_renderer import _intersect_brute

    return _intersect_brute(v0, v1, v2, o, d)


def test_closest_hit_matches_brute_force():
    for seed, n_tris in ((0, 5), (1, 33), (2, 128), (3, 501)):
        v0, v1, v2 = _random_scene(n_tris, seed)
        bvh = build_bvh(v0, v1, v2)
        pv0, pv1, pv2 = v0[bvh.perm], v1[bvh.perm], v2[bvh.perm]
        o, d = _random_rays(256, seed)
        t, hid = closest_hit(
            jnp.asarray(bvh.bounds), jnp.asarray(bvh.leaf_prim),
            jnp.asarray(bvh.miss), jnp.asarray(pv0), jnp.asarray(pv1),
            jnp.asarray(pv2), jnp.asarray(o), jnp.asarray(d),
            jnp.ones(o.shape[0], bool),
        )
        t_ref, hid_ref = _brute_closest(pv0, pv1, pv2, o, d)
        np.testing.assert_allclose(np.asarray(t), t_ref, rtol=1e-5)
        # the winning primitive can differ only on exact-t ties
        mismatch = np.asarray(hid) != hid_ref
        assert mismatch.mean() < 0.01


def test_inactive_rays_miss():
    v0, v1, v2 = _random_scene(16, 7)
    bvh = build_bvh(v0, v1, v2)
    pv0, pv1, pv2 = v0[bvh.perm], v1[bvh.perm], v2[bvh.perm]
    o, d = _random_rays(32, 7)
    active = np.zeros(32, bool)
    t, hid = closest_hit(
        jnp.asarray(bvh.bounds), jnp.asarray(bvh.leaf_prim),
        jnp.asarray(bvh.miss), jnp.asarray(pv0), jnp.asarray(pv1),
        jnp.asarray(pv2), jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(active),
    )
    assert (np.asarray(hid) == -1).all()
    assert (np.asarray(t) == 1e20).all()


def test_any_hit_matches_brute_force():
    from tryraytrace_tpu.oracle.cpu_renderer import _occluded_brute

    for seed, n_tris in ((0, 17), (1, 99)):
        v0, v1, v2 = _random_scene(n_tris, seed)
        bvh = build_bvh(v0, v1, v2)
        pv0, pv1, pv2 = v0[bvh.perm], v1[bvh.perm], v2[bvh.perm]
        o, d = _random_rays(256, seed + 50)
        max_dist = np.full(256, 6.0, np.float32)
        occ = any_hit(
            jnp.asarray(bvh.bounds), jnp.asarray(bvh.leaf_prim),
            jnp.asarray(bvh.miss), jnp.asarray(pv0), jnp.asarray(pv1),
            jnp.asarray(pv2), jnp.asarray(o), jnp.asarray(d),
            jnp.asarray(max_dist), jnp.ones(256, bool),
        )
        occ_ref = _occluded_brute(pv0, pv1, pv2, o, d, max_dist,
                                  np.ones(256, bool))
        np.testing.assert_array_equal(np.asarray(occ), occ_ref)


def test_tmax_pruning_correct_under_occlusion():
    # A wall of near tris in front of far tris: pruning must still
    # return the true nearest.
    v0 = np.array([[-1, -1, 1], [-1, -1, 2]], np.float32)
    v1 = np.array([[1, -1, 1], [1, -1, 2]], np.float32)
    v2 = np.array([[0, 1, 1], [0, 1, 2]], np.float32)
    bvh = build_bvh(v0, v1, v2)
    pv0, pv1, pv2 = v0[bvh.perm], v1[bvh.perm], v2[bvh.perm]
    o = np.array([[0, 0, 0]], np.float32)
    d = np.array([[0, 0, 1]], np.float32)
    t, hid = closest_hit(
        jnp.asarray(bvh.bounds), jnp.asarray(bvh.leaf_prim),
        jnp.asarray(bvh.miss), jnp.asarray(pv0), jnp.asarray(pv1),
        jnp.asarray(pv2), jnp.asarray(o), jnp.asarray(d),
        jnp.ones(1, bool),
    )
    assert abs(float(t[0]) - 1.0) < 1e-6
    assert float(pv0[int(hid[0])][2]) == 1.0


def test_fatnode_closest_matches_brute_force():
    from tryraytrace_tpu.accel.bvh import build_bvh, pack_fatnode_table
    from tryraytrace_tpu.ops.traverse import closest_hit_fatnode

    for seed, n_tris in ((0, 5), (1, 33), (2, 128), (3, 501)):
        for method, K in (("median", 1), ("sah", 8)):
            v0, v1, v2 = _random_scene(n_tris, seed)
            bvh = build_bvh(v0, v1, v2, method=method, leaf_size=K)
            pv0, pv1, pv2 = v0[bvh.perm], v1[bvh.perm], v2[bvh.perm]
            table = jnp.asarray(pack_fatnode_table(bvh, pv0, pv1, pv2,
                                                   leaf_size=K))
            o, d = _random_rays(256, seed)
            t, hid = closest_hit_fatnode(table, K, jnp.asarray(o),
                                         jnp.asarray(d),
                                         jnp.ones(256, bool))
            t_ref, _ = _brute_closest(pv0, pv1, pv2, o, d)
            np.testing.assert_allclose(np.asarray(t), t_ref, rtol=1e-5)


def test_fatnode_any_hit_matches_brute_force():
    from tryraytrace_tpu.accel.bvh import build_bvh, pack_fatnode_table
    from tryraytrace_tpu.ops.traverse import any_hit_fatnode
    from tryraytrace_tpu.oracle.cpu_renderer import _occluded_brute

    for seed, n_tris in ((0, 17), (1, 99)):
        v0, v1, v2 = _random_scene(n_tris, seed)
        bvh = build_bvh(v0, v1, v2, method="sah", leaf_size=8)
        pv0, pv1, pv2 = v0[bvh.perm], v1[bvh.perm], v2[bvh.perm]
        table = jnp.asarray(pack_fatnode_table(bvh, pv0, pv1, pv2,
                                               leaf_size=8))
        o, d = _random_rays(256, seed + 50)
        max_dist = np.full(256, 6.0, np.float32)
        occ = any_hit_fatnode(table, 8, jnp.asarray(o), jnp.asarray(d),
                              jnp.asarray(max_dist), jnp.ones(256, bool))
        occ_ref = _occluded_brute(pv0, pv1, pv2, o, d, max_dist,
                                  np.ones(256, bool))
        np.testing.assert_array_equal(np.asarray(occ), occ_ref)


def test_pair_closest_matches_threaded_exactly():
    """The pair walk must return bit-identical (t, prim) to the
    threaded walk -- same windows, same strict-< update, and the skip
    register only elides gathers that containment proves fruitless."""
    from tryraytrace_tpu.accel.bvh import pack_pair_table, pack_traversal_table
    from tryraytrace_tpu.ops.traverse import closest_hit_packed, closest_hit_pair

    for seed, n_tris in ((0, 5), (1, 33), (2, 128), (3, 501)):
        for method, K in (("median", 1), ("sah", 8)):
            v0, v1, v2 = _random_scene(n_tris, seed)
            bvh = build_bvh(v0, v1, v2, method=method, leaf_size=K)
            pv0, pv1, pv2 = v0[bvh.perm], v1[bvh.perm], v2[bvh.perm]
            kk = int(max(1, bvh.leaf_count.max()))
            tp = jnp.asarray(pack_pair_table(bvh, pv0, pv1, pv2, leaf_size=kk))
            tc = jnp.asarray(pack_traversal_table(bvh, pv0, pv1, pv2,
                                                  leaf_size=kk))
            o, d = _random_rays(256, seed)
            act = jnp.ones(256, bool)
            t_ref, hid_ref = closest_hit_packed(tc, kk, jnp.asarray(o),
                                                jnp.asarray(d), act)
            t, hid = closest_hit_pair(tp, kk, jnp.asarray(o),
                                      jnp.asarray(d), act)
            np.testing.assert_array_equal(np.asarray(t), np.asarray(t_ref))
            np.testing.assert_array_equal(np.asarray(hid),
                                          np.asarray(hid_ref))
            t_bf, _ = _brute_closest(pv0, pv1, pv2, o, d)
            np.testing.assert_allclose(np.asarray(t), t_bf, rtol=1e-5)


def test_pair_any_hit_matches_brute_force():
    from tryraytrace_tpu.accel.bvh import pack_pair_table
    from tryraytrace_tpu.ops.traverse import any_hit_pair
    from tryraytrace_tpu.oracle.cpu_renderer import _occluded_brute

    for seed, n_tris in ((0, 17), (1, 99)):
        v0, v1, v2 = _random_scene(n_tris, seed)
        bvh = build_bvh(v0, v1, v2, method="sah", leaf_size=8)
        pv0, pv1, pv2 = v0[bvh.perm], v1[bvh.perm], v2[bvh.perm]
        table = jnp.asarray(pack_pair_table(bvh, pv0, pv1, pv2,
                                            leaf_size=8))
        o, d = _random_rays(256, seed + 50)
        max_dist = np.full(256, 6.0, np.float32)
        occ = any_hit_pair(table, 8, jnp.asarray(o), jnp.asarray(d),
                           jnp.asarray(max_dist), jnp.ones(256, bool))
        occ_ref = _occluded_brute(pv0, pv1, pv2, o, d, max_dist,
                                  np.ones(256, bool))
        np.testing.assert_array_equal(np.asarray(occ), occ_ref)


def test_quad_closest_matches_threaded_exactly():
    """The quad walk (4-wide collapsed rows, 3-slot skip file) must
    return bit-identical (t, prim) to the threaded walk: same windows,
    same strict-< update; skipped/absorbed entries are only ones
    containment proves fruitless."""
    from tryraytrace_tpu.accel.bvh import pack_quad_table, pack_traversal_table
    from tryraytrace_tpu.ops.traverse import closest_hit_packed, closest_hit_quad

    for seed, n_tris in ((0, 5), (1, 33), (2, 128), (3, 501)):
        for method, K in (("median", 1), ("sah", 8)):
            v0, v1, v2 = _random_scene(n_tris, seed)
            bvh = build_bvh(v0, v1, v2, method=method, leaf_size=K)
            pv0, pv1, pv2 = v0[bvh.perm], v1[bvh.perm], v2[bvh.perm]
            kk = int(max(1, bvh.leaf_count.max()))
            tq = jnp.asarray(pack_quad_table(bvh, pv0, pv1, pv2, leaf_size=kk))
            tc = jnp.asarray(pack_traversal_table(bvh, pv0, pv1, pv2,
                                                  leaf_size=kk))
            assert tq.shape[0] <= tc.shape[0]  # collapsed rows drop out
            o, d = _random_rays(256, seed)
            act = jnp.ones(256, bool)
            t_ref, hid_ref = closest_hit_packed(tc, kk, jnp.asarray(o),
                                                jnp.asarray(d), act)
            t, hid = closest_hit_quad(tq, kk, jnp.asarray(o),
                                      jnp.asarray(d), act)
            np.testing.assert_array_equal(np.asarray(t), np.asarray(t_ref))
            np.testing.assert_array_equal(np.asarray(hid),
                                          np.asarray(hid_ref))
            t_bf, _ = _brute_closest(pv0, pv1, pv2, o, d)
            np.testing.assert_allclose(np.asarray(t), t_bf, rtol=1e-5)


def test_quad_any_hit_matches_brute_force():
    from tryraytrace_tpu.accel.bvh import pack_quad_table
    from tryraytrace_tpu.ops.traverse import any_hit_quad
    from tryraytrace_tpu.oracle.cpu_renderer import _occluded_brute

    for seed, n_tris in ((0, 17), (1, 99)):
        v0, v1, v2 = _random_scene(n_tris, seed)
        bvh = build_bvh(v0, v1, v2, method="sah", leaf_size=8)
        pv0, pv1, pv2 = v0[bvh.perm], v1[bvh.perm], v2[bvh.perm]
        table = jnp.asarray(pack_quad_table(bvh, pv0, pv1, pv2,
                                            leaf_size=8))
        o, d = _random_rays(256, seed + 50)
        max_dist = np.full(256, 6.0, np.float32)
        occ = any_hit_quad(table, 8, jnp.asarray(o), jnp.asarray(d),
                           jnp.asarray(max_dist), jnp.ones(256, bool))
        occ_ref = _occluded_brute(pv0, pv1, pv2, o, d, max_dist,
                                  np.ones(256, bool))
        np.testing.assert_array_equal(np.asarray(occ), occ_ref)


def test_quad_collapse_is_topology_only():
    """A bounds refit must not change the collapse (the packed quad
    table keeps its shape so the jitted engine program is reused)."""
    from tryraytrace_tpu.accel.bvh import collapse_bvh, refit_bvh

    v0, v1, v2 = _random_scene(200, 7)
    bvh = build_bvh(v0, v1, v2, method="sah", leaf_size=8)
    pv0, pv1, pv2 = v0[bvh.perm], v1[bvh.perm], v2[bvh.perm]
    before = collapse_bvh(bvh)
    moved = refit_bvh(bvh, pv0 * 1.7 + 0.3, pv1 * 1.7 + 0.3,
                      pv2 * 1.7 + 0.3)
    after = collapse_bvh(moved)
    assert before == after


def test_mux8_matches_onehot():
    """The binary select tree (_mux8) must be bit-identical to the
    one-hot multiply-add it replaced in the octant-column decodes --
    including on arbitrary floats (SHADEG/TEXG lanes gather material
    rows through the same slot, so the decode sees garbage columns
    that must flow through unchanged)."""
    import jax.numpy as jnp
    from tryraytrace_tpu.ops.traverse import _mux8

    rs = np.random.RandomState(3)
    cols_np = [rs.randn(257).astype(np.float32) * 10 ** rs.randint(-3, 6)
               for _ in range(8)]
    cols_np[2][5] = np.inf
    cols_np[6][7] = np.nan
    octant = rs.randint(0, 8, 257).astype(np.int32)
    out = np.asarray(_mux8(jnp.asarray(octant),
                           [jnp.asarray(c) for c in cols_np]))
    ref = np.stack(cols_np, 1)[np.arange(257), octant]
    np.testing.assert_array_equal(out, ref)
