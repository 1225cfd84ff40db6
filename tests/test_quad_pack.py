"""Quad-table packing invariants (accel/bvh.py pack_quad_table).

The per-octant continuation column packs cont*256 + the 2-bit/position
permutation into ONE float32 (exact while rows <= 32767), so the
walk's octant decode is a single 8-way mux (ops/traverse._quad_decode).
These checks pin the packed layout the engine decodes against.
"""
import numpy as np

from tryraytrace_tpu.accel.bvh import (QB_ENT, QB_NSLOTS, QUAD_COL_BODY,
                                       QUAD_COL_CONT, build_bvh,
                                       collapse_bvh, pack_quad_table)


def _scene(n, seed):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    return (c, c + rng.uniform(0.05, 0.9, (n, 3)).astype(np.float32),
            c + rng.uniform(0.05, 0.9, (n, 3)).astype(np.float32))


def test_packed_cont_perm_invariants():
    v0, v1, v2 = _scene(300, 11)
    bvh = build_bvh(v0, v1, v2, method="sah", leaf_size=8)
    pv0, pv1, pv2 = v0[bvh.perm], v1[bvh.perm], v2[bvh.perm]
    table = pack_quad_table(bvh, pv0, pv1, pv2, leaf_size=8)
    nrows = table.shape[0]
    is_leaf = table[:, 0] >= 0
    cp = table[:, QUAD_COL_CONT:QUAD_COL_CONT + 8].astype(np.int64)
    # Exact integers in f32 and within the packed range.
    np.testing.assert_array_equal(
        cp, table[:, QUAD_COL_CONT:QUAD_COL_CONT + 8].astype(np.float64))
    cont, perm = cp >> 8, cp & 255
    assert (cont >= 0).all() and (cont <= nrows).all()
    # Leaf rows carry no permutation; the root's continuation is the
    # sentinel (end of walk) in every octant.
    assert (perm[is_leaf] == 0).all()
    assert (cont[0] == nrows).all() or is_leaf[0]
    # Internal rows: the permutation's first nslots positions name
    # distinct child slots, and entries point inside the table (pad
    # slots at the sentinel).
    ents = table[:, QUAD_COL_BODY + QB_ENT:QUAD_COL_BODY + QB_ENT + 4]
    nsl = table[:, QUAD_COL_BODY + QB_NSLOTS].astype(np.int64)
    for r in np.nonzero(~is_leaf)[0]:
        for ob in range(8):
            slots = [(perm[r, ob] >> (2 * p)) & 3 for p in range(nsl[r])]
            assert len(set(slots)) == nsl[r]
        assert (ents[r, :nsl[r]] < nrows).all()
        assert (ents[r, nsl[r]:] == nrows).all()
    # Row count matches the collapse (absorbed internals have no row).
    assert nrows == len(collapse_bvh(bvh)) + int((bvh.leaf_count > 0).sum())
