"""Round-4 quad-walk variants: octant-baked table layout, skip-register
file depth, and the SAH-aware collapse criterion.

All three are traversal-order/cost transforms only -- the set of leaf
triangles tested and the strict-< closest-hit update are unchanged --
so the walk-level results must be BIT-identical to the default quad
walk, and full-engine images identical within the suite's usual
last-ULP XLA-fusion budget (tests/test_quad_engine.py).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tryraytrace_tpu.accel.bvh import (QB_ENT, QB_NSLOTS, QUAD_COL_BODY,
                                       QUAD_COL_CONT, build_bvh,
                                       collapse_bvh, pack_quad_oct_table,
                                       pack_quad_table)
from tryraytrace_tpu.camera.controller import CameraController
from tryraytrace_tpu.config import RenderConfig
from tryraytrace_tpu.engine.renderer import Renderer
from tryraytrace_tpu.ops.traverse import any_hit_quad, closest_hit_quad
from tryraytrace_tpu.scene.assets import checker_texture, cube_mesh
from tryraytrace_tpu.scene.cornell import create_cornell_box
from tryraytrace_tpu.scene.model import Object, flatten_scene

_ULP = dict(rtol=2e-6, atol=1e-6)


def _scene(n, seed):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    return (c, c + rng.uniform(0.05, 0.9, (n, 3)).astype(np.float32),
            c + rng.uniform(0.05, 0.9, (n, 3)).astype(np.float32))


def _rays(n, seed):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_oct_table_invariants():
    v0, v1, v2 = _scene(300, 11)
    bvh = build_bvh(v0, v1, v2, method="sah", leaf_size=8)
    pv0, pv1, pv2 = v0[bvh.perm], v1[bvh.perm], v2[bvh.perm]
    table, ri = pack_quad_oct_table(bvh, pv0, pv1, pv2, leaf_size=8)
    children = collapse_bvh(bvh)
    rl = int((bvh.leaf_count > 0).sum())
    assert ri == len(children)
    assert table.shape[0] == 8 * ri + rl
    # Internal replicas lead (prim_start -1), shared leaves follow.
    assert (table[:8 * ri, 0] == -1).all()
    assert (table[8 * ri:, 0] >= 0).all()
    nrows = table.shape[0]
    # Roots: octant o's root row is o*ri, its cont is the sentinel.
    for ob in range(8):
        assert (table[ob * ri, QUAD_COL_CONT:QUAD_COL_CONT + 8]
                == nrows).all()
    # Real entries point inside the table; pad entries equal the
    # row's own continuation (pads always "hit" under the swapping
    # slab test, so their target must be the fall-through); nslots
    # bounded.
    ents = table[:8 * ri, QUAD_COL_BODY + QB_ENT:QUAD_COL_BODY + QB_ENT + 4]
    nsl = table[:8 * ri, QUAD_COL_BODY + QB_NSLOTS].astype(np.int64)
    assert ((nsl >= 2) & (nsl <= 4)).all()
    for r in range(8 * ri):
        cont = table[r, QUAD_COL_CONT + r // ri]
        assert (ents[r, :nsl[r]] < nrows).all()
        assert (ents[r, nsl[r]:] == cont).all()


def test_oct_walk_bit_identical():
    v0, v1, v2 = _scene(400, 7)
    bvh = build_bvh(v0, v1, v2, method="sah", leaf_size=8)
    pv0, pv1, pv2 = v0[bvh.perm], v1[bvh.perm], v2[bvh.perm]
    mux = jnp.asarray(pack_quad_table(bvh, pv0, pv1, pv2, leaf_size=8))
    oct_t, ri = pack_quad_oct_table(bvh, pv0, pv1, pv2, leaf_size=8)
    oct_t = jnp.asarray(oct_t)
    o, d = _rays(512, 3)
    act = jnp.ones((512,), bool)
    t_m, id_m = closest_hit_quad(mux, 8, o, d, act)
    t_o, id_o = closest_hit_quad(oct_t, 8, o, d, act, oct_stride=ri)
    np.testing.assert_array_equal(np.asarray(t_m), np.asarray(t_o))
    np.testing.assert_array_equal(np.asarray(id_m), np.asarray(id_o))
    occ_m = any_hit_quad(mux, 8, o, d, jnp.float32(4.0), act)
    occ_o = any_hit_quad(oct_t, 8, o, d, jnp.float32(4.0), act,
                         oct_stride=ri)
    np.testing.assert_array_equal(np.asarray(occ_m), np.asarray(occ_o))


def test_sa_collapse_walk_bit_identical():
    """The collapse criterion regroups internal rows only -- leaves
    (and therefore hits) are unchanged."""
    v0, v1, v2 = _scene(400, 19)
    bvh = build_bvh(v0, v1, v2, method="sah", leaf_size=8)
    pv0, pv1, pv2 = v0[bvh.perm], v1[bvh.perm], v2[bvh.perm]
    t_cnt = jnp.asarray(pack_quad_table(bvh, pv0, pv1, pv2, leaf_size=8))
    o, d = _rays(512, 5)
    act = jnp.ones((512,), bool)
    a = closest_hit_quad(t_cnt, 8, o, d, act)
    for crit in ("sa", "dp"):
        t_v = jnp.asarray(pack_quad_table(bvh, pv0, pv1, pv2, leaf_size=8,
                                          collapse=crit))
        b = closest_hit_quad(t_v, 8, o, d, act)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]),
                                      err_msg=crit)
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]),
                                      err_msg=crit)


def test_rank_walk_bit_identical():
    """The rank decode (slot2pos table, register-free) enters exactly
    the child the perm decode enters (argmin rank == first hit in
    thread order), so against the register-full default walk the hits
    must match bit-for-bit (closest-hit is order-independent)."""
    v0, v1, v2 = _scene(400, 23)
    bvh = build_bvh(v0, v1, v2, method="sah", leaf_size=8)
    pv0, pv1, pv2 = v0[bvh.perm], v1[bvh.perm], v2[bvh.perm]
    t_perm = jnp.asarray(pack_quad_table(bvh, pv0, pv1, pv2, leaf_size=8))
    t_rank = jnp.asarray(pack_quad_table(bvh, pv0, pv1, pv2, leaf_size=8,
                                         perm_kind="slot2pos"))
    o, d = _rays(512, 9)
    act = jnp.ones((512,), bool)
    a = closest_hit_quad(t_perm, 8, o, d, act)
    b = closest_hit_quad(t_rank, 8, o, d, act, select="rank")
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    occ_a = any_hit_quad(t_perm, 8, o, d, jnp.float32(4.0), act)
    occ_b = any_hit_quad(t_rank, 8, o, d, jnp.float32(4.0), act,
                         select="rank")
    np.testing.assert_array_equal(np.asarray(occ_a), np.asarray(occ_b))


@pytest.fixture(scope="module")
def arrays():
    scene = create_cornell_box(mesh=None)
    v0, v1, v2 = cube_mesh()
    for a, b, c in zip(v0 * 14 + [40, 20, 60], v1 * 14 + [40, 20, 60],
                       v2 * 14 + [40, 20, 60]):
        scene.objects.append(Object(v0=tuple(a), v1=tuple(b), v2=tuple(c),
                                    albedo=(0.9, 0.9, 0.9), metallic=0.0,
                                    roughness=0.0, ior=1.45,
                                    transmission=1.0))
    return flatten_scene(scene, textures=[checker_texture(32)])


def _render(arrays, **cfg_kw):
    w, h, spp = 40, 24, 2
    cfg = RenderConfig(width=w, height=h, spp=spp, **cfg_kw)
    r = Renderer(arrays, cfg=cfg)
    r.step(CameraController().get_params(w, h), spp=spp)
    return r.accum_host()


@pytest.mark.weekly
def test_engine_variants_match_default(arrays):
    """Exhaustive full-engine matrix over the DEMOTED quad variants
    (each measured slower than the default on chip, kept as tested
    fallbacks).  Every entry compiles its own engine program --
    multi-minute each on a 1-core XLA:CPU host -- while the walk-level
    bit-identity tests above cover the same decode/layout/collapse
    semantics in seconds, so this runs in the weekly tier
    (pyproject addopts; `pytest -m weekly`)."""
    base = _render(arrays, traversal="quad")
    for kw in (dict(quad_layout="octant"),
               dict(quad_regs=0, quad_select="perm"),
               dict(quad_regs=0),  # auto-resolves the rank decode
               dict(quad_regs=0, quad_select="rank"),
               dict(quad_regs=2),
               dict(quad_collapse="sa"),
               dict(quad_collapse="dp"),
               dict(quad_layout="octant", quad_regs=0)):
        img = _render(arrays, traversal="quad", **kw)
        np.testing.assert_allclose(img, base, err_msg=str(kw), **_ULP)
