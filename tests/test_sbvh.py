"""SBVH (spatial-split) builder: same traversal contract as SAH with
*surjective* primitive references -- straddling triangles may appear in
several leaves under clipped bounds.  Duplicated references carry
identical triangle/material data, so closest-hit results (and therefore
rendered images) are bit-identical to the SAH build."""

import numpy as np
import jax.numpy as jnp

from tryraytrace_tpu.accel.bvh import build_bvh, pack_traversal_table
from tryraytrace_tpu.ops.traverse import closest_hit_packed


def _random_tris(n, seed=0, stretch=1.0):
    r = np.random.RandomState(seed)
    base = r.uniform(-10, 10, size=(n, 1, 3)).astype(np.float32)
    tri = base + r.uniform(-1, 1, size=(n, 3, 3)).astype(np.float32)
    # Stretch some triangles to create the long-thin straddlers that
    # spatial splits exist for.
    tri[::7, :, 0] *= stretch
    return tri[:, 0].copy(), tri[:, 1].copy(), tri[:, 2].copy()


def test_sbvh_invariants():
    for n in (1, 2, 9, 100, 333):
        v0, v1, v2 = _random_tris(n, seed=n, stretch=4.0)
        bvh = build_bvh(v0, v1, v2, method="sbvh", leaf_size=8)
        m = bvh.num_nodes
        r = bvh.perm.shape[0]
        assert r >= n
        # every primitive appears at least once; only duplicates extra
        assert sorted(set(bvh.perm.tolist())) == list(range(n))
        # every reference slot is in exactly one leaf
        slots = []
        for node in np.nonzero(bvh.leaf_count > 0)[0]:
            s = int(bvh.leaf_prim[node])
            slots.extend(range(s, s + int(bvh.leaf_count[node])))
        assert sorted(slots) == list(range(r))
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
        # clipped reference bounds still contain their triangle's
        # intersectable surface: traversal correctness is checked
        # against brute force below, structure-only here.


def test_sbvh_traversal_matches_brute_force():
    from tryraytrace_tpu.oracle.cpu_renderer import _intersect_brute

    v0, v1, v2 = _random_tris(400, seed=11, stretch=6.0)
    bvh = build_bvh(v0, v1, v2, method="sbvh", leaf_size=8)
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


def test_sbvh_render_bit_identical_to_sah():
    # End to end: duplicated references change only visit order/count,
    # never the image (identical triangle data -> identical t; closest
    # hit is order-independent; lights remap to canonical slots).
    from tryraytrace_tpu.camera.controller import CameraController
    from tryraytrace_tpu.config import RenderConfig
    from tryraytrace_tpu.engine.renderer import Renderer
    from tryraytrace_tpu.scene.assets import checker_texture
    from tryraytrace_tpu.scene.cornell import create_cornell_box

    from tryraytrace_tpu.scene.model import flatten_scene

    arrays = flatten_scene(create_cornell_box(),
                           textures=[checker_texture(64)])
    cam = CameraController()
    p = cam.get_params(48, 32)
    outs = {}
    for method in ("sah", "sbvh"):
        cfg = RenderConfig(width=48, height=32, spp=2, bvh_method=method)
        r = Renderer(arrays, cfg=cfg)
        r.step(p, spp=2)
        outs[method] = r.accum_host()
    np.testing.assert_array_equal(outs["sah"], outs["sbvh"])
