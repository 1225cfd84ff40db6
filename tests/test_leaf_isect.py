"""Baldwin-Weber leaf intersection format (cfg.leaf_isect = "bw").

The packed tables can store either (v0, e1, e2) Moller-Trumbore slots
("mt", the stride-9 default) or the precomputed Baldwin-Weber
(n, v0, bu, bv) transform ("bw", stride 12, ~30% fewer VPU ops per
slot -- ops/intersect.baldwin_intersect).  Decisions share MT's
structure (|n.d| = |a| parallel guard, t > 1e-5, same barycentric
bounds), so hits agree except for float-ULP boundary flips; the CPU
oracle mirrors whichever format the config selects, keeping golden
MSEs at the shared-RNG level.
"""

import numpy as np
import jax.numpy as jnp

from tryraytrace_tpu.accel.bvh import build_bvh, pack_quad_table
from tryraytrace_tpu.ops.intersect import (baldwin_intersect, baldwin_rows,
                                           moller_trumbore)
from tryraytrace_tpu.ops.traverse import closest_hit_quad

from tryraytrace_tpu.camera.controller import CameraController
from tryraytrace_tpu.config import RenderConfig
from tryraytrace_tpu.engine.renderer import Renderer
from tryraytrace_tpu.oracle.cpu_renderer import oracle_render
from tryraytrace_tpu.scene.assets import checker_texture, cube_mesh
from tryraytrace_tpu.scene.cornell import create_cornell_box
from tryraytrace_tpu.scene.model import Object, flatten_scene

MSE_EXPECT = 1e-9  # what the shared RNG delivers (tests/test_golden.py)


def _mse(a, b):
    return float(((a - b) ** 2).mean())


def _render_both(arrays, w, h, spp=1, cfg_kw=None):
    cfg = RenderConfig(width=w, height=h, spp=spp, **(cfg_kw or {}))
    r = Renderer(arrays, cfg=cfg)
    params = CameraController().get_params(w, h)
    r.frame = 1
    r.step(params, spp=spp)
    eng = r.accum_host().reshape(-1, 3) / spp
    ora = oracle_render(arrays, params, w, h, frame_seed=1,
                        spp=spp, cfg=cfg) / spp
    return eng, ora


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
    return o, d.astype(np.float32)


def test_bw_matches_mt_brute():
    """The BW kernel agrees with MT on hit decisions and t (to fp
    reassociation error) over dense random geometry."""
    v0, v1, v2 = _scene(400, 3)
    o, d = _rays(256, 4)
    rows = baldwin_rows(v0, v1, v2)
    t_bw = baldwin_intersect(rows[None], o[:, None], d[:, None], np)
    t_mt = moller_trumbore(v0[None], v1[None], v2[None],
                           o[:, None], d[:, None], np)
    hit_bw, hit_mt = t_bw > 0, t_mt > 0
    # Boundary flips are measure-zero on random data.
    np.testing.assert_array_equal(hit_bw, hit_mt)
    both = hit_bw & hit_mt
    np.testing.assert_allclose(t_bw[both], t_mt[both], rtol=1e-4)


def test_quad_walk_bw_vs_mt():
    """The quad walk over a bw-packed table finds the same closest
    primitives as over the mt table (t within fp noise)."""
    v0, v1, v2 = _scene(300, 7)
    o, d = _rays(512, 8)
    bvh = build_bvh(v0, v1, v2, method="sah", leaf_size=8)
    pv0, pv1, pv2 = v0[bvh.perm], v1[bvh.perm], v2[bvh.perm]
    t_m = pack_quad_table(bvh, pv0, pv1, pv2, leaf_size=8)
    t_b = pack_quad_table(bvh, pv0, pv1, pv2, leaf_size=8, leaf_fmt="bw")
    active = jnp.ones(o.shape[0], bool)
    dm, im = closest_hit_quad(jnp.asarray(t_m), 8, jnp.asarray(o),
                              jnp.asarray(d), active)
    db, ib = closest_hit_quad(jnp.asarray(t_b), 8, jnp.asarray(o),
                              jnp.asarray(d), active, fmt="bw")
    np.testing.assert_array_equal(np.asarray(im), np.asarray(ib))
    hit = np.asarray(im) >= 0
    np.testing.assert_allclose(np.asarray(db)[hit], np.asarray(dm)[hit],
                               rtol=1e-4)


def test_degenerate_and_pad_slots_miss():
    """Degenerate triangles pack to all-zero bw rows and never hit."""
    v = np.zeros((3, 3), np.float32)
    rows = baldwin_rows(v, v, v)
    assert (rows == 0).all()
    o, d = _rays(16, 5)
    t = baldwin_intersect(rows[None], o[:, None], d[:, None], np)
    assert (t == 0).all()


def test_golden_bw_engines_vs_oracle():
    """Both engines under leaf_isect='bw' match the bw-mirrored oracle
    at the shared-RNG level (the invariant golden tests pin for mt)."""
    scene = create_cornell_box(mesh=None)
    v0, v1, v2 = cube_mesh()
    for a, b, c in zip(v0 * 15 + [50, 25, 50], v1 * 15 + [50, 25, 50],
                       v2 * 15 + [50, 25, 50]):
        scene.objects.append(Object(v0=tuple(a), v1=tuple(b), v2=tuple(c),
                                    albedo=(0.7, 0.6, 0.2), metallic=1.0,
                                    roughness=0.1))
    arrays = flatten_scene(scene, textures=[checker_texture(32)])
    for engine in ("persistent", "bounce"):
        eng, ora = _render_both(arrays, 32, 24, spp=1,
                                cfg_kw=dict(leaf_isect="bw",
                                            engine=engine))
        assert _mse(eng, ora) < MSE_EXPECT, engine
