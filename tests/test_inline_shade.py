"""Inline shading (``cfg.inline_shade``): shading/regeneration fused
into the traversal loop via the unified [node rows; trimat rows]
gather table (engine/persistent.py SHADEG).

Scheduling-only by construction -- the RNG is slot-addressed by
(sample seed, pixel, depth), so shading a lane earlier cannot change
what it draws -- but the program fuses differently, so equality is
the engines' usual last-ULP budget (see test_persistent_engine).
Textured hits are deferred to the shade tick (their bilinear taps
stay out of the per-step program); unsupported combos (fatnode /
pool / multi-light) silently fall back to the tick path.
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


def _arrays(textured=False):
    scene = create_cornell_box(mesh=None)
    v0, v1, v2 = cube_mesh()
    for a, b, c in zip(v0 * 14 + [50, 20, 50], v1 * 14 + [50, 20, 50],
                      v2 * 14 + [50, 20, 50]):
        scene.objects.append(Object(v0=tuple(a), v1=tuple(b), v2=tuple(c),
                                    albedo=(0.7, 0.6, 0.2), metallic=1.0,
                                    roughness=0.1))
    tex = [checker_texture(32)] if textured else None
    return flatten_scene(scene, textures=tex)


def _render(arrays, **cfg_kw):
    w, h, spp = 40, 24, 2
    cfg = RenderConfig(width=w, height=h, spp=spp, shade_every=3, **cfg_kw)
    r = Renderer(arrays, cfg=cfg)
    r.step(CameraController().get_params(w, h))
    return r.accum_host()


@pytest.fixture(scope="module")
def arrays():
    return _arrays()


@pytest.fixture(scope="module")
def arrays_tex():
    return _arrays(textured=True)


def test_inline_matches_tick_engine(arrays):
    a = _render(arrays)
    b = _render(arrays, inline_shade=True)
    np.testing.assert_allclose(a, b, **_ULP)
    assert a.max() > 0


def test_inline_textured_deferral(arrays_tex):
    # Textured hits shade at the tick; the image must still match.
    a = _render(arrays_tex)
    b = _render(arrays_tex, inline_shade=True)
    np.testing.assert_allclose(a, b, **_ULP)


def test_inline_single_walk(arrays):
    a = _render(arrays, dual_walk=False)
    b = _render(arrays, dual_walk=False, inline_shade=True)
    np.testing.assert_allclose(a, b, **_ULP)


def test_inline_unsupported_combo_falls_back(arrays):
    # quota scheduler cannot inline-refill; inline_shade=True must
    # silently run the tick path and stay correct.
    a = _render(arrays, scheduler="quota")
    b = _render(arrays, scheduler="quota", inline_shade=True)
    np.testing.assert_array_equal(a, b)


def test_inline_ray_stats_match(arrays):
    import jax

    from tryraytrace_tpu.engine.wavefront import frame_ray_stats

    cam = CameraController().get_params(32, 16)
    counts = {}
    for inline in (False, True):
        cfg = RenderConfig(width=32, height=16, spp=1, shade_every=3,
                           inline_shade=inline)
        r = Renderer(arrays, cfg=cfg)
        tr, sh = jax.jit(
            frame_ray_stats,
            static_argnames=("width", "height", "cfg", "spp"),
        )(r.scene, r.textures, cam, np.uint32(1), width=32, height=16,
          cfg=cfg, spp=1)
        counts[inline] = (float(tr), float(sh))
    assert counts[False] == counts[True]
