"""Golden-image tests: the jitted wavefront engine must match the
independent NumPy oracle (brute-force, no BVH, no JAX) within MSE
1e-4 -- the BASELINE.json acceptance metric.  In practice the shared
counter-based RNG makes them bit-comparable (MSE ~ 1e-13)."""

import numpy as np
import pytest

from tryraytrace_tpu.camera.controller import CameraController
from tryraytrace_tpu.config import RenderConfig
from tryraytrace_tpu.engine.renderer import Renderer
from tryraytrace_tpu.oracle.cpu_renderer import oracle_render
from tryraytrace_tpu.scene.assets import checker_texture, cube_mesh
from tryraytrace_tpu.scene.cornell import create_cornell_box
from tryraytrace_tpu.scene.model import Object, Scene, flatten_scene

MSE_TOL = 1e-4       # acceptance bound (BASELINE.json)
MSE_EXPECT = 1e-9    # what the shared RNG actually delivers


def _mse(a, b):
    return float(((a - b) ** 2).mean())


def _render_both(arrays, w, h, spp=1, aperture=0.0, frame=1,
                 cfg_kw=None):
    cfg = RenderConfig(width=w, height=h, spp=spp, **(cfg_kw or {}))
    r = Renderer(arrays, cfg=cfg)
    cam = CameraController()
    cam.aperture = aperture
    params = cam.get_params(w, h)
    r.frame = frame
    r.step(params, spp=spp)
    eng = r.accum_host().reshape(-1, 3) / spp
    ora = oracle_render(arrays, params, w, h, frame_seed=frame,
                        spp=spp, cfg=cfg) / spp
    return eng, ora


def test_cornell_walls_only():
    scene = create_cornell_box(mesh=None)
    arrays = flatten_scene(scene, textures=[checker_texture(32)])
    eng, ora = _render_both(arrays, 32, 24)
    assert _mse(eng, ora) < MSE_EXPECT


def test_cornell_with_mesh_bvh():
    # Config-2 shape: BVH traversal over a real mesh, multi-spp.
    scene = create_cornell_box(mesh=None)
    v0, v1, v2 = cube_mesh()
    for a, b, c in zip(v0 * 15 + [50, 25, 50], v1 * 15 + [50, 25, 50],
                       v2 * 15 + [50, 25, 50]):
        scene.objects.append(Object(v0=tuple(a), v1=tuple(b), v2=tuple(c),
                                    albedo=(0.7, 0.6, 0.2), metallic=1.0,
                                    roughness=0.1))
    arrays = flatten_scene(scene, textures=[checker_texture(32)])
    eng, ora = _render_both(arrays, 40, 30, spp=2)
    assert _mse(eng, ora) < MSE_EXPECT


def _two_light_scene():
    # Cornell box (1 ceiling light) + a second emitter: a small warm
    # panel on the back wall.  num_lights == 2 exercises the general
    # light-pick gather (persistent.py lcount > 1 branch, wavefront
    # NEE gather, oracle pick) that the single-light scenes never hit.
    scene = create_cornell_box(mesh=None)
    for tri in (((20, 40, 598), (40, 40, 598), (40, 60, 598)),
                ((20, 40, 598), (40, 60, 598), (20, 60, 598))):
        scene.objects.append(Object(
            v0=tri[0], v1=tri[1], v2=tri[2], albedo=(0, 0, 0),
            emission=(8.0, 4.0, 1.0), roughness=1.0))
    return flatten_scene(scene, textures=[checker_texture(32)])


def test_multi_light_nee_persistent():
    arrays = _two_light_scene()
    assert arrays.num_lights == 3  # ceiling light + 2 panel tris
    eng, ora = _render_both(arrays, 32, 24, spp=2)
    assert _mse(eng, ora) < MSE_EXPECT


def test_multi_light_nee_bounce_engine():
    arrays = _two_light_scene()
    eng, ora = _render_both(arrays, 32, 24, spp=2,
                            cfg_kw={"engine": "bounce"})
    assert _mse(eng, ora) < MSE_EXPECT


def test_multi_light_picks_both_lights():
    # The second emitter must actually contribute: occlude nothing and
    # compare against the same scene with the panel's emission zeroed.
    arrays = _two_light_scene()
    cfg = RenderConfig(width=32, height=24, spp=4)
    r = Renderer(arrays, cfg=cfg)
    cam = CameraController()
    r.step(cam.get_params(32, 24))
    lit = r.accum_host()

    base = create_cornell_box(mesh=None)
    one = flatten_scene(base, textures=[checker_texture(32)])
    r1 = Renderer(one, cfg=cfg)
    r1.step(cam.get_params(32, 24))
    # More light and a different light-pick stream: images must differ.
    assert float(np.abs(lit - r1.accum_host()).max()) > 1e-3


def test_multi_texture_slots():
    # Every other textured test uses one texture; this pins the
    # per-slot selection loop (ops/texture.py sample_textures: sample
    # each slot, select by tex_id == k) with two differently-sized
    # textures on different surfaces, engine vs oracle.
    scene = create_cornell_box(mesh=None)
    # Back wall already samples slot 0; give the floor slot 1 via a
    # quad of two triangles in front of the camera.
    quad = (((-40, 0.5, -40), (140, 0.5, -40), (140, 0.5, 290),
             (-40, 0.5, 290)))
    for ia, ib, ic in ((0, 1, 2), (0, 2, 3)):
        scene.objects.append(Object(
            v0=quad[ia], v1=quad[ib], v2=quad[ic],
            albedo=(0.85, 0.85, 0.85), roughness=1.0, tex_id=1))
    inv = 1.0 - checker_texture(16)  # visibly distinct second slot
    arrays = flatten_scene(scene, textures=[checker_texture(32), inv])
    eng, ora = _render_both(arrays, 32, 24, spp=2)
    assert _mse(eng, ora) < MSE_EXPECT

    # Slot 1 must actually be sampled: same scene with an all-white
    # second texture must differ.
    white = np.ones_like(inv)
    arrays2 = flatten_scene(scene, textures=[checker_texture(32), white])
    eng2, _ = _render_both(arrays2, 32, 24, spp=2)
    assert float(np.abs(eng - eng2).max()) > 1e-3


def test_depth_of_field():
    scene = create_cornell_box(mesh=None)
    arrays = flatten_scene(scene, textures=[checker_texture(32)])
    eng, ora = _render_both(arrays, 32, 24, aperture=2.0)
    assert _mse(eng, ora) < MSE_EXPECT


def test_glass_material():
    scene = create_cornell_box(mesh=None)
    v0, v1, v2 = cube_mesh()
    for a, b, c in zip(v0 * 12 + [50, 20, 60], v1 * 12 + [50, 20, 60],
                       v2 * 12 + [50, 20, 60]):
        scene.objects.append(Object(v0=tuple(a), v1=tuple(b), v2=tuple(c),
                                    albedo=(0.95, 0.95, 0.95), metallic=0.0,
                                    roughness=0.0, ior=1.45, transmission=1.0))
    arrays = flatten_scene(scene, textures=[checker_texture(32)])
    eng, ora = _render_both(arrays, 32, 24, spp=2)
    assert _mse(eng, ora) < MSE_EXPECT


def test_no_lights_warning_path():
    # All-dark scene: engine must run (renderer.cu:182 warns, kernel
    # still executes; NEE is skipped).
    scene = Scene()
    scene.objects.append(Object(v0=(-50, 0, 0), v1=(50, 0, 600),
                                v2=(150, 0, 0), albedo=(0.75, 0.75, 0.75),
                                roughness=1.0))
    arrays = flatten_scene(scene)
    eng, ora = _render_both(arrays, 16, 12)
    assert _mse(eng, ora) < MSE_EXPECT
    assert float(np.abs(eng).max()) == 0.0  # nothing emits -> black


def test_mse_tolerance_is_met_with_margin():
    scene = create_cornell_box(mesh=None)
    arrays = flatten_scene(scene, textures=[checker_texture(32)])
    eng, ora = _render_both(arrays, 32, 24, spp=4, frame=3)
    mse = _mse(eng, ora)
    assert mse < MSE_TOL, f"MSE {mse} over acceptance bound"
    assert mse < MSE_EXPECT, f"MSE {mse} over bit-comparability bound"


def test_progressive_accumulation_matches_oracle_sum():
    scene = create_cornell_box(mesh=None)
    arrays = flatten_scene(scene, textures=[checker_texture(32)])
    cfg = RenderConfig(width=24, height=16, spp=1)
    r = Renderer(arrays, cfg=cfg)
    cam = CameraController()
    params = cam.get_params(24, 16)
    for _ in range(3):
        r.step(params)
    assert r.spp() == 3
    eng = r.accum_host().reshape(-1, 3)
    ora = sum(
        oracle_render(arrays, params, 24, 16, frame_seed=f, spp=1, cfg=cfg)
        for f in (1, 2, 3)
    )
    assert _mse(eng / 3, ora / 3) < MSE_EXPECT


def test_reset_on_camera_move():
    scene = create_cornell_box(mesh=None)
    arrays = flatten_scene(scene, textures=[checker_texture(32)])
    cfg = RenderConfig(width=16, height=12, spp=1)
    r = Renderer(arrays, cfg=cfg)
    cam = CameraController()
    r.step(cam.get_params(16, 12))
    assert r.spp() == 1
    r.reset()
    assert r.spp() == 0
    assert float(np.abs(r.accum_host()).max()) == 0.0
