"""Auto shading cadence (``shade_every=0``, the default).

The persistent engine's shade tick costs ~one full-width gather, so
its cadence trades tick overhead against tick-wait idle; the optimum
tracks how long an average ray segment's BVH walk is.  Auto mode
resolves the cadence per scene from the build-time surface-ray visit
probe (accel/bvh.estimate_surface_visits) as
round((visits + 6) / step_unroll) clamped to [3, 8] -- the mapping
reproduces every measured on-chip optimum (teapot 3, cow 4, teddy 4,
flythrough 5; BASELINE.md).  Under inline shading (the default where
supported, config.inline_resolved) the tick only services textured
hits and the optimum is a flat 8.  Cadence is scheduling only: images
are identical for any value.
"""
import numpy as np

from tryraytrace_tpu.camera.controller import CameraController
from tryraytrace_tpu.config import RenderConfig
from tryraytrace_tpu.engine.device_scene import auto_shade_every, upload_scene
from tryraytrace_tpu.engine.renderer import Renderer
from tryraytrace_tpu.scene.cornell import create_cornell_box
from tryraytrace_tpu.scene.model import flatten_scene


def test_shallow_scene_resolves_to_floor():
    # 7 Cornell wall/light triangles: tiny tree, clamped to cadence 3.
    arrays = flatten_scene(create_cornell_box(mesh=None))
    _, _, bvh = upload_scene(arrays, device_put=False)
    assert auto_shade_every(bvh, arrays, step_unroll=4) == 3


def test_inline_mode_resolves_flat_8():
    # Inline shading decouples the tick from walk length (it only
    # services textured hits): the cadence is a flat 8 regardless of
    # scene depth (on-chip sweep, BASELINE.md round-2 inline table).
    for arrays in (flatten_scene(create_cornell_box(mesh=None)),
                   flatten_scene(create_cornell_box())):
        _, _, bvh = upload_scene(arrays, device_put=False)
        assert auto_shade_every(bvh, arrays, step_unroll=4,
                                inline=True) == 8


def test_renderer_resolves_inline_cadence():
    # Default config on a 1-light scene runs inline (config.
    # inline_resolved) and must get the inline cadence, not the tick
    # mapping; tick-path configs (inline off, or the pool scheduler,
    # whose shared-counter claim can't run in-step) must not.  The
    # quota scheduler gained in-step refill this round and now
    # resolves inline like owner.
    arrays = flatten_scene(create_cornell_box(mesh=None))
    base = RenderConfig(width=32, height=24, spp=2)
    assert Renderer(arrays, cfg=base).cfg.shade_every == 8
    assert Renderer(
        arrays, cfg=base.replace(scheduler="quota")).cfg.shade_every == 8
    assert Renderer(
        arrays, cfg=base.replace(inline_shade=False)).cfg.shade_every == 3
    assert Renderer(
        arrays, cfg=base.replace(scheduler="pool")).cfg.shade_every == 3


def test_probe_scales_with_scene_depth():
    from tryraytrace_tpu.accel.bvh import build_bvh, estimate_surface_visits

    shallow = flatten_scene(create_cornell_box(mesh=None))
    deep = flatten_scene(create_cornell_box())  # + teapot, 6327 tris
    vs = []
    for arrays in (shallow, deep):
        bvh = build_bvh(arrays.tri_v0, arrays.tri_v1, arrays.tri_v2,
                        leaf_size=8, method="sah")
        vs.append(estimate_surface_visits(bvh, arrays.tri_v0,
                                          arrays.tri_v1, arrays.tri_v2))
    assert vs[1] > vs[0] + 1.0  # deeper scene walks longer


def test_renderer_resolves_auto_and_images_match():
    arrays = flatten_scene(create_cornell_box(mesh=None))
    w, h = 32, 24
    cam = CameraController().get_params(w, h)

    base = RenderConfig(width=w, height=h, spp=2)
    assert base.shade_every == 0  # auto is the default
    r_auto = Renderer(arrays, cfg=base)
    assert 3 <= r_auto.cfg.shade_every <= 8

    r_exp = Renderer(arrays, cfg=base.replace(
        shade_every=r_auto.cfg.shade_every + 2))
    r_auto.step(cam)
    r_exp.step(cam)
    np.testing.assert_array_equal(r_auto.accum_host(), r_exp.accum_host())
