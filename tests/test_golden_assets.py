"""Golden tests against the real reference assets (read-only mount):
the full Cornell+teapot scene and a textured cow -- the shapes of
BASELINE configs 2 and 3 at oracle-tractable resolutions."""

import numpy as np
import pytest

from tryraytrace_tpu.camera.controller import CameraController
from tryraytrace_tpu.config import RenderConfig
from tryraytrace_tpu.engine.renderer import Renderer
from tryraytrace_tpu.oracle.cpu_renderer import oracle_render
from tryraytrace_tpu.scene.assets import checker_texture, find_asset
from tryraytrace_tpu.scene.cornell import create_cornell_box
from tryraytrace_tpu.scene.model import flatten_scene

needs_assets = pytest.mark.skipif(find_asset("teapot.obj") is None,
                                  reason="reference assets unavailable")


def _compare(arrays, w, h, spp=1):
    cfg = RenderConfig(width=w, height=h, spp=spp)
    r = Renderer(arrays, cfg=cfg)
    cam = CameraController()
    params = cam.get_params(w, h)
    r.step(params, spp=spp)
    eng = r.accum_host().reshape(-1, 3) / spp
    ora = oracle_render(arrays, params, w, h, frame_seed=1, spp=spp,
                        cfg=cfg) / spp
    return float(((eng - ora) ** 2).mean())


@needs_assets
def test_teapot_scene_golden():
    # The reference's exact default scene (scene.cpp:24-123): Cornell
    # box + teapot.obj at (50,10,50) x10, metallic m=1.0 r=0.1.
    scene = create_cornell_box()
    arrays = flatten_scene(scene, textures=[checker_texture(64)])
    assert arrays.num_objects == 6327
    assert _compare(arrays, 32, 24) < 1e-9


@needs_assets
def test_cow_textured_golden():
    from tryraytrace_tpu.benchmarks import build_config

    arrays, *_ = build_config("cow800")
    mse = _compare(arrays, 24, 18)
    assert mse < 1e-9
