"""Tiled/streamed rendering: Renderer.step_tiled must be bit-identical
to the single-dispatch step (RNG is keyed by absolute (pixel, sample),
so a pixel's samples cannot depend on which dispatch rendered them --
the same invariant tests/test_parallel.py pins for sharded renders)."""

import numpy as np
import pytest

from tryraytrace_tpu.camera.controller import CameraController
from tryraytrace_tpu.config import RenderConfig
from tryraytrace_tpu.engine.renderer import Renderer
from tryraytrace_tpu.scene.assets import checker_texture
from tryraytrace_tpu.scene.cornell import create_cornell_box
from tryraytrace_tpu.scene.model import flatten_scene


@pytest.fixture(scope="module")
def arrays():
    return flatten_scene(create_cornell_box(mesh=None),
                         textures=[checker_texture(16)])


@pytest.mark.parametrize("tiles", [3, 7])
def test_step_tiled_bit_identical(arrays, tiles):
    cfg = RenderConfig(width=32, height=24, spp=2)
    cam = CameraController()
    params = cam.get_params(32, 24)

    r1 = Renderer(arrays, cfg=cfg)
    r1.step(params)
    whole = r1.accum_host()

    r2 = Renderer(arrays, cfg=cfg)
    r2.step_tiled(params, tiles)
    np.testing.assert_array_equal(r2.accum_host(), whole)
    assert int(r2.state.spp) == 2


def test_step_tiled_accumulates_and_clamps_tiles(arrays):
    # tiles > pixel count clamps to one pixel per dispatch; two passes
    # accumulate like two plain steps.  Degenerate 1- and 10-pixel
    # waves compile to different XLA:CPU fusions than the full-width
    # program, so this extreme case is only ULP-equal (the same 1-ULP
    # drift budget as the two-engine invariant); practical tile widths
    # are exactly equal (test above).
    cfg = RenderConfig(width=8, height=6, spp=1)
    cam = CameraController()
    params = cam.get_params(8, 6)

    r1 = Renderer(arrays, cfg=cfg)
    r1.step(params)
    r1.step(params)

    r2 = Renderer(arrays, cfg=cfg)
    r2.step_tiled(params, 10 ** 6)
    r2.step_tiled(params, 5)
    np.testing.assert_allclose(r2.accum_host(), r1.accum_host(),
                               rtol=1e-6, atol=1e-7)
    assert int(r2.state.spp) == 2
