"""Regression golden: the engine must reproduce the checked-in
oracle-rendered accumulator (tests/golden/*.npy).  Unlike the live
oracle comparison, this catches *co-drift* -- a change that silently
alters both the engine and the oracle the same way (e.g. an RNG or
epsilon edit) still fails here."""

import os

import numpy as np

from tryraytrace_tpu.camera.controller import CameraController
from tryraytrace_tpu.config import RenderConfig
from tryraytrace_tpu.engine.renderer import Renderer
from tryraytrace_tpu.scene.assets import checker_texture
from tryraytrace_tpu.scene.cornell import create_cornell_box
from tryraytrace_tpu.scene.model import flatten_scene

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "cornell_32x24_4f.npy")


def test_engine_matches_checked_in_golden():
    golden = np.load(GOLDEN)
    arrays = flatten_scene(create_cornell_box(mesh=None),
                           textures=[checker_texture(32)])
    r = Renderer(arrays, cfg=RenderConfig(width=32, height=24, spp=1))
    cam = CameraController()
    p = cam.get_params(32, 24)
    for _ in range(4):  # frames 1..4, 1 spp each -- matches the golden
        r.step(p)
    eng = r.accum_host().reshape(-1, 3)
    mse = float(((eng - golden) ** 2).mean())
    assert mse < 1e-9, f"regression vs checked-in golden: MSE {mse}"
