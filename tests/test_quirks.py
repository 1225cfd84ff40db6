"""Quirk-gate flags: the reference's oddities are preserved by default
but individually disableable; engine and oracle honor the flags
identically."""

import numpy as np
import pytest

from tryraytrace_tpu.camera.controller import CameraController
from tryraytrace_tpu.config import RenderConfig
from tryraytrace_tpu.engine.renderer import Renderer
from tryraytrace_tpu.oracle.cpu_renderer import oracle_render
from tryraytrace_tpu.scene.assets import checker_texture
from tryraytrace_tpu.scene.cornell import create_cornell_box
from tryraytrace_tpu.scene.model import flatten_scene


@pytest.fixture(scope="module")
def arrays():
    return flatten_scene(create_cornell_box(mesh=None),
                         textures=[checker_texture(16)])


def _pair(arrays, cfg):
    r = Renderer(arrays, cfg=cfg)
    cam = CameraController()
    p = cam.get_params(cfg.width, cfg.height)
    r.step(p)
    eng = r.accum_host().reshape(-1, 3)
    ora = oracle_render(arrays, p, cfg.width, cfg.height, frame_seed=1,
                        spp=1, cfg=cfg)
    return eng, ora


def test_nee_dist_floor_gate(arrays):
    base = RenderConfig(width=24, height=16, spp=1)
    eng_on, ora_on = _pair(arrays, base)
    eng_off, ora_off = _pair(arrays, base.replace(
        nee_dist_floor_enabled=False))
    # engine == oracle under both settings (the floor only bites for
    # hit points within sqrt(5) units of the light sample, so the
    # images themselves may coincide for a given view)
    assert float(((eng_on - ora_on) ** 2).mean()) < 1e-9
    assert float(((eng_off - ora_off) ** 2).mean()) < 1e-9


def test_firefly_clamp_gate(arrays):
    base = RenderConfig(width=24, height=16, spp=1)
    eng_off, ora_off = _pair(arrays, base.replace(clamp_fireflies=False))
    assert float(((eng_off - ora_off) ** 2).mean()) < 1e-9


def test_texture_files_load_from_disk(tmp_path):
    # flatten_scene(textures=None) goes through the PPM loader
    # (load_texture_to_gpu analogue); missing files become 1x1 white.
    from tryraytrace_tpu.io.ppm import save_ppm
    from tryraytrace_tpu.scene.model import flatten_scene as fs

    tex = (np.arange(4 * 4 * 3) % 256).astype(np.uint8).reshape(4, 4, 3)
    p = tmp_path / "t.ppm"
    save_ppm(p, tex)
    scene = create_cornell_box(mesh=None)
    scene.texture_files = [str(p), str(tmp_path / "missing.ppm")]
    arrays = fs(scene)
    assert len(arrays.textures) == 2
    np.testing.assert_allclose(arrays.textures[0],
                               tex.astype(np.float32) / 255.0)
    assert arrays.textures[1].shape == (1, 1, 3)
    assert (arrays.textures[1] == 1.0).all()


def test_max_textures_cap(tmp_path):
    # MAX_TEXTURES = 5 parity (renderer.cu:20).
    from tryraytrace_tpu.scene.model import MAX_TEXTURES, flatten_scene as fs

    scene = create_cornell_box(mesh=None)
    scene.texture_files = [str(tmp_path / f"t{i}.ppm") for i in range(8)]
    arrays = fs(scene)
    assert len(arrays.textures) == MAX_TEXTURES
