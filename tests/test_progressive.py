"""The cross-frame progressive engine is a pure scheduling transform
of the batch owner engine: with a finite spp cap it must accumulate
the SAME per-pixel sample sums (slot-addressed RNG keyed by absolute
(pixel, sample) -- engine/progressive.py)."""

import numpy as np
import pytest

from tryraytrace_tpu.camera.controller import CameraController
from tryraytrace_tpu.config import RenderConfig
from tryraytrace_tpu.engine.progressive import ProgressiveRenderer
from tryraytrace_tpu.engine.renderer import Renderer
from tryraytrace_tpu.scene.assets import checker_texture, cube_mesh
from tryraytrace_tpu.scene.cornell import create_cornell_box
from tryraytrace_tpu.scene.model import Object, flatten_scene

W, H, SPP = 40, 24, 3

# Same bound as tests/test_persistent_engine.py: XLA may fuse the two
# wrappers' arithmetic differently (fma contraction), so allow
# last-ULP drift; anything above means a real divergence.
_ULP = dict(rtol=2e-6, atol=1e-6)


@pytest.fixture(scope="module")
def arrays():
    scene = create_cornell_box(mesh=None)
    v0, v1, v2 = cube_mesh()
    for a, b, c in zip(v0 * 14 + [40, 20, 60], v1 * 14 + [40, 20, 60],
                       v2 * 14 + [40, 20, 60]):
        scene.objects.append(Object(v0=tuple(a), v1=tuple(b), v2=tuple(c),
                                    albedo=(0.9, 0.9, 0.9), metallic=0.3,
                                    roughness=0.4))
    return flatten_scene(scene, textures=[checker_texture(32)])


def _batch(arrays, spp=SPP, frame_seed=1):
    cfg = RenderConfig(width=W, height=H, spp=spp)
    r = Renderer(arrays, cfg=cfg)
    cam = CameraController()
    r.frame = frame_seed  # step() uses self.frame as the seed
    r.step(cam.get_params(W, H), spp=spp)
    return r.accum_host().reshape(-1, 3)


def _progressive(arrays, spp=SPP, frame_seed=1, max_wave=0,
                 iters_per_call=40):
    cfg = RenderConfig(width=W, height=H)
    if max_wave:
        cfg = cfg.replace(max_wave_lanes=max_wave)
    pr = ProgressiveRenderer(arrays, cfg=cfg, spp_cap=spp,
                             frame_seed=frame_seed, seed_spp=spp)
    cam = CameraController().get_params(W, H)
    for _ in range(200):
        pr.step(cam, iters_per_call)
        if pr.done():
            break
    assert pr.done(), "wave did not drain under the spp cap"
    return pr


def test_matches_batch_engine(arrays):
    accum, counts = _progressive(arrays).snapshot()
    assert (counts == SPP).all()
    np.testing.assert_allclose(accum, _batch(arrays), **_ULP)


def test_matches_batch_chunked(arrays):
    # Multiple chunks with an overhang (W*H=960 pixels, 256-lane waves
    # -> 4 chunks of 240): chunking must not change sums or counts.
    pr = _progressive(arrays, max_wave=256)
    accum, counts = pr.snapshot()
    assert (counts == SPP).all()
    np.testing.assert_allclose(accum, _batch(arrays), **_ULP)


def test_state_persists_across_calls(arrays):
    # Tiny per-call iteration budgets (many donated-state round trips)
    # must land on the same sums as big ones.
    a = _progressive(arrays, iters_per_call=7).snapshot()[0]
    b = _progressive(arrays, iters_per_call=160).snapshot()[0]
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_reset_discards_state(arrays):
    pr = _progressive(arrays)
    pr.reset()
    cam = CameraController().get_params(W, H)
    for _ in range(200):
        pr.step(cam, 40)
        if pr.done():
            break
    accum, counts = pr.snapshot()
    assert (counts == SPP).all()
    np.testing.assert_allclose(accum, _batch(arrays), **_ULP)


def test_unbounded_counts_progress(arrays):
    # Default (unbounded) mode: counts grow with iterations and the
    # partial image normalizes per pixel.
    cfg = RenderConfig(width=W, height=H)
    pr = ProgressiveRenderer(arrays, cfg=cfg)
    cam = CameraController().get_params(W, H)
    pr.step(cam, 30)
    _, c1 = pr.snapshot()
    pr.step(cam, 30)
    accum, c2 = pr.snapshot()
    assert (c2 >= c1).all() and c2.sum() > c1.sum()
    assert pr.rays_traced() > 0
    img = accum / np.maximum(c2, 1)[:, None]
    assert np.isfinite(img).all()


def test_rejects_unsupported_configs(arrays):
    with pytest.raises(ValueError, match="owner"):
        ProgressiveRenderer(arrays,
                            cfg=RenderConfig(width=W, height=H,
                                             scheduler="pool"))
    with pytest.raises(ValueError, match="fatnode|traversal"):
        ProgressiveRenderer(arrays,
                            cfg=RenderConfig(width=W, height=H,
                                             traversal="fatnode"))
