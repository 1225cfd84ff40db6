"""Multi-chip sharding on the 8-virtual-CPU-device mesh: the sharded
render must be bit-identical to the single-device render (RNG streams
are keyed by absolute pixel/sample index, so tiling cannot change the
image)."""

import numpy as np
import jax
import pytest

from tryraytrace_tpu.camera.controller import CameraController
from tryraytrace_tpu.config import RenderConfig
from tryraytrace_tpu.engine.renderer import Renderer
from tryraytrace_tpu.parallel.mesh import make_mesh
from tryraytrace_tpu.parallel.shard import ShardedRenderer
from tryraytrace_tpu.scene.assets import checker_texture
from tryraytrace_tpu.scene.cornell import create_cornell_box
from tryraytrace_tpu.scene.model import flatten_scene


@pytest.fixture(scope="module")
def arrays():
    scene = create_cornell_box(mesh=None)
    return flatten_scene(scene, textures=[checker_texture(32)])


def _single(arrays, w, h, spp, frames=1):
    r = Renderer(arrays, cfg=RenderConfig(width=w, height=h, spp=spp))
    cam = CameraController()
    p = cam.get_params(w, h)
    for _ in range(frames):
        r.step(p)
    return r.accum_host()


def _sharded(arrays, w, h, spp, tile, sample, frames=1, **cfg_kw):
    mesh = make_mesh(tile=tile, sample=sample)
    r = ShardedRenderer(arrays, RenderConfig(width=w, height=h, spp=spp,
                                             **cfg_kw), mesh=mesh)
    cam = CameraController()
    p = cam.get_params(w, h)
    for _ in range(frames):
        r.step(p)
    return r.accum_host()


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_tile_sharded_bit_identical(arrays):
    # sp=1: pure pixel tiling, no reduction anywhere -- the sharded
    # image must be EXACTLY the single-chip image, bit for bit (RNG
    # streams are keyed by absolute pixel/sample index).
    w, h, spp = 32, 16, 8
    ref = _single(arrays, w, h, spp)
    out = _sharded(arrays, w, h, spp, tile=8, sample=1)
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("tile,sample", [(4, 2), (2, 4), (1, 8)])
def test_sharded_matches_single(arrays, tile, sample):
    w, h, spp = 32, 16, 8
    ref = _single(arrays, w, h, spp)
    out = _sharded(arrays, w, h, spp, tile, sample)
    # sample-parallel partials are psum'd in a different order than the
    # sequential single-chip accumulation, so allow float addition
    # reassociation but nothing more.
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-4)


def test_sharded_wave_chunking_bit_identical(arrays):
    # max_wave_lanes smaller than the shard width forces the chunked
    # persistent-wave path *inside* shard_map (each shard renders its
    # rows in sequential chunks); chunking never changes the image.
    w, h, spp = 32, 16, 4
    ref = _single(arrays, w, h, spp)
    out = _sharded(arrays, w, h, spp, tile=8, sample=1,
                   max_wave_lanes=24)
    np.testing.assert_array_equal(out, ref)


def test_sharded_quota_bit_identical(arrays):
    # Quota scheduler under shard_map: the shard's contiguous pixel
    # block is passed with its affine base (shard.py -> render_frame
    # pixel_affine_base), so quota runs its inline in-step refill on
    # every shard; sp=1 means no reduction and the image must equal
    # the single-chip quota render bit for bit.
    w, h, spp = 32, 16, 8
    r = Renderer(arrays, cfg=RenderConfig(width=w, height=h, spp=spp,
                                          scheduler="quota"))
    cam = CameraController()
    p = cam.get_params(w, h)
    r.step(p)
    ref = r.accum_host()
    out = _sharded(arrays, w, h, spp, tile=8, sample=1,
                   scheduler="quota")
    np.testing.assert_array_equal(out, ref)


def test_sharded_progressive(arrays):
    ref = _single(arrays, 16, 16, 2, frames=3)
    out = _sharded(arrays, 16, 16, 2, 4, 2, frames=3)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_bad_divisibility_raises(arrays):
    mesh = make_mesh(tile=8, sample=1)
    cam = CameraController()
    with pytest.raises(ValueError):
        # 30 pixels over 8 tile shards: rejected at sharding or step time.
        r = ShardedRenderer(arrays, RenderConfig(width=10, height=3, spp=1),
                            mesh=mesh)
        r.step(cam.get_params(10, 3))


def test_bad_spp_divisibility_raises(arrays):
    mesh = make_mesh(tile=2, sample=4)
    cam = CameraController()
    r = ShardedRenderer(arrays, RenderConfig(width=16, height=16, spp=1),
                        mesh=mesh)
    with pytest.raises(ValueError):
        r.step(cam.get_params(16, 16), spp=3)  # 3 % 4 != 0


def test_spp_change_mid_accumulation_raises(arrays):
    # The seed schedule 1984 + frame*spp + sample (core/rng.py) aliases
    # streams if spp changes between steps; the renderer must refuse.
    cam = CameraController()
    r = ShardedRenderer(arrays, RenderConfig(width=16, height=16, spp=2),
                        mesh=make_mesh(tile=4, sample=2))
    p = cam.get_params(16, 16)
    r.step(p)
    with pytest.raises(ValueError, match="alias"):
        r.step(p, spp=4)
    r.reset()
    r.step(p, spp=4)  # fine after reset

    from tryraytrace_tpu.engine.renderer import Renderer
    r1 = Renderer(arrays, cfg=RenderConfig(width=16, height=16, spp=2))
    r1.step(p)
    with pytest.raises(ValueError, match="alias"):
        r1.step(p, spp=4)
