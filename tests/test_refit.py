"""BVH refit for animated geometry (beyond-reference).

The reference builds its BVH once and uploads the scene once
(bvh.cpp:32-45, renderer.cu:134-184) -- geometry can never move.
``refit_bvh`` reuses the tree topology and recomputes bounds in O(N);
``Renderer.refit`` swaps deformed geometry in without recompiling the
jitted step.
"""

import numpy as np
import pytest

from tryraytrace_tpu.accel.bvh import build_bvh, primitive_bounds, refit_bvh
from tryraytrace_tpu.camera.controller import CameraController
from tryraytrace_tpu.config import RenderConfig
from tryraytrace_tpu.engine.renderer import Renderer, _render_step
from tryraytrace_tpu.oracle.cpu_renderer import oracle_render
from tryraytrace_tpu.scene.assets import checker_texture, cube_mesh
from tryraytrace_tpu.scene.cornell import create_cornell_box
from tryraytrace_tpu.scene.model import Object, flatten_scene


def _rand_mesh(n=200, seed=0):
    rng = np.random.RandomState(seed)
    v0 = (rng.rand(n, 3).astype(np.float32) - 0.5) * 100
    e = (rng.rand(n, 2, 3).astype(np.float32) - 0.5) * 8
    return v0, v0 + e[:, 0], v0 + e[:, 1]


@pytest.mark.parametrize("method", ["sah", "median"])
def test_refit_bounds_invariants(method):
    v0, v1, v2 = _rand_mesh()
    bvh = build_bvh(v0, v1, v2, leaf_size=4, method=method)
    s0, s1, s2 = v0[bvh.perm], v1[bvh.perm], v2[bvh.perm]

    # Deform: nonuniform squash + jitter.
    rng = np.random.RandomState(1)
    def deform(v):
        return (v * np.float32([1.3, 0.6, 1.0])
                + rng.rand(1, 3).astype(np.float32) * 5)
    d0, d1, d2 = deform(s0), deform(s1), deform(s2)
    new = refit_bvh(bvh, d0, d1, d2)

    # Topology untouched.
    for f in ("leaf_prim", "leaf_count", "miss", "left", "right", "perm"):
        np.testing.assert_array_equal(getattr(new, f), getattr(bvh, f))

    # Every leaf's (padded) primitive boxes inside the leaf bounds.
    pb = primitive_bounds(d0, d1, d2)
    for i in np.nonzero(new.leaf_count > 0)[0]:
        s, c = new.leaf_prim[i], new.leaf_count[i]
        assert (pb[s:s + c, :3] >= new.bounds[i, :3] - 1e-6).all()
        assert (pb[s:s + c, 3:] <= new.bounds[i, 3:] + 1e-6).all()

    # Parent bounds contain child bounds.
    for i in np.nonzero(new.left >= 0)[0]:
        for ch in (new.left[i], new.right[i]):
            assert (new.bounds[ch, :3] >= new.bounds[i, :3] - 1e-6).all()
            assert (new.bounds[ch, 3:] <= new.bounds[i, 3:] + 1e-6).all()


def _cube_scene(offset):
    scene = create_cornell_box(mesh=None)
    v0, v1, v2 = cube_mesh()
    for a, b, c in zip(v0 * 14 + offset, v1 * 14 + offset,
                       v2 * 14 + offset):
        scene.objects.append(Object(v0=tuple(a), v1=tuple(b), v2=tuple(c),
                                    albedo=(0.7, 0.5, 0.3), roughness=0.8))
    return flatten_scene(scene, textures=[checker_texture(16)])


def test_renderer_refit_matches_oracle_and_skips_recompile():
    w, h = 32, 24
    cfg = RenderConfig(width=w, height=h, spp=2)
    r = Renderer(_cube_scene(np.float32([50, 25, 50])), cfg=cfg)
    cam = CameraController()
    params = cam.get_params(w, h)
    r.step(params)
    r.block_until_ready()
    misses_before = _render_step._cache_size()

    # Move the cube; refit; the render must match the brute-force
    # oracle of the DEFORMED scene (a stale-BVH bug would miss the
    # cube at its new location entirely).
    moved = _cube_scene(np.float32([30, 45, 70]))
    r.refit(moved)
    r.step(params)
    eng = r.accum_host().reshape(-1, 3) / 2
    ora = oracle_render(moved, params, w, h, frame_seed=1, spp=2,
                        cfg=cfg) / 2
    assert float(((eng - ora) ** 2).mean()) < 1e-9

    # Same shapes + static fields -> the jitted step was reused.
    assert _render_step._cache_size() == misses_before


def test_refit_rejects_topology_change():
    r = Renderer(_cube_scene(np.float32([50, 25, 50])),
                 cfg=RenderConfig(width=16, height=12, spp=1))
    smaller = flatten_scene(create_cornell_box(mesh=None),
                            textures=[checker_texture(8)])
    with pytest.raises(ValueError, match="topology"):
        r.refit(smaller)
