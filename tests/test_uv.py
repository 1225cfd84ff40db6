"""UV texture mapping (beyond-reference, flag-gated).

The reference has no UV path at all: its loader skips slash-form faces
(loader.cpp:65-68) and drops ``vt`` lines, and texturing is planar
projection only (renderer.cu:463-481).  RenderConfig.uv_mapping adds
barycentric-interpolated per-vertex UVs behind a flag whose default
keeps reference parity; these tests pin (a) the UV-aware parser, (b)
default-off bit-parity, and (c) engine/oracle agreement with UVs on.
"""

import os
import tempfile

import numpy as np
import pytest

from tryraytrace_tpu.camera.controller import CameraController
from tryraytrace_tpu.config import RenderConfig
from tryraytrace_tpu.engine.renderer import Renderer
from tryraytrace_tpu.oracle.cpu_renderer import oracle_render
from tryraytrace_tpu.scene.assets import checker_texture
from tryraytrace_tpu.scene.cornell import create_cornell_box
from tryraytrace_tpu.scene.model import Object, flatten_scene
from tryraytrace_tpu.scene.objloader import (
    load_obj,
    parse_obj_arrays,
    parse_obj_arrays_uv,
)

MSE_EXPECT = 1e-9

OBJ_TEXT = """\
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vt 0 0
vt 1 0
vt 0 1
vt 1 1
f 1/1 2/2 3/3
f 2/2 4/4 3/3
f 1 2 4
f 1//1 2//1 4//1
f 1/1 2/2 3/3 4/4
f 9/1 2/2 3/3
f 1/9 2/2 3/3
"""


def _write_obj(text):
    f = tempfile.NamedTemporaryFile("w", suffix=".obj", delete=False)
    f.write(text)
    f.close()
    return f.name


def test_parse_uv_forms():
    path = _write_obj(OBJ_TEXT)
    try:
        verts, faces, uvs, uv_faces = parse_obj_arrays_uv(path)
    finally:
        os.unlink(path)
    assert verts.shape == (4, 3) and uvs.shape == (4, 2)
    # Faces: 2 full v/vt, 1 plain, 1 v//vn, quad -> first tri, 1
    # out-of-range vertex skipped, 1 out-of-range vt kept w/o UVs.
    assert faces.shape[0] == 6
    np.testing.assert_array_equal(uv_faces[0], [0, 1, 2])
    np.testing.assert_array_equal(uv_faces[1], [1, 3, 2])
    np.testing.assert_array_equal(uv_faces[2], [-1, -1, -1])  # plain
    np.testing.assert_array_equal(uv_faces[3], [-1, -1, -1])  # v//vn
    np.testing.assert_array_equal(uv_faces[4], [0, 1, 2])     # quad
    np.testing.assert_array_equal(uv_faces[5], [-1, -1, -1])  # vt OOR


def test_reference_parser_still_skips_slash_faces():
    # Parity guard: the sscanf-exact default parser must keep dropping
    # slash-form faces even now that a UV-aware mode exists.
    path = _write_obj(OBJ_TEXT)
    try:
        _, faces = parse_obj_arrays(path)
    finally:
        os.unlink(path)
    # Only "f 1 2 4" fully matches sscanf("f %d %d %d").
    assert faces.shape[0] == 1


def test_load_obj_attaches_uvs():
    path = _write_obj(OBJ_TEXT)
    objects = []
    try:
        n = load_obj(path, objects, parse_uv=True, tex_id=0)
    finally:
        os.unlink(path)
    assert n == 6
    assert objects[0].uv0 == (0.0, 0.0)
    assert objects[0].uv1 == (1.0, 0.0)
    assert objects[0].uv2 == (0.0, 1.0)
    assert objects[2].uv0 is None
    assert all(o.tex_id == 0 for o in objects)


def _uv_quad_scene(with_uvs=True):
    """Cornell walls + a textured quad on the back wall whose UVs span
    the unit square (so interpolated sampling differs visibly from the
    0.01-scale planar projection)."""
    scene = create_cornell_box(mesh=None)
    # In front of the textured back wall (z=0; the camera sits at
    # z=295.6 looking toward -z, camera/controller.py).  The UVs are
    # rotated 90 degrees and tiled 2x so interpolated sampling differs
    # unmistakably from the 0.01-scale planar projection.
    quad = (((0, 30, 1), (100, 30, 1), (100, 170, 1),
             (0, 170, 1)))
    uvq = ((0, 0), (0, 2), (2, 2), (2, 0))
    for ia, ib, ic in ((0, 1, 2), (0, 2, 3)):
        kw = {}
        if with_uvs:
            kw = dict(uv0=uvq[ia], uv1=uvq[ib], uv2=uvq[ic])
        scene.objects.append(Object(
            v0=quad[ia], v1=quad[ib], v2=quad[ic],
            albedo=(0.9, 0.9, 0.9), roughness=1.0, tex_id=0, **kw))
    return flatten_scene(scene, textures=[checker_texture(16)])


def _render(arrays, cfg):
    r = Renderer(arrays, cfg=cfg)
    cam = CameraController()
    params = cam.get_params(cfg.width, cfg.height)
    r.frame = 1
    r.step(params)
    return r.accum_host().reshape(-1, 3)


@pytest.mark.parametrize("engine", ["persistent", "bounce"])
def test_uv_golden_vs_oracle(engine):
    arrays = _uv_quad_scene()
    cfg = RenderConfig(width=32, height=24, spp=2, uv_mapping=True,
                       engine=engine)
    eng = _render(arrays, cfg)
    cam = CameraController()
    ora = oracle_render(arrays, cam.get_params(32, 24), 32, 24,
                        frame_seed=1, spp=2, cfg=cfg)
    assert float(((eng - ora) ** 2).mean()) < MSE_EXPECT


def test_uv_flag_off_is_planar_bit_parity():
    # Same geometry with and without UV data, flag off: the compiled
    # program must ignore the UV columns entirely.
    cfg = RenderConfig(width=24, height=16, spp=1)
    a = _render(_uv_quad_scene(with_uvs=True), cfg)
    b = _render(_uv_quad_scene(with_uvs=False), cfg)
    np.testing.assert_array_equal(a, b)


def test_uv_mapping_changes_the_image():
    # The quad's unit-square UVs vs the 0.01-scale planar projection:
    # the checker pattern must actually move.
    arrays = _uv_quad_scene()
    on = _render(arrays, RenderConfig(width=24, height=16, spp=1,
                                      uv_mapping=True))
    off = _render(arrays, RenderConfig(width=24, height=16, spp=1))
    assert float(np.abs(on - off).max()) > 1e-3


def test_interp_uv_at_corners():
    import jax.numpy as jnp

    from tryraytrace_tpu.ops.shade import barycentric
    from tryraytrace_tpu.ops.texture import interp_uv

    v0 = jnp.asarray([[0.0, 0.0, 0.0]])
    v1 = jnp.asarray([[2.0, 0.0, 0.0]])
    v2 = jnp.asarray([[0.0, 2.0, 0.0]])
    uvrow = jnp.asarray([[0.1, 0.2, 0.9, 0.2, 0.1, 0.8]])
    for pt, want in (((0, 0, 0), (0.1, 0.2)), ((2, 0, 0), (0.9, 0.2)),
                     ((0, 2, 0), (0.1, 0.8)),
                     ((2 / 3, 2 / 3, 0), (1.1 / 3, 1.2 / 3))):
        b1, b2, ok = barycentric(v0, v1, v2, jnp.asarray([pt], jnp.float32))
        assert bool(ok[0])
        u, v = interp_uv(uvrow, b1, b2)
        assert abs(float(u[0]) - want[0]) < 1e-6
        assert abs(float(v[0]) - (1.0 - want[1])) < 1e-6
