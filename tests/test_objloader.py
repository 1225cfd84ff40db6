import numpy as np

from tryraytrace_tpu.scene.model import Object
from tryraytrace_tpu.scene.objloader import (
    _parse_obj_python,
    load_obj,
    load_obj_soa,
)

OBJ = """\
# comment
v 0 0 0
v 1 0 0
v 0 1 0
v 0 0 1
vn 0 0 1
vt 0.5 0.5
f 1 2 3
f 1 2 3 4
f 1/1 2/2 3/3
f 1 2 3/9
f 9 2 3
f 1 2
g group
"""


def test_parse_semantics(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(OBJ)
    verts, faces = _parse_obj_python(p)
    assert verts.shape == (4, 3)
    # Accepted: "f 1 2 3", "f 1 2 3 4" (quad -> first tri),
    # "f 1 2 3/9" (third token only needs a leading int).
    # Rejected: slash syntax on the first two tokens, out-of-range,
    # two-index faces (sscanf parity, loader.cpp:63-74).
    assert faces.shape == (3, 3)
    np.testing.assert_array_equal(faces, [[0, 1, 2]] * 3)


def test_bake_transform(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text("v 1 1 1\nv 2 0 0\nv 0 2 0\nf 1 2 3\n")
    objs: list[Object] = []
    n = load_obj(p, objs, offset=(10, 20, 30), scale=2.0,
                 albedo=(0.5, 0.5, 0.5), metallic=1.0, roughness=0.25)
    assert n == 1 and len(objs) == 1
    o = objs[0]
    np.testing.assert_allclose(o.v0, (12, 22, 32))
    np.testing.assert_allclose(o.v1, (14, 20, 30))
    assert o.metallic == 1.0 and o.roughness == 0.25
    assert o.tex_id == -1 and o.emission == (0.0, 0.0, 0.0)


def test_missing_file_is_soft():
    objs: list[Object] = []
    assert load_obj("/nonexistent/nope.obj", objs) == 0
    assert objs == []


def test_load_obj_soa(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    v0, v1, v2 = load_obj_soa(p, offset=(1, 0, 0), scale=3.0)
    np.testing.assert_allclose(v0, [[1, 0, 0]])
    np.testing.assert_allclose(v1, [[4, 0, 0]])
    np.testing.assert_allclose(v2, [[1, 3, 0]])


def test_reference_assets_if_present():
    from tryraytrace_tpu.scene.assets import find_asset

    path = find_asset("cube.obj")
    if path is None:
        return  # assets unavailable in this environment
    verts, faces = _parse_obj_python(path)
    assert faces.shape[0] == 12  # cube.obj: 12 triangles (SURVEY.md)
    assert (faces >= 0).all() and (faces < verts.shape[0]).all()
