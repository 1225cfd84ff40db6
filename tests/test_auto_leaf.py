"""Auto BVH leaf-size selection (``bvh_leaf_size=0``, the default).

The in-loop traversal gather is flat below ~3 MB of fused-row table
and pays ~0.06 ms/MB above it (docs/PERFORMANCE.md).  Auto mode picks
the largest fat leaf in {8, 6, 4} whose table stays under that knee:
small scenes keep the 8-wide headline optimum, 15k+-triangle scenes
drop to 6 (measured +6% on flythrough1080).  Replaces the reference's
single compile-time leaf shape (/root/reference/src/bvh.cpp:67-72).
"""
import numpy as np

from tryraytrace_tpu.accel.bvh import traversal_row_width
from tryraytrace_tpu.benchmarks import build_config
from tryraytrace_tpu.engine.device_scene import upload_scene
from tryraytrace_tpu.scene.cornell import create_cornell_box
from tryraytrace_tpu.scene.model import flatten_scene

KNEE = 3.0e6


def _table_mb(bvh):
    w = traversal_row_width(int(max(1, bvh.leaf_count.max())))
    return bvh.num_nodes * w * 4


def test_small_scene_keeps_headline_leaf8():
    arrays = flatten_scene(create_cornell_box())  # teapot, 6327 tris
    _, _, bvh = upload_scene(arrays, leaf_size=0, device_put=False)
    assert int(bvh.leaf_count.max()) == 8
    assert _table_mb(bvh) <= KNEE


def test_big_scene_drops_under_knee():
    arrays = build_config("flythrough1080")[0]  # 15 323 tris
    _, _, bvh = upload_scene(arrays, leaf_size=0, device_put=False)
    # leaf 8 would be 3.20 MB (over the knee); auto must land under it
    assert int(bvh.leaf_count.max()) == 6
    assert _table_mb(bvh) <= KNEE


def test_explicit_leaf_size_still_honoured():
    arrays = flatten_scene(create_cornell_box(mesh=None))
    _, _, bvh = upload_scene(arrays, leaf_size=4, device_put=False)
    assert int(bvh.leaf_count.max()) <= 4
