"""Auto BVH leaf-size selection (``bvh_leaf_size=0``, the default).

The in-loop traversal gather is flat below ~3 MB of fused-row table
and pays ~0.06 ms/MB above it (docs/PERFORMANCE.md).  Auto mode picks
the largest fat leaf in {8, 6, 4} whose table stays under that knee
FOR THE SELECTED TRAVERSAL's rows: threaded rows (9K+24) push the
15k-triangle flythrough scene to leaf 6, while the narrower pair rows
(10+9K) and the compacted quad table (collapsed-away binary internals
have no row; the default traversal) keep it at the leaf-8 optimum.
Replaces the reference's single compile-time leaf shape
(/root/reference/src/bvh.cpp:67-72).
"""
import numpy as np

from tryraytrace_tpu.accel.bvh import (collapse_bvh, pair_row_width,
                                       quad_row_width, traversal_row_width)
from tryraytrace_tpu.benchmarks import build_config
from tryraytrace_tpu.engine.device_scene import upload_scene
from tryraytrace_tpu.scene.cornell import create_cornell_box
from tryraytrace_tpu.scene.model import flatten_scene

KNEE = 3.0e6


def _table_bytes(bvh, width_of=traversal_row_width):
    w = width_of(int(max(1, bvh.leaf_count.max())))
    rows = bvh.num_nodes
    if width_of is quad_row_width and rows:
        rows = len(collapse_bvh(bvh)) + int((bvh.leaf_count > 0).sum())
    return rows * w * 4


def test_small_scene_keeps_headline_leaf8():
    arrays = flatten_scene(create_cornell_box())  # teapot, 6327 tris
    _, _, bvh = upload_scene(arrays, leaf_size=0, device_put=False)
    assert int(bvh.leaf_count.max()) == 8
    assert _table_bytes(bvh, quad_row_width) <= KNEE


def test_big_scene_drops_under_knee_threaded():
    arrays = build_config("flythrough1080")[0]  # 15 323 tris
    _, _, bvh = upload_scene(arrays, leaf_size=0, device_put=False,
                             traversal="threaded")
    # leaf 8 would be 3.20 MB of threaded rows (over the knee); auto
    # must land under it
    assert int(bvh.leaf_count.max()) == 6
    assert _table_bytes(bvh) <= KNEE


def test_big_scene_pair_rows_keep_leaf8():
    arrays = build_config("flythrough1080")[0]  # 15 323 tris
    _, _, bvh = upload_scene(arrays, leaf_size=0, device_put=False,
                             traversal="pair")
    # pair rows are 10+9K wide (no per-octant link block): the same
    # scene fits the knee at the leaf-8 optimum
    assert int(bvh.leaf_count.max()) == 8
    assert _table_bytes(bvh, pair_row_width) <= KNEE


def test_big_scene_quad_rows_keep_leaf8():
    arrays = build_config("flythrough1080")[0]  # 15 323 tris
    _, _, bvh = upload_scene(arrays, leaf_size=0, device_put=False)
    # the compacted quad table (~rows/2 of the binary node count) fits
    # the knee at leaf 8 with margin under the default traversal
    assert int(bvh.leaf_count.max()) == 8
    assert _table_bytes(bvh, quad_row_width) <= KNEE


def test_explicit_leaf_size_still_honoured():
    arrays = flatten_scene(create_cornell_box(mesh=None))
    _, _, bvh = upload_scene(arrays, leaf_size=4, device_put=False)
    assert int(bvh.leaf_count.max()) <= 4
