"""Auto BVH leaf-size selection (``bvh_leaf_size=0``, the default).

The in-loop traversal gather is flat below ~3 MB of fused-row table
and pays ~0.06 ms/MB above it (docs/PERFORMANCE.md).  Auto mode picks
the largest fat leaf in {8, 6, 4} whose table stays under that knee
FOR THE SELECTED TRAVERSAL's rows AND its measured knee: threaded
rows (9K+24, 3 MB knee) push the 15k-triangle flythrough scene to
leaf 6; the narrower pair rows (10+9K) keep it at 8; the compacted
quad table (the default traversal) has a tighter measured knee
(~2.3 MB, round 5) that also lands flythrough on leaf 6 while teddy
keeps 8.
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


def _table_bytes(bvh, width_of=traversal_row_width, leaf_fmt="mt"):
    w = width_of(int(max(1, bvh.leaf_count.max())), leaf_fmt)
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


def test_big_scene_quad_drops_to_leaf6():
    arrays = build_config("flythrough1080")[0]  # 15 323 tris
    # leaf_fmt="bw" = the production default (config.leaf_isect);
    # bw rows are 12 f32/slot vs mt's 9, which is what pushes the
    # leaf-8 table past the quad knee.
    _, _, bvh = upload_scene(arrays, leaf_size=0, device_put=False,
                             leaf_fmt="bw")
    # Measured on chip (round 5, sweeps/r5_batch1.jsonl): flythrough
    # under quad runs 15.77 Mrays/s at leaf 6 (1.95 MB) vs 15.23 at
    # leaf 8 (2.48 MB) and 14.19 at leaf 4 -- the quad knee sits at
    # ~2.3 MB, tighter than the threaded/pair 3 MB one (teddy's
    # 2.13 MB leaf-8 table is penalty-free at 19.52).
    assert int(bvh.leaf_count.max()) == 6
    assert _table_bytes(bvh, quad_row_width, "bw") <= 2.3e6


def test_teddy_scene_quad_keeps_leaf8():
    arrays = build_config("teddy1024")[0]  # 13 199 tris
    _, _, bvh = upload_scene(arrays, leaf_size=0, device_put=False,
                             leaf_fmt="bw")
    # teddy's quad table is 2.13 MB at leaf 8 -- under the 2.3 MB quad
    # knee, and measured penalty-free on chip (19.52 Mrays/s).
    assert int(bvh.leaf_count.max()) == 8
    assert _table_bytes(bvh, quad_row_width, "bw") <= 2.3e6


def test_explicit_leaf_size_still_honoured():
    arrays = flatten_scene(create_cornell_box(mesh=None))
    _, _, bvh = upload_scene(arrays, leaf_size=4, device_put=False)
    assert int(bvh.leaf_count.max()) <= 4
