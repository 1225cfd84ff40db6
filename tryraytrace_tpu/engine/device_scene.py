"""Device-resident scene: the upload step.

Analogue of init_scene_data (reference renderer.cu:134-184): move the
flattened SoA scene arrays plus the threaded BVH on-device as one
pytree.  On multi-chip meshes the arrays are replicated (the scene is
read-only during tracing; image tiles are what gets sharded), which is
the ICI-friendly layout for this workload.
"""

from __future__ import annotations

import sys

import dataclasses

import jax
import numpy as np

from tryraytrace_tpu.accel.bvh import (
    LinearBVH,
    build_bvh,
    pack_fatnode_table,
    pack_pair_table,
    pack_quad_oct_table,
    pack_quad_table,
    pack_traversal_table,
    pack_trimat_table,
    refit_bvh,
)
from tryraytrace_tpu.scene.model import SceneArrays


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceScene:
    """All scene state the render kernels read. Everything is a JAX
    array (data field) so a DeviceScene can flow through jit."""

    tri_v0: jax.Array
    tri_v1: jax.Array
    tri_v2: jax.Array
    albedo: jax.Array
    emission: jax.Array
    metallic: jax.Array
    roughness: jax.Array
    ior: jax.Array
    transmission: jax.Array
    tex_id: jax.Array
    light_indices: jax.Array   # [max(L,1)] i32 (padded to 1 when L=0)
    bvh_bounds: jax.Array      # [M, 6]
    bvh_leaf_prim: jax.Array   # [M]
    bvh_miss: jax.Array        # [M]
    node_table: jax.Array      # [M, 9K+24] threaded traversal rows
    fatnode_table: jax.Array   # [M, 2+max(14,9K)] fat-node traversal rows
    pair_table: jax.Array      # [M, 10+max(15,9K)] pair-row traversal rows
    quad_table: jax.Array      # [R, 10+max(37,9K)] quad-row traversal rows
    trimat: jax.Array          # [T, 24] fused triangle+material rows
    num_lights: int = dataclasses.field(metadata=dict(static=True))
    # Static: any nonzero vertex normals in the scene?  When False the
    # engines skip the smooth-shading block entirely, so the compiled
    # program (and therefore the image, bit-for-bit) is identical with
    # the flag on or off for normal-less scenes.
    has_normals: bool = dataclasses.field(metadata=dict(static=True),
                                          default=False)
    # Static: any triangle with real per-corner UVs?  Same compile-out
    # contract as has_normals for the uv_mapping flag.
    has_uvs: bool = dataclasses.field(metadata=dict(static=True),
                                      default=False)
    leaf_size: int = dataclasses.field(metadata=dict(static=True), default=8)
    # Static: leaf slot format of every packed traversal table -- "mt"
    # (v0, e1, e2) or "bw" (Baldwin-Weber (n, v0, bu, bv) transform,
    # ~30% fewer VPU ops per slot in the step program).  The engines
    # decode with the matching ops/intersect kernel; the oracle mirrors
    # the same precomputed rows for bit-comparability.
    leaf_fmt: str = dataclasses.field(metadata=dict(static=True),
                                      default="mt")
    # Static: quad-table collapse criterion ("count" topology-only /
    # "sa" surface-area greedy, accel/bvh.collapse_bvh) -- recorded so
    # refit_scene repacks with the same criterion.
    quad_collapse: str = dataclasses.field(metadata=dict(static=True),
                                           default="count")
    # Static: quad-table layout -- "mux" (shared rows + per-octant
    # packed cont*256+perm columns) or "octant" (internal rows
    # replicated once per ray octant with pre-permuted slots,
    # pack_quad_oct_table; drops the decode's permutation mux network
    # at ~3x the internal-row bytes).
    quad_layout: str = dataclasses.field(metadata=dict(static=True),
                                         default="mux")
    # Static: internal-replica stride of the octant layout (row of
    # octant o's root = o * stride); 0 under "mux".
    quad_oct_stride: int = dataclasses.field(metadata=dict(static=True),
                                             default=0)
    # Static: first-entered-child decode the quad table was packed for
    # -- "perm" (packed pos->slot byte, _quad_decode's mux network) or
    # "rank" (packed slot->pos byte, _quad_decode_rank's argmin;
    # register-free walks only).  The engine's decode choice MUST
    # follow this field: the packed octant column's low byte means
    # different things under each.
    quad_select: str = dataclasses.field(metadata=dict(static=True),
                                         default="perm")
    # Tree depth (static): sizes the fat-node register stack exactly --
    # stack traffic scales with depth, so tighter is faster.
    tree_depth: int = dataclasses.field(metadata=dict(static=True),
                                        default=32)

    @property
    def num_objects(self) -> int:
        return int(self.tri_v0.shape[0])

    @property
    def num_nodes(self) -> int:
        return int(self.bvh_bounds.shape[0])


def _build_auto_leaf(arrays: SceneArrays, method: str,
                     traversal: str = "threaded", c_isect: float = 0.4,
                     leaf_fmt: str = "mt", quad_collapse: str = "count"):
    """Auto leaf size: the largest fat leaf whose fused traversal
    table stays under the measured ~3 MB gather knee (tables above it
    pay ~0.06 ms/MB per in-loop row fetch, docs/PERFORMANCE.md).
    Small scenes keep the 8-wide headline optimum; 13k+-triangle
    scenes drop to 6 (measured +6% on flythrough1080).  Images are
    identical for any leaf size (closest-hit is order-independent).

    The knee check uses the SELECTED traversal's row count and width:
    pair rows (10 + 9K) are narrower than threaded rows (9K + 24), and
    quad tables drop the collapsed-away internal rows entirely, so
    scenes near the knee keep bigger leaves under those walks.

    Thresholds are the measured per-traversal leaf optima, not a
    single byte knee: threaded flythrough wants leaf 6 at 2.63 MB
    (round 2: 6.49 vs 6.13 at leaf 8/3.18 MB), and quad flythrough
    wants leaf 6 at 1.95 MB (round 5: 15.77 vs 15.23 at leaf 8/
    2.48 MB, leaf 4 14.19 -- sweeps/r5_batch1.jsonl), while teddy's
    2.13 MB quad table is penalty-free at leaf 8 (19.52, teapot-level).
    2.3 MB splits the quad scenes exactly; 3.0 MB reproduces the
    threaded/pair optima."""
    from tryraytrace_tpu.accel.bvh import (collapse_bvh, pair_row_width,
                                           quad_row_width,
                                           traversal_row_width)

    width_of = (pair_row_width if traversal == "pair"
                else quad_row_width if traversal == "quad"
                else traversal_row_width)
    knee_bytes = 2.3e6 if traversal == "quad" else 3.0e6
    candidates = (8, 6, 4)
    for cand in candidates:
        bvh = build_bvh(arrays.tri_v0, arrays.tri_v1, arrays.tri_v2,
                        leaf_size=cand, method=method, c_isect=c_isect)
        width = width_of(
            int(max(1, bvh.leaf_count.max())) if bvh.num_nodes else 1,
            leaf_fmt)
        rows = bvh.num_nodes
        if traversal == "quad" and rows:
            rows = (len(collapse_bvh(bvh, criterion=quad_collapse))
                    + int((bvh.leaf_count > 0).sum()))
        if rows * width * 4 <= knee_bytes or cand == candidates[-1]:
            return bvh, cand
    raise AssertionError("unreachable")


def auto_shade_every(bvh: LinearBVH, arrays: SceneArrays,
                     step_unroll: int, inline: bool = False) -> int:
    """Auto shading cadence for the persistent engine.

    Tick path (``inline=False``): steps between shade ticks ~
    (expected visits per ray segment + 6), so a lane finishing an
    average-length walk waits well under one walk's worth of steps for
    its tick.  Calibrated on-chip (BASELINE.md): the measured optima
    are teapot 3 / cow 4 / teddy 4 / flythrough 5 at unroll 4, and
    this mapping reproduces all of them from the build-time
    surface-ray probe (accel/bvh.py estimate_surface_visits).

    Inline path (``inline=True``, config.inline_resolved): lanes shade
    and regenerate in-step, so the tick only services textured hits
    and its cadence decouples from walk length -- the on-chip optimum
    is a flat 8 iterations on every bench scene (teapot 15.75/15.92/
    15.84 Mrays/s at 6/8/12; cow800 10.07 and flythrough 7.65 at 8 --
    all above their tick-path optima; BASELINE.md round-2 inline
    table).

    Images are identical for any cadence (scheduling only)."""
    if inline:
        return 8
    from tryraytrace_tpu.accel.bvh import estimate_surface_visits

    visits = estimate_surface_visits(bvh, arrays.tri_v0, arrays.tri_v1,
                                     arrays.tri_v2)
    return int(np.clip(round((visits + 6.0) / max(1, step_unroll)), 3, 8))


def upload_scene(arrays: SceneArrays, bvh: LinearBVH | None = None,
                 device_put=True, leaf_size: int = 8,
                 method: str = "sah", traversal: str = "quad",
                 c_isect: float = 0.4, leaf_fmt: str = "mt",
                 quad_collapse: str = "dp",
                 quad_layout: str | None = "mux",
                 quad_select: str = "perm"
                 ) -> tuple[DeviceScene, tuple, LinearBVH]:
    """Build the BVH (reordering primitives, main.cpp:82-86 contract),
    then assemble the device pytree.

    Returns (device_scene, textures_tuple, bvh).  Textures ride
    separately because their shapes vary per scene.
    """
    from tryraytrace_tpu.accel.bvh import LEAF_STRIDE

    if leaf_fmt not in LEAF_STRIDE:
        raise ValueError(f"unknown leaf_isect {leaf_fmt!r} "
                         f"(expected one of {sorted(LEAF_STRIDE)})")
    if bvh is None:
        if leaf_size <= 0:
            bvh, leaf_size = _build_auto_leaf(arrays, method, traversal,
                                              c_isect, leaf_fmt,
                                              quad_collapse)
        else:
            bvh = build_bvh(arrays.tri_v0, arrays.tri_v1, arrays.tri_v2,
                            leaf_size=leaf_size, method=method,
                            c_isect=c_isect)
    leaf_size = int(max(1, bvh.leaf_count.max())) if bvh.num_nodes else 1
    ordered = arrays.permuted(bvh.perm) if bvh.perm.size else arrays

    n_lights = ordered.num_lights
    light_idx = ordered.light_indices
    if n_lights == 0:
        print("[Renderer Warning] No lights found in scene!", file=sys.stderr)  # renderer.cu:182
        light_idx = np.zeros(1, dtype=np.int32)

    put = jax.device_put if device_put else (lambda x: x)
    # Quad-table layout: "octant" drops the decode's permutation mux
    # network (pack_quad_oct_table) at ~3x the internal-row bytes;
    # None = auto: octant only while the total in-loop gather table
    # (quad rows + the inline trimat rows packed 2/row) stays under
    # the measured ~3 MB knee (docs/PERFORMANCE.md section 1).
    q_table = np.zeros((0, 47), np.float32)
    q_stride = 0
    q_layout = "mux"
    if quad_select not in ("perm", "rank"):
        raise ValueError(f"unknown quad_select {quad_select!r}")
    if quad_select == "rank" and quad_layout == "octant":
        # Mirror quad_select_resolved: the octant layout has no
        # permutation mux for the rank decode to replace, and packing
        # would silently fall back to a mux table the caller did not
        # ask for.
        raise ValueError("quad_select='rank' requires the 'mux' quad "
                         "layout (octant rows are pre-permuted)")
    if traversal == "quad":
        from tryraytrace_tpu.accel.bvh import collapse_bvh

        # Compute the collapse mapping ONCE and stash it on the bvh:
        # refits repack with this mapping (same table shape, new
        # bounds), which keeps the bounds-dependent criteria
        # ("sa"/"dp") refit-stable like "count".  Keyed by criterion:
        # a re-upload of the same bvh under a different quad_collapse
        # recomputes instead of silently reusing the old mapping.
        if (bvh.quad_children is None
                or bvh.quad_children_crit != quad_collapse):
            bvh.quad_children = collapse_bvh(bvh,
                                             criterion=quad_collapse)
            bvh.quad_children_crit = quad_collapse
        if quad_layout in (None, "octant") and quad_select != "rank":
            oct_tab, q_stride = pack_quad_oct_table(
                bvh, ordered.tri_v0, ordered.tri_v1, ordered.tri_v2,
                leaf_size=leaf_size, leaf_fmt=leaf_fmt,
                children=bvh.quad_children)
            trimat_bytes = ((arrays.tri_v0.shape[0] + 1) // 2
                            * oct_tab.shape[1] * 4 if oct_tab.size else 0)
            if quad_layout == "octant" or (
                    oct_tab.nbytes + trimat_bytes <= 3.0e6):
                q_table, q_layout = oct_tab, "octant"
        if q_layout != "octant":
            q_stride = 0
            q_table = pack_quad_table(
                bvh, ordered.tri_v0, ordered.tri_v1, ordered.tri_v2,
                leaf_size=leaf_size, leaf_fmt=leaf_fmt,
                children=bvh.quad_children,
                perm_kind=("slot2pos" if quad_select == "rank"
                           else "pos2slot"))
    dev = DeviceScene(
        tri_v0=put(ordered.tri_v0),
        tri_v1=put(ordered.tri_v1),
        tri_v2=put(ordered.tri_v2),
        albedo=put(ordered.albedo),
        emission=put(ordered.emission),
        metallic=put(ordered.metallic),
        roughness=put(ordered.roughness),
        ior=put(ordered.ior),
        transmission=put(ordered.transmission),
        tex_id=put(ordered.tex_id),
        light_indices=put(light_idx),
        has_normals=bool(
            ordered.nrm0 is not None
            and (np.abs(ordered.nrm0).max(initial=0.0) > 0
                 or np.abs(ordered.nrm1).max(initial=0.0) > 0
                 or np.abs(ordered.nrm2).max(initial=0.0) > 0)),
        has_uvs=bool(ordered.uv_mask is not None
                     and ordered.uv_mask.max(initial=0.0) > 0),
        bvh_bounds=put(bvh.bounds),
        bvh_leaf_prim=put(bvh.leaf_prim),
        bvh_miss=put(bvh.miss),
        node_table=put(pack_traversal_table(
            bvh, ordered.tri_v0, ordered.tri_v1, ordered.tri_v2,
            leaf_size=leaf_size, leaf_fmt=leaf_fmt)),
        # The fat-node table is only packed when that traversal is
        # selected: it is unused otherwise, and its 32-deep register
        # stack bound rejects pathologically deep SAH trees that the
        # threaded walk handles fine.
        fatnode_table=put(pack_fatnode_table(
            bvh, ordered.tri_v0, ordered.tri_v1, ordered.tri_v2,
            leaf_size=leaf_size, leaf_fmt=leaf_fmt)
            if traversal == "fatnode" else np.zeros((0, 16), np.float32)),
        # Packed only when selected, like the fat-node table.
        pair_table=put(pack_pair_table(
            bvh, ordered.tri_v0, ordered.tri_v1, ordered.tri_v2,
            leaf_size=leaf_size, leaf_fmt=leaf_fmt)
            if traversal == "pair" else np.zeros((0, 25), np.float32)),
        quad_table=put(q_table),
        trimat=put(pack_trimat_table(ordered)),
        num_lights=n_lights,
        leaf_size=leaf_size,
        leaf_fmt=leaf_fmt,
        quad_collapse=quad_collapse,
        quad_layout=q_layout,
        quad_oct_stride=q_stride,
        quad_select=(quad_select if traversal == "quad"
                     and q_layout == "mux" else "perm"),
        tree_depth=max(1, bvh.max_depth()),
    )
    textures = tuple(put(t) for t in ordered.textures)
    return dev, textures, bvh


def refit_scene(dev: DeviceScene, bvh: LinearBVH, arrays: SceneArrays,
                device_put=True) -> tuple[DeviceScene, LinearBVH]:
    """Re-upload deformed geometry without rebuilding the BVH.

    ``arrays`` is the scene in ORIGINAL primitive order (same topology
    and light set as the upload; vertices/materials may have moved).
    The refit keeps every static field and every array shape, so the
    engine's jitted program is reused -- this is the animated-geometry
    path the reference lacks entirely (it uploads once, SURVEY.md L3/
    renderer.cu:134-184).  Returns (new_scene, refit_bvh).
    """
    ordered = arrays.permuted(bvh.perm) if bvh.perm.size else arrays
    new_bvh = refit_bvh(bvh, ordered.tri_v0, ordered.tri_v1,
                        ordered.tri_v2)
    leaf_size = dev.leaf_size
    leaf_fmt = dev.leaf_fmt
    put = jax.device_put if device_put else (lambda x: x)
    new = dataclasses.replace(
        dev,
        tri_v0=put(ordered.tri_v0),
        tri_v1=put(ordered.tri_v1),
        tri_v2=put(ordered.tri_v2),
        albedo=put(ordered.albedo),
        emission=put(ordered.emission),
        metallic=put(ordered.metallic),
        roughness=put(ordered.roughness),
        ior=put(ordered.ior),
        transmission=put(ordered.transmission),
        tex_id=put(ordered.tex_id),
        bvh_bounds=put(new_bvh.bounds),
        node_table=put(pack_traversal_table(
            new_bvh, ordered.tri_v0, ordered.tri_v1, ordered.tri_v2,
            leaf_size=leaf_size, leaf_fmt=leaf_fmt)),
        fatnode_table=put(pack_fatnode_table(
            new_bvh, ordered.tri_v0, ordered.tri_v1, ordered.tri_v2,
            leaf_size=leaf_size, leaf_fmt=leaf_fmt))
        if int(dev.fatnode_table.shape[0])
        else dev.fatnode_table,
        pair_table=put(pack_pair_table(
            new_bvh, ordered.tri_v0, ordered.tri_v1, ordered.tri_v2,
            leaf_size=leaf_size, leaf_fmt=leaf_fmt))
        if int(dev.pair_table.shape[0])
        else dev.pair_table,
        # The build-time collapse mapping rides new_bvh.quad_children
        # (refit_bvh's dataclasses.replace carries it), so "sa"/"dp"
        # collapses keep their table shape across refits.
        quad_table=put(
            pack_quad_oct_table(
                new_bvh, ordered.tri_v0, ordered.tri_v1,
                ordered.tri_v2, leaf_size=leaf_size, leaf_fmt=leaf_fmt,
                collapse=dev.quad_collapse,
                children=new_bvh.quad_children)[0]
            if dev.quad_layout == "octant"
            else pack_quad_table(
                new_bvh, ordered.tri_v0, ordered.tri_v1,
                ordered.tri_v2, leaf_size=leaf_size, leaf_fmt=leaf_fmt,
                collapse=dev.quad_collapse,
                children=new_bvh.quad_children,
                perm_kind=("slot2pos" if dev.quad_select == "rank"
                           else "pos2slot")))
        if int(dev.quad_table.shape[0])
        else dev.quad_table,
        trimat=put(pack_trimat_table(ordered)),
    )
    return new, new_bvh
