"""Central configuration for the renderer.

The reference has no config system at all -- every knob is a
compile-time constant scattered over the tree (resolution
main.cpp:49-50, block size main.cpp:181, MAX_DEPTH / RR threshold
renderer.cu:363-364, FOV camera.cpp:147, camera speeds camera.h:77-78,
light threshold main.cpp:93, firefly clamp renderer.cu:752).  Here all
of those live in one frozen dataclass whose *defaults reproduce the
reference behavior bit-for-bit*, so default renders are comparable.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render parameters (hashable: usable as a jit static arg)."""

    width: int = 1200           # reference main.cpp:49
    height: int = 800           # reference main.cpp:50
    spp: int = 1                # reference renders 1 spp per launch (main.cpp:181)
    max_depth: int = 30         # reference renderer.cu:363
    rr_threshold: int = 3       # reference renderer.cu:364 (RR when depth > 3)
    rr_min_p: float = 0.05      # reference renderer.cu:562
    fov_scale: float = 0.5135   # tan(FOV/2); reference camera.cpp:147

    # Sample sanitation (reference renderer.cu:739-756).
    firefly_clamp: float = 100.0
    # NEE distance-squared floor (reference renderer.cu:674).
    nee_dist_sq_floor: float = 5.0
    # Host light scan threshold (reference main.cpp:93).
    light_scan_threshold: float = 0.1
    # Emitter path-termination threshold (reference renderer.cu:497).
    emitter_stop_threshold: float = 1e-3

    # Geometric epsilons (reference renderer.cu:236, :587, :608, :635, :692).
    intersect_eps: float = 1e-5
    shadow_eps: float = 1e-3
    refr_offset: float = 1e-4
    shadow_max_dist_eps: float = 1e-2

    # Traversal bounds. 32 mirrors the reference's fixed stack depth
    # (renderer.cu:387); for the threaded traversal it only caps the
    # equivalent tree depth used to bound the step count.
    max_bvh_depth: int = 32
    # Triangles per fat leaf in the engine's traversal table.  The
    # reference uses singleton leaves (bvh.cpp:67-72); on TPU the
    # per-node-visit row fetch is the cost unit and in-row math is
    # free, so fat leaves cut visits at no per-step cost.  Results are
    # identical (closest-hit is order-independent).  0 = auto: the
    # largest fat leaf (8, then 6, then 4) whose fused-row table stays
    # under the measured ~3 MB gather knee (docs/PERFORMANCE.md) --
    # small scenes get 8 (the headline optimum), 13k+-triangle scenes
    # drop to 6 (measured +6% on flythrough1080).
    bvh_leaf_size: int = 0
    # BVH build method for the engine: "sah" (binned surface-area
    # heuristic; fewer node visits) or "median" (the reference's exact
    # algorithm, bvh.cpp:47-113).  Images are identical either way.
    bvh_method: str = "sah"

    # Planar texture mapping (reference renderer.cu:465-481).
    tex_planar_scale: float = 0.01

    # Behavior flags (quirk gates; default = reference behavior).
    clamp_fireflies: bool = True
    nee_dist_floor_enabled: bool = True
    # Smooth shading (beyond-reference feature, default OFF = exact
    # reference behavior): interpolate area-weighted vertex normals
    # (computed by the loader; the reference has none) at the hit via
    # barycentrics and use them for all shading directions.  Ray-
    # offset origins keep the geometric normal (self-intersection
    # robustness).  Triangles without normals (walls) fall back to the
    # geometric face normal.  Engines/oracle agree to ULP on ~all
    # pixels, but unlike the flat-shading invariant this is NOT
    # bit-level: the interpolated-normal normalize feeds ULP drift
    # into RNG branch comparisons, so rare samples (~1/500 pixels)
    # can flip paths between independently compiled programs
    # (tests/test_smooth_shading.py bounds the tail).
    smooth_shading: bool = False

    # Beyond-reference: sample textures at barycentric-interpolated
    # per-vertex UVs (OBJ ``vt``) instead of the planar projection,
    # for triangles that carry UVs (loaded with parse_uv=True).  The
    # reference loader skips slash-form faces entirely
    # (loader.cpp:65-68), so parity default is off.  Triangles
    # without UVs -- and sliver triangles, where the barycentric
    # solve is ill-conditioned (see shade.barycentric) -- keep the
    # planar projection.  Same cross-program caveat as
    # smooth_shading: the interpolated UV feeds ULP drift into the
    # 4-tap texel pick, which can move one texel step on tap
    # boundaries (bounded by tests/test_uv.py).
    uv_mapping: bool = False

    # Engine selection: "persistent" (lane state machine, no per-bounce
    # lockstep barriers -- engine/persistent.py) or "bounce"
    # (bounce-major wavefront -- engine/wavefront.py).  Identical
    # results; persistent is the fast path on TPU.
    engine: str = "persistent"
    # Shading cadence for the persistent engine: shade READY lanes
    # every this many loop iterations (amortizes the shading gathers;
    # any value gives identical images).  0 = auto (the default):
    # Renderer/ShardedRenderer/bench resolve it per scene from the
    # build-time surface-ray visit probe as round((visits + 6) /
    # step_unroll) clamped to [3, 8]
    # (engine/device_scene.auto_shade_every) -- deeper scenes want
    # longer cadences, and the mapping reproduces every measured
    # on-chip optimum: teapot 3 (14.8 Mrays/s), cow 4 (+4%), teddy 4
    # (+2%), flythrough 5 (+13%); see BASELINE.md.  Under inline
    # shading (the default where supported) the tick only services
    # textured hits and auto resolves to a flat 8.  A direct
    # render_frame call with an unresolved 0 falls back to 3, the
    # headline sweep optimum at (unroll, cadence) = (4, 3): 14.80
    # Mrays/s vs 14.38 at (4,2), 14.47 at (3,3), 13.97 at (6,2),
    # 13.61 at (4,4), 12.46 at (2,2) -- once DONE idle is compacted
    # away, tick-wait is the binding idle.
    shade_every: int = 0
    # Inline shading for the persistent engine: extend the traversal
    # table with the packed trimat rows so the per-step gather slot
    # also serves material fetches, shade a finished walk on its very
    # NEXT step (mode SHADEG), and regenerate terminated lanes
    # in-step -- no tick-wait idle; shade ticks then only service
    # textured hits (their bilinear taps stay out of the step
    # program), and untextured scenes run tick-free.  Identical
    # images (the RNG is slot-addressed, so shade timing cannot
    # change what a lane draws).  Requires threaded traversal + owner
    # scheduler + <=1 light; silently falls back otherwise.
    # None = auto (the default): ON wherever supported -- measured
    # faster on every bench config (teapot headline 14.79 -> 15.92
    # Mrays/s, cow800 9.36 -> 10.07, flythrough 7.36 -> 7.65; see
    # BASELINE.md round-2 inline table).
    inline_shade: bool | None = None
    # How often the unrolled body runs the inline service block
    # (shade/texture/regenerate, persistent._service_shade): a lane
    # finishing its walk at sub-step u waits (svc - 1 - u % svc)
    # sub-steps in SHADEG for the next serviced sub-step.  0 = auto:
    # once per body, at the LAST sub-step (wait avg (unroll-1)/2 =
    # 1.5 sub-steps at unroll 4); N >= 1 services every Nth sub-step
    # (positions u % N == N-1; N=1 is the measured -16% every-step
    # case, docs/PERFORMANCE.md 2a.2).  Images identical for any value
    # (slot-addressed RNG).  Measurement knob for the service-step
    # idle bucket (PERFORMANCE.md 2b.3b).
    inline_service_steps: int = 0
    # Inline texturing (only meaningful under inline shading): textured
    # hits fetch their bilinear footprint's 5x5 apron tile row through
    # the same per-step gather slot (mode TEXG, one extra serviced
    # step) instead of parking in READY for a shade tick, making the
    # engine fully tick-free.  None = auto: ON when the tiled texture
    # rows fit the unified table's gather budget
    # (persistent.TEX_TABLE_BUDGET_BYTES); True forces it past the
    # budget check; False keeps the tick deferral.
    inline_tex: bool | None = None
    # Traversal scheme for the persistent engine: "threaded" (octant
    # miss links, no stack), "fatnode" (both child boxes at the
    # parent, front-to-back by true entry distance, register
    # short-stack; ~0.5x the row fetches but loses to its stack
    # traffic on v5e), or "pair" (both child boxes at the parent,
    # octant-threaded continuations, NO stack: entries into a missed
    # far child are absorbed by containment, and a one-slot per-lane
    # skip register removes most of that waste -- ~0.8x the threaded
    # walk's row fetches at the same per-step cost,
    # scripts/sim_pair_walk.py), or "quad" (the pair scheme over a
    # collapsed 4-ary tree: four boxes per row, first-hit branch in
    # per-octant front-to-back order, 3-slot skip-register file --
    # 0.52-0.64x the threaded walk's row fetches, the lowest of the
    # four).  Identical images for all four.  Default "quad": measured
    # fastest on every BASELINE config this round (teapot headline
    # 20.25 vs pair 18.53 vs threaded 15.92 Mrays/s; cow +10%, teddy
    # +5%, flythrough +11% over pair) -- see BASELINE.md.
    traversal: str = "quad"
    # Leaf slot format of the packed traversal tables: "mt" stores
    # (v0, e1, e2) and runs Moller-Trumbore per slot (reference math,
    # renderer.cu:235-268); "bw" stores the per-triangle Baldwin-Weber
    # transform (n, v0, bu, bv) whose intersection is ~30% fewer VPU
    # ops per slot (ops/intersect.baldwin_intersect) with the same
    # decision structure (|n.d| = |a| parallel guard, t > 1e-5, same
    # barycentric bounds).  Hit decisions agree with MT except for
    # float ULP boundary flips; the CPU oracle mirrors whichever
    # format is selected, so golden MSEs are unchanged.  Default "bw":
    # measured 24.83 vs 22.22 Mrays/s at the headline on v5e (round 3,
    # BASELINE.md) -- the K-unrolled leaf block is the biggest
    # elementwise chunk in the step and bw cuts it ~30%.
    leaf_isect: str = "bw"
    # Redirect passes over the quad walk's 3-slot skip-register file
    # per step (ops/traverse._regfile_apply).  Pass 2 also resolves
    # CHAINED misses (a redirect landing on another registered entry);
    # pass 1 leaves those to be absorbed by containment (more visits,
    # fewer selects per step).  Identical images either way -- visit
    # ORDER/count changes only, and closest/any-hit are
    # order-independent.  Default 1: measured above 2 in two
    # independent sessions (round 4: 24.47 vs 24.41; round 5:
    # 24.75 vs 24.68 -- each +0.3%, at the spread floor but
    # consistently positive and strictly fewer selects; one pass
    # resolves effectively every chained miss on these scenes).
    quad_redirect_passes: int = 1
    # Shadow-ray occluder prediction for the quad walk (the temporal
    # ray-path-prediction direction of PAPERS.md 1910.01304, adapted:
    # no hash table -- the predictor is one int32 of lane state).  A
    # lane remembers the leaf row that occluded its LAST NEE shadow
    # segment; the next shadow walk starts by testing that row first
    # (same pixel, next sample: the occluder is highly coherent), and
    # a still-occluded segment finishes after ONE row fetch instead of
    # a full walk.  On a miss the walk restarts from the root (the
    # predicted row is re-visited later: one wasted fetch, exactness
    # untouched -- any-hit is order-independent, so images are
    # IDENTICAL either way).  Decision sim
    # (scripts/sim_prediction.py, teapot): shadow gathers x0.66
    # (occl rate 0.76, predictor valid 0.76), headline mix -13.3%
    # gathers with prediction on shadow rays only (surface-ray
    # prediction measured a LOSS there: the warm-start fetch does not
    # pay at 3.5-fetch walks -- so only shadow walks predict).
    shadow_pred: bool = False
    # Depth of the quad walk's skip-register file (per-lane known-miss
    # (entry -> successor) slots, ops/traverse._regfile_apply).  Fewer
    # registers cut the per-step shift-push/redirect select network
    # ~linearly at the cost of more containment-absorbed visits
    # (identical images: visit order/count changes only); 0 drops the
    # file AND the push computation entirely (~55 selects/step).
    # Measured on v5e at the headline (round 4): 0 / 2 / 3 ->
    # 19.39 / 24.21 / 24.41 Mrays/s -- the registers EARN their
    # selects (the absorbed extra visits at regs=0 cost ~20%, far
    # more than the saved ops).  Default 3.
    quad_regs: int = 3
    # First-entered-child decode of the register-free quad walk:
    # "perm" = the position->slot mux network (_quad_decode); "rank" =
    # argmin over baked per-slot front-to-back ranks
    # (_quad_decode_rank + pack_quad_table perm_kind="slot2pos") --
    # the same child always wins, so the walk is visit-identical, but
    # the step drops the perm unpack + eight 4-way muxes (~40
    # selects).  Rank produces no skip-register pushes, so it REQUIRES
    # quad_regs == 0 and the "mux" layout.  None = auto: rank iff
    # quad_regs == 0.  Dead for the headline by implication (round 4):
    # the register-free walk itself measured 19.39 vs 24.41 Mrays/s
    # (quad_regs sweep), and rank's ~25-op saving cannot recover a
    # visit-count deficit priced at the 4.6 ns gather wall.  Kept as
    # the cheapest decode for registerless walks.
    quad_select: str | None = None
    # Quad-table layout: "mux" = shared rows, per-octant packed
    # cont*256+perm columns decoded by a select network; "octant" =
    # internal rows replicated once per ray octant with pre-permuted
    # slots (accel/bvh.pack_quad_oct_table), dropping the permutation
    # muxes from the step at ~3x the internal-row bytes; None = auto
    # (octant only while quad rows + inline trimat rows fit the ~3 MB
    # gather knee).  Identical images (same walk, same visit order).
    quad_layout: str | None = "mux"
    # Quad-table collapse criterion (accel/bvh.collapse_bvh): "count"
    # expands the child with the most subtree primitives (topology-
    # only); "sa" expands the child with the largest surface area,
    # which maximizes the expected row fetches removed per slot
    # (P(enter c | fetched X) ~ SA(c)/SA(X)); "dp" solves the same
    # expected-fetch objective exactly (bottom-up cut DP).  All three
    # are REFIT-STABLE: upload_scene stashes the build-time mapping on
    # the bvh (LinearBVH.quad_children) and refits repack with it, so
    # bounds-dependent criteria keep the compiled program too.
    # Measured on v5e at the headline (round 4): count 24.41, sa
    # 24.68, dp 24.68 Mrays/s (sa and dp produce frame-identical
    # walks on teapot; dp is never worse on the objective, so it is
    # the default).
    quad_collapse: str = "dp"
    # Traversal steps executed per while-loop iteration in the
    # persistent engine.  Measured on v5e, a loop iteration containing
    # gathers pays a ~0.27 ms fixed cost once regardless of how many
    # gathers it contains, so unrolling dependent steps amortizes it.
    # Results are identical for any value.
    step_unroll: int = 4
    # Dual-walk lanes: each lane carries TWO independent sample
    # contexts and steps whichever one is mid-traversal, so the idle
    # steps a context spends waiting for its shade tick do the other
    # context's traversal instead.  Identical images (sample sets are
    # interleaved even/odd).  Requires even spp >= 2 and a non-fatnode
    # traversal + owner scheduler; falls back to single-walk otherwise.
    # None = auto: OFF under the quad traversal (inline shading already
    # removed the tick-wait dual hides, and quad's 3-slot register file
    # doubles the dual mux cost -- measured 21.21 single vs 20.25 dual
    # at the headline), ON under threaded/pair (15.92 dual vs 15.59
    # single threaded).
    dual_walk: bool | None = None
    # Readiness-triggered shading: additionally fire the shade tick as
    # soon as this fraction of lanes is waiting in READY/REFILL (0 =
    # cadence only).  Identical images for any value.  Measured on v5e
    # at 0.25 it fires too eagerly (extra shading gathers outweigh the
    # saved idle steps: headline 10.71 vs 10.85 Mrays/s), so cadence-
    # only is the default; the real fix is dual-walk lanes (ROADMAP).
    shade_ready_frac: float = 0.0
    # Lane scheduling for the persistent engine.  "pool": work
    # stealing -- the wave is max_wave_lanes wide and a lane that
    # finishes its pixel's spp samples claims the next unclaimed pixel
    # from a frame-wide pool, so lanes only idle once the whole frame
    # is drained (one tail per FRAME instead of per chunk).  "owner":
    # each lane is bound to one pixel for the whole wave and retires
    # after its spp samples (frames wider than max_wave_lanes render
    # in sequential chunks, each paying its own straggler tail --
    # measured 53% of lane-steps idle in DONE at the headline).
    # Identical images: a pixel is still rendered entirely by one lane
    # with samples in order, so per-pixel sums are bit-equal.
    # "quota" is the pool with *static strided* claims: lane i owns
    # pool positions i, i+w, i+2w, ... -- no shared counter, no cumsum,
    # no partial-sum array; the straggler tail still averages over
    # ~pool_span/w pixels per lane.
    # Measured on v5e (docs/PERFORMANCE.md): pool won +17% at spp<=4
    # in round 1, but that predates inline shading, which pool
    # structurally disables (its shared-counter claim needs a per-step
    # cumsum).  Round-4 re-measure at the reference's interactive
    # operating point (1200x800 @ 1 spp): owner 731 ms/frame vs pool
    # 1477 -- owner wins 2x even at 1 spp now, and it already won the
    # 16-spp headline.  Owner is right everywhere; pool/quota remain
    # as measured alternatives.
    scheduler: str = "owner"
    # Pixels per pool (work-stealing) span: frames with more pixels
    # render in sequential spans of at most this many (0 = whole
    # frame).  Bounds the per-pixel output buffer carried through the
    # traversal loop -- a frame-wide pool at 1080p carries a 24 MB
    # accumulator through every iteration and measured ~45% slower
    # than owner; 4x the wave width keeps the buffer at 3 MB while
    # giving each lane 4 pixels of stealing headroom.  Exact for any
    # value (RNG streams and per-pixel sums are absolute).
    pool_span: int = 262144
    # Quota-scheduler flush path: "onehot" accumulates completed
    # samples with a one-hot FMA over the [span/w, w] pool grid (pure
    # vector math); "scatter" uses a unique-indices scatter-add.
    # Identical images either way.
    quota_accum: str = "onehot"
    # Staged tail spill: compact live lanes down a geometric ladder of
    # wave widths (w/2, w/4, ... spill_stages halvings, floor 64) as
    # the wave drains, so lane occupancy stays > 1/2 per stage instead
    # of paying full-width iterations for a near-empty wave (60% of
    # headline lane-steps were DONE-idle with the single w/16 spill).
    # Exact lane permutations; identical images.  Each stage compiles
    # its own loop body (compile time grows with stages).
    # Measured on v5e (headline): stages 4 = +24% (13.61 vs 11.01
    # Mrays/s) under the threaded walk, where stages 6 (widths below
    # 4096 lanes) collapsed to 2.2.  Under the shorter quad walks the
    # optimum moved deeper -- the narrow-width stages now drain more
    # than they cost: quad+single-walk 4/5/6/7/8 -> 21.21 / 21.76 /
    # 21.99 / 22.05 / 22.05.  Under bw leaf rows (cheaper steps) it
    # moved deeper again: 5/6/7/8 -> 24.60 / 24.86 / 24.98 / 25.01,
    # with 7 reproduced exactly across two independent compiles.
    # Default 8; the climb flattens (+0.03%/stage at 8), and every
    # stage compiles its own loop body.
    tail_spill: bool = True
    spill_stages: int = 8
    # Narrowest ladder width (the "floor").  With 65k waves the
    # default 8-stage ladder bottoms out at 256 lanes, so the floor
    # only binds for deeper ladders (stages >= 11 at 64); lowering it
    # lets the drain tail run sub-64-wide stages (VERDICT r3 #5
    # experiment).  Scheduling only -- images identical.
    spill_floor: int = 64
    # Unroll override for narrow ladder stages (loop bodies that run
    # at <= 4096 lanes): 0 = use step_unroll everywhere.  Narrow
    # stages are dominated by the ~42 us fixed per-body dispatch cost,
    # not lane math, so a deeper unroll amortizes dispatch where the
    # wasted-lane cost of overshooting is smallest.  Scheduling only
    # in op terms, but the tail stages' step graph recompiles and XLA
    # re-fuses it: measured ULP drift compounding to ~4e-5 on deep
    # paths (tests/test_persistent_engine.py
    # test_tail_unroll_mc_equivalent bounds it) -- NOT bit-identical,
    # unlike spill_floor/spill_stages which keep the step graph and
    # are exact.  Measured on v5e at the headline (round 4):
    # tail_unroll 8 -> 24.43 vs 24.41 control -- the sub-4096-lane
    # stages are too small a fraction of the frame for dispatch
    # amortization to register.  Default stays 0.
    tail_unroll: int = 0
    # Cap on persistent-wave width: frames with more pixels render in
    # sequential pixel chunks of at most this many lanes (0 = one
    # wave).  RNG streams are absolute, so chunking never changes the
    # image.  ~65k lanes measured ~20% faster than 262k on v5e.
    max_wave_lanes: int = 65536

    def with_size(self, width: int, height: int) -> "RenderConfig":
        return dataclasses.replace(self, width=width, height=height)

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


# Inline shading supports multi-light scenes by replacing the NEE
# light-pick gather with a bit-exact where-chain select over the light
# rows (elementwise, fuses into the step program for free); past this
# bound the chain stops being obviously cheap and the engine keeps the
# tick path, whose single shared gather amortizes over the cadence.
INLINE_MAX_LIGHTS = 16


def quad_select_resolved(cfg: RenderConfig) -> str:
    """Resolve cfg.quad_select (None = auto) to "perm" | "rank".

    Single source of truth shared by upload (table perm_kind) and the
    engine (decode choice): rank needs the register-free walk (no
    pushes can be produced from per-slot ranks) and the "mux" layout
    (the octant layout has no permutation to replace)."""
    sel = cfg.quad_select
    if sel is None:
        # Auto layout (None) is included: upload_scene skips the
        # octant packing whenever quad_select=="rank", so a
        # registerless auto-layout config resolves to the mux table +
        # rank decode, consistent with quad_layout="mux".
        sel = ("rank" if cfg.quad_regs == 0
               and cfg.quad_layout in (None, "mux") else "perm")
    if sel not in ("perm", "rank"):
        raise ValueError(f"unknown quad_select {sel!r}")
    if sel == "rank":
        if cfg.quad_regs != 0:
            raise ValueError(
                "quad_select='rank' requires quad_regs=0 (the rank "
                "decode produces no skip-register pushes)")
        if cfg.quad_layout not in (None, "mux"):
            raise ValueError(
                "quad_select='rank' requires the 'mux' quad layout")
    return sel


def inline_resolved(cfg: RenderConfig, num_lights: int) -> bool:
    """Whether the persistent engine will run inline shading for this
    (config, scene) pair.  Single source of truth for the gate: the
    engine (engine/persistent.py) and the auto-cadence resolvers
    (Renderer/ShardedRenderer/bench) must agree, or the cadence would
    be tuned for the wrong tick role.  Inline needs a stackless walk
    (threaded or pair; fatnode re-fetches rows at pop, so its gather
    slot is not free), the owner or quota schedule
    (quota's strided claim and one-hot flush are elementwise; pool's
    shared-counter claim needs a cumsum per step), and few enough
    lights that the NEE light pick is a where-chain select, not a
    per-lane gather (a second gather per step).  Quota additionally
    needs an affine pixel pool and one-hot alignment -- runtime
    properties the engine checks itself (render_frame_persistent);
    misaligned quota calls keep the tick path."""
    ok = (cfg.traversal != "fatnode"
          and cfg.scheduler in ("owner", "quota")
          and num_lights <= INLINE_MAX_LIGHTS)
    want = cfg.inline_shade if cfg.inline_shade is not None else True
    return bool(want) and ok


DEFAULT_CONFIG = RenderConfig()
