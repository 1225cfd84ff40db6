"""Persistent-wave path tracer with path regeneration.

The bounce-major wavefront (engine/wavefront.py) pays a *lockstep
barrier* per bounce: every traversal while_loop runs for the slowest
live ray of that bounce, and late bounces with a handful of RR
survivors still cost full-wave steps.  Measured on TPU v5e that tail
is ~80% of frame time.

This engine removes the barriers with a per-lane state machine inside
ONE ``lax.while_loop`` -- the wavefront equivalent of a persistent-
threads kernel, but still fully lockstep-masked (TPU-friendly):

  TRAVERSE --(closest-hit done)--> READY --(shade)-->
      SHADOW (diffuse, NEE) -> TRAVERSE      (path continues)
    | TRAVERSE                               (spec/refr continue)
    | REFILL --(next sample's camera ray)--> TRAVERSE | DONE

(Under inline shading READY becomes SHADEG -- the shade rides the
next serviced step's gather slot -- and textured hits take one more
serviced step, TEXG, for their texture tile row; see _step.)

Key properties:
  - closest-hit and shadow lanes *share the single node-row gather*
    per iteration (the dominant cost on TPU);
  - shading (trimat/texture/light gathers) runs every ``shade_every``
    iterations on READY/REFILL lanes;
  - a lane whose path ends immediately *regenerates* with its pixel's
    next sample (path regeneration), so one wave renders all ``spp``
    samples back-to-back and the rare 30-bounce RR tail is amortized
    across the whole frame instead of stalling every sample wave.

Semantics are identical to wavefront.py and the NumPy oracle: RNG is
slot-addressed by (per-lane sample seed, pixel, per-lane depth), every
epsilon matches the reference megakernel (renderer.cu:317-760), and
per-sample radiance is sanitized before accumulation exactly like the
reference's pre-accumulate filters (renderer.cu:737-759).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from tryraytrace_tpu.config import (INLINE_MAX_LIGHTS, RenderConfig,
                                    inline_resolved)
from tryraytrace_tpu.core import rng, vec
from tryraytrace_tpu.engine.camera_rays import generate_rays
from tryraytrace_tpu.engine.wavefront import _sanitize
from tryraytrace_tpu.ops import shade
from tryraytrace_tpu.ops.aabb import aabb_hit
from tryraytrace_tpu.ops.texture import (
    TEX_ROW,
    TEX_TILE,
    build_texture_tiles,
    interp_uv,
    num_texture_tiles,
    planar_uv,
    sample_textures,
    tile_bilinear,
    tile_coords,
)
from tryraytrace_tpu.ops.intersect import LEAF_STRIDE
from tryraytrace_tpu.ops.traverse import (
    FATNODE_DEPTH,
    MISS_T,
    PAIR_COL_BODY,
    QUAD_COL_BODY,
    _decode_links,
    _fat_leaf_intersect,
    _leaf_intersect,
    _pair_decode,
    _quad_decode,
    _quad_decode_oct,
    _quad_decode_rank,
    _regfile_apply,
    fatnode_step,
    ray_octant,
)

PI = np.float32(np.pi)

# Lane modes.
TRAVERSE = 0
SHADOW = 1
READY = 2
REFILL = 3
DONE = 4
# Inline shading (cfg.inline_shade): a finished walk's lane spends its
# NEXT step gathering its hit triangle's material row from the unified
# [node rows; trimat rows] table -- the same single gather slot every
# step -- and shades right there instead of idling for the shade tick.
SHADEG = 5
# Inline texturing (cfg.inline_tex): a SHADEG lane whose hit is
# textured spends ONE MORE serviced step gathering its bilinear
# footprint's 5x5 apron tile row (ops/texture.py build_texture_tiles)
# from the same unified table, then shades -- no lane ever waits for a
# shade tick and the engine runs tick-free.  Material state crosses
# the step in otherwise-dead lane state (so/sd/pend) plus the tstash
# array; the tap weights ride tstash, the in-tile offsets ride hit_id.
TEXG = 6
# Texture tile rows admitted to the unified gather table before the
# inline-tex path falls back to tick deferral: the table must stay
# under the measured ~3 MB gather knee (docs/PERFORMANCE.md), and the
# node+trimat rows already claim most of it on the bench scenes.
TEX_TABLE_BUDGET_BYTES = 2 * 2**20


def _lane_seed(frame_seed, seed_spp: int, sample):
    return rng.sample_seed(frame_seed, seed_spp, sample, jnp)


def build_inline_table(table, sentinel, scene, textures, cfg, cam,
                       frame_seed, pixel_idx, width, height, spp,
                       sample_offset, seed_spp, sample_stride, stride,
                       n_items=0, pool_fn=None):
    """Assemble the inline-shading unified gather table + step context.

    Unified gather table: node rows first (traversal indices and the
    done-sentinel are unchanged), then the trimat rows packed 2-per-row
    where the node width allows (the row fetch is width-independent to
    >=112 f32; packing halves the added table bytes to stay under the
    ~3 MB gather knee).  Inline texturing appends the tiled texture
    rows too (one row serves a whole bilinear footprint) when they fit
    the gather budget; otherwise textured hits keep the tick deferral.

    Shared by render_frame_persistent and the cross-frame progressive
    engine (engine/progressive.py).  Returns (unified_table,
    inline_ctx); the engine is tick-free iff the scene has no textures
    or ``inline_ctx['tex'] is not None``.
    """
    nw = table.shape[1]
    pack = 2 if nw >= 74 else 1
    want_tex = (cfg.inline_tex if cfg.inline_tex is not None
                else True)
    tex_on = bool(textures) and want_tex and (
        cfg.inline_tex is True
        or (num_texture_tiles(textures)
            * max(nw, 37 * pack, TEX_ROW) * 4
            <= TEX_TABLE_BUDGET_BYTES))
    wu = max(nw, 37 * pack, TEX_ROW if tex_on else 0)
    tm = scene.trimat
    if pack == 2 and tm.shape[0] % 2:
        tm = jnp.pad(tm, ((0, 1), (0, 0)))
    packed = tm.reshape(-1, 37 * pack)
    packed = jnp.pad(packed, ((0, 0), (0, wu - 37 * pack)))
    parts = [jnp.pad(table, ((0, 0), (0, wu - nw))), packed]
    tex_ctx = None
    if tex_on:
        tex_rows, tex_metas, _ = build_texture_tiles(textures)
        parts.append(jnp.pad(tex_rows,
                             ((0, 0), (0, wu - TEX_ROW))))
        tex_ctx = dict(tex0=sentinel + packed.shape[0],
                       metas=tex_metas)
    table = jnp.concatenate(parts, axis=0)
    inline_ctx = dict(
        pack=pack, scene=scene, textures=textures, cfg=cfg, cam=cam,
        frame_seed=frame_seed, pixel_pool=pixel_idx, width=width,
        height=height, spp=spp, sample_offset=sample_offset,
        seed_spp=seed_spp, sample_stride=sample_stride, stride=stride,
        tex=tex_ctx, n_items=n_items, pool_fn=pool_fn)
    return table, inline_ctx


def init_lane_ctx(first_sample, frame_seed, seed_spp, sample_offset,
                  pix0, cam, width, height, cfg, pair: bool, quad: bool,
                  with_tstash: bool) -> dict:
    """Fresh per-lane wave state for ``pix0``'s lanes, each starting
    its pixel's sample ``first_sample``.  Shared by
    render_frame_persistent (per walk context) and the cross-frame
    progressive engine."""
    w = int(pix0.shape[0])
    f3 = lambda: jnp.zeros((w, 3), jnp.float32)
    sample0 = jnp.full((w,), first_sample, jnp.int32)
    seed0 = _lane_seed(frame_seed, seed_spp,
                       sample0 + jnp.int32(sample_offset))
    r_o, r_d = generate_rays(cam, width, height, seed0, pix0)
    extra = {}
    if pair:
        # One-slot skip register (entry -> redirect), per walk
        # context so dual-walk muxes it with the rest.
        extra["reg_e"] = jnp.full((w,), -1, jnp.int32)
        extra["reg_s"] = jnp.full((w,), -1, jnp.int32)
    if quad and cfg.quad_regs > 0:
        # Skip-register file (cfg.quad_regs slots, default 3), per
        # walk context (the dual mux broadcasts over the trailing
        # register axis).  quad_regs=0 drops the file entirely:
        # containment absorbs every known-missed entry instead
        # (more visits, ~55 fewer selects per step).
        extra["reg_e"] = jnp.full((w, cfg.quad_regs), -1, jnp.int32)
        extra["reg_s"] = jnp.full((w, cfg.quad_regs), -1, jnp.int32)
    if quad and cfg.shadow_pred:
        # Last occluding leaf row per lane (cfg.shadow_pred): the next
        # NEE shadow walk tests it first.  pred_pending marks a walk
        # currently ON its predicted row (its continuation is the
        # root, not the row's thread link).
        extra["pred"] = jnp.full((w,), -1, jnp.int32)
        extra["pred_pending"] = jnp.zeros((w,), bool)
    if with_tstash:
        # TEXG material stash (albedo, metallic, roughness, ior,
        # transmission, fx, fy, front-face bit); nl/nl_off/emission
        # ride the dead so/sd/pend slots, the in-tile offsets ride
        # hit_id.
        extra["tstash"] = jnp.zeros((w, 10), jnp.float32)
    return dict(
        **extra,
        mode=jnp.full((w,), TRAVERSE, jnp.int32),
        cur=jnp.zeros((w,), jnp.int32),
        d_min=jnp.full((w,), MISS_T),
        hit_id=jnp.full((w,), -1, jnp.int32),
        o=r_o, d=r_d,
        tp=jnp.ones((w, 3), jnp.float32),
        rad=f3(),                 # current sample's radiance
        sample=sample0,
        seed=seed0,
        pix=pix0,                 # this lane's absolute pixel id
        depth=jnp.zeros((w,), jnp.int32),
        prev_spec=jnp.ones((w,), bool),
        so=f3(), sd=f3(),
        smax=jnp.zeros((w,), jnp.float32),
        pend=f3(),
        cont_after_shadow=jnp.zeros((w,), bool),
    )


def render_frame_persistent(scene, textures, cam, frame_seed, width: int,
                            height: int, cfg: RenderConfig, spp: int,
                            pixel_idx=None, with_stats: bool = False,
                            sample_offset: int = 0,
                            seed_spp: int | None = None,
                            with_debug: bool = False,
                            pixel_pool_fn=None):
    """All ``spp`` samples of one frame in a single regenerating wave.
    Returns the per-pixel radiance *sum* [N, 3] (+ ray stats).

    ``sample_offset``/``seed_spp``: see render_frame -- a
    sample-parallel shard renders samples [offset, offset+spp) of a
    ``seed_spp``-sample frame with the frame's global RNG streams.

    ``with_debug`` additionally returns scheduler counters
    {bodies, ticks, visits, lane_steps}: ``visits`` is the exact
    node-row-gather count actually consumed by live lanes (the
    traversal cost unit, docs/PERFORMANCE.md), ``lane_steps`` the
    total lanes x steps issued, so visits/lane_steps = wave
    utilization and visits/ray = the BVH quality metric.

    ``pixel_pool_fn`` (optional): an *elementwise* map from pool
    position to absolute pixel id, semantically equal to
    ``pixel_idx[pos]`` (the caller promises this).  When present it
    lets the quota scheduler's refill claim its next pixel without a
    per-lane gather, which is what admits quota to the inline
    per-step program (a gather there would double the step's cost,
    docs/PERFORMANCE.md).
    """
    seed_spp = spp if seed_spp is None else seed_spp
    n = width * height if pixel_idx is None else pixel_idx.shape[0]
    if pixel_idx is None:
        pixel_idx = jnp.arange(n, dtype=jnp.int32)
    frame_seed = jnp.asarray(frame_seed).astype(jnp.uint32)
    k = scene.leaf_size
    fmt = scene.leaf_fmt
    if cfg.traversal not in ("threaded", "fatnode", "pair", "quad"):
        raise ValueError(f"unknown traversal {cfg.traversal!r}")
    fat = cfg.traversal == "fatnode"
    pair = cfg.traversal == "pair"
    quad = cfg.traversal == "quad"
    table = (scene.fatnode_table if fat
             else scene.pair_table if pair
             else scene.quad_table if quad else scene.node_table)
    sentinel = table.shape[0]
    col_ps = 6 + LEAF_STRIDE[fmt] * k
    # 0 = auto, resolved per scene by Renderer/ShardedRenderer/bench
    # (engine/device_scene.auto_shade_every); a direct render_frame
    # call with an unresolved 0 gets the global sweep optimum (3 on
    # the tick path, flat 8 under inline -- see auto_shade_every).
    shade_every = (cfg.shade_every if cfg.shade_every >= 1
                   else (8 if inline_resolved(cfg, scene.num_lights)
                         else 3))

    # Work-stealing pool: the wave is (at most) max_wave_lanes wide and
    # lanes *claim* pixels from a shared pool as they retire them, so a
    # lane never idles in DONE while unrendered pixels remain -- the
    # owner scheduler's per-lane (pixel x spp) binding leaves lanes
    # waiting on stragglers (measured 53% of lane-steps, ROADMAP).
    # One pixel is still rendered entirely by one lane with samples in
    # order, so per-pixel sums are bit-identical to the owner schedule.
    # "quota" is the pool without shared state: lane i statically owns
    # pool positions i, i+w, i+2w, ... (newpos = pos + w instead of a
    # cumsum over a shared counter), which still averages straggler
    # variance over ~n/w pixels per lane but adds no per-tick claim
    # arithmetic beyond one compare.
    if cfg.scheduler not in ("pool", "quota", "owner"):
        raise ValueError(f"unknown scheduler {cfg.scheduler!r}")
    mw = cfg.max_wave_lanes or n
    pool = cfg.scheduler in ("pool", "quota")
    w = min(n, mw) if pool else n
    n_items = n if pool else 0  # 0 disables pool logic downstream

    # None = auto: dual-walk's idle-hiding no longer pays under the
    # inline+quad default (measured 21.21 single vs 20.25 dual at the
    # headline: inline shading already removed the tick-wait it hides,
    # and quad doubles its register-file mux cost), but it still wins
    # under threaded/pair (15.92 vs 15.59 threaded).
    dual_req = cfg.dual_walk if cfg.dual_walk is not None else not quad
    dual = (dual_req and not fat and not pool
            and spp >= 2 and spp % 2 == 0)
    if pair and scene.trimat.shape[0] > 0 and sentinel == 0:
        raise ValueError(
            "cfg.traversal='pair' but the scene was uploaded without a "
            "pair-row table (upload_scene(traversal=...))")
    if quad and scene.trimat.shape[0] > 0 and sentinel == 0:
        raise ValueError(
            "cfg.traversal='quad' but the scene was uploaded without a "
            "quad-row table (upload_scene(traversal=...))")
    if quad and scene.quad_select == "rank" and cfg.quad_regs != 0:
        raise ValueError(
            "scene quad table is packed for the rank decode "
            "(perm_kind='slot2pos') which produces no skip-register "
            "pushes; set quad_regs=0 or re-upload with "
            "quad_select='perm'")
    sample_stride = 2 if dual else 1

    # Inline shading (see _step): supported for the threaded walk +
    # owner/quota schedules + <=INLINE_MAX_LIGHTS lights (the NEE
    # light pick is then a where-chain select in _shade_finish, not a
    # per-lane gather, so it may live in the step program; scenes past
    # the bound keep the tick path whose single shared gather
    # amortizes over the cadence).  Default ON where supported
    # (config.inline_resolved -- the single source of truth shared
    # with the auto-cadence resolvers).
    inline = inline_resolved(cfg, scene.num_lights)
    if inline and cfg.scheduler == "quota":
        # Quota's in-step refill must stay elementwise: the next-pixel
        # claim needs pixel_pool_fn (no per-step gather) and the
        # radiance flush needs the one-hot FMA alignment (full-width
        # column-owned pool grid; the scatter fallback inside the loop
        # costs +255%, docs/PERFORMANCE.md).  Misaligned calls keep
        # the tick path, whose shared gathers amortize over the
        # cadence.
        inline = (pixel_pool_fn is not None
                  and cfg.quota_accum == "onehot"
                  and n % w == 0)
    inline_ctx = None
    if inline:
        table, inline_ctx = build_inline_table(
            table, sentinel, scene, textures, cfg, cam, frame_seed,
            pixel_idx, width, height, spp, sample_offset, seed_spp,
            sample_stride, w, n_items, pixel_pool_fn)

    f3 = lambda: jnp.zeros((w, 3), jnp.float32)

    def init_ctx(first_sample: int) -> dict:
        return init_lane_ctx(
            first_sample, frame_seed, seed_spp, sample_offset,
            pixel_idx[:w], cam, width, height, cfg, pair, quad,
            with_tstash=(inline_ctx is not None
                         and inline_ctx["tex"] is not None))

    ctx_keys = tuple(sorted(init_ctx(0).keys())) if dual else ()
    st = init_ctx(0)
    st.update(
        out=jnp.zeros((n, 3), jnp.float32),  # accumulated per pixel
        it=jnp.int32(0),
        n_traced=jnp.float32(w * (2 if dual else 1)),  # camera rays
        n_shadow=jnp.float32(0),
        cnt=jnp.int32(w),             # live lanes as of the last count
    )
    if pool:
        st.update(pos=jnp.arange(w, dtype=jnp.int32))  # claimed position
        if cfg.scheduler == "pool":
            st.update(
                acc=f3(),             # current pixel's partial sum
                pool_next=jnp.int32(w),  # next unclaimed pool position
            )
    if with_debug:
        st.update(dbg_visits=jnp.float32(0), dbg_ticks=jnp.float32(0),
                  dbg_shadow_visits=jnp.float32(0),
                  dbg_lane_steps=jnp.float32(0),
                  # Per-body mode split over ALL contexts (so dual
                  # counts both walks): done vs waiting-for-tick vs
                  # inline-service (SHADEG) -- the last splits the
                  # "remainder" idle bucket of PERFORMANCE.md 2b.3b.
                  dbg_ctx_done=jnp.float32(0),
                  dbg_ctx_wait=jnp.float32(0),
                  dbg_ctx_shadeg=jnp.float32(0),
                  dbg_shadeg_steps=jnp.float32(0),
                  dbg_ctx_steps=jnp.float32(0))
    if dual:
        # Context A (samples 0,2,4,...) rides the plain keys; context B
        # (samples 1,3,5,...) is parked under b.* and swapped in by the
        # per-lane mux each iteration.
        for kk, vv in init_ctx(1).items():
            st[f"b.{kk}"] = vv
    if fat:
        # Pushes outstanding <= internal depth; size the stack exactly.
        depth = min(FATNODE_DEPTH, max(1, scene.tree_depth - 1))
        st["stack"] = jnp.full((n, depth), max(sentinel, 1), jnp.int32)
    if sentinel == 0:
        if fat and scene.trimat.shape[0] > 0:
            raise ValueError(
                "cfg.traversal='fatnode' but the scene was uploaded "
                "without a fat-node table (upload_scene(traversal=...))")
        # Empty scene: every ray misses, all samples contribute 0.
        out = jnp.zeros((n, 3), jnp.float32)
        stats = (jnp.float32(n * spp), jnp.float32(0))
        if with_debug:
            z = jnp.float32(0)
            dbg = dict(bodies=jnp.int32(0), ticks=z, visits=z,
                       shadow_visits=z, lane_steps=z, ctx_done=z,
                       ctx_wait=z, ctx_shadeg=z, shadeg_steps=z,
                       ctx_steps=z)
            return (out, stats, dbg) if with_stats else (out, dbg)
        return (out, stats) if with_stats else out

    keys = tuple(sorted(st.keys()))
    pack = lambda dd: tuple(dd[kk] for kk in keys)
    unpack = lambda tt: dict(zip(keys, tt))

    # Staged tail spill (docs/PERFORMANCE.md): every iteration costs
    # the full wave width, so as lanes retire the wave is *compacted*
    # -- an exact permutation of independent lanes, inside the same
    # jit -- down a geometric ladder of widths w/2, w/4, ... (up to
    # ``spill_stages`` halvings, floor 64 lanes).  A stage exits as
    # soon as the live lanes fit the next width, so lane occupancy
    # stays > 1/2 in every stage instead of draining the full wave to
    # near-empty (measured 60% of lane-steps idle in DONE without it).
    floor_w = min(w, max(1, cfg.spill_floor))
    spill_widths: list[int] = []
    if inline_ctx is not None and pool:
        # Inline quota: compaction would break the one-hot flush's
        # column ownership (spilled stages fall to the in-loop scatter,
        # +255%), and quota's tail is already short -- each lane drains
        # ~n/w pixels, so straggler variance is averaged, which is the
        # whole point of the schedule.  No ladder.
        pass
    elif cfg.tail_spill:
        for si in range(1, max(1, cfg.spill_stages) + 1):
            sw = max(w >> si, floor_w)
            if sw >= w or (spill_widths and sw >= spill_widths[-1]):
                break
            spill_widths.append(sw)

    step_unroll = max(1, cfg.step_unroll)

    step_fn = (_step_fat if fat else _step_pair if pair
               else functools.partial(
                   _step_quad,
                   redirect_passes=max(1, cfg.quad_redirect_passes),
                   oct_stride=(scene.quad_oct_stride
                               if scene.quad_layout == "octant"
                               else None),
                   select=scene.quad_select)
               if quad else _step)

    def lane_done(s):
        done = s["mode"] == DONE
        if dual:
            done = done & (s["b.mode"] == DONE)
        return done

    svc_every = cfg.inline_service_steps or step_unroll

    def make_body(step_unroll=step_unroll):
        def run_single(s):
            for u in range(step_unroll):
                if with_debug:
                    act = (s["mode"] == TRAVERSE) | (s["mode"] == SHADOW)
                    s["dbg_visits"] = (s["dbg_visits"]
                                       + act.sum().astype(jnp.float32))
                    s["dbg_shadow_visits"] = (
                        s["dbg_shadow_visits"]
                        + (s["mode"] == SHADOW).sum().astype(jnp.float32))
                    s["dbg_lane_steps"] = (s["dbg_lane_steps"]
                                           + jnp.float32(act.shape[0]))
                    # Sub-step-resolution SHADEG occupancy: lanes
                    # holding a finished walk, waiting for (or taking)
                    # their serviced sub-step -- the inline-service
                    # share of 2b.3b's idle remainder.
                    s["dbg_shadeg_steps"] = (
                        s["dbg_shadeg_steps"]
                        + ((s["mode"] == SHADEG)
                           | (s["mode"] == TEXG)).sum().astype(
                               jnp.float32))
                # Inline servicing rides the LAST unrolled step of the
                # body by default: the shade/refill block's
                # elementwise+state writes are paid once per body
                # (like a tick), but a finished lane waits at most one
                # body for them (measured per-STEP servicing loses 16%
                # at the headline -- 4x the block cost for marginal
                # extra wait reduction on top of dual-walk).
                # cfg.inline_service_steps trades block copies for
                # SHADEG wait (PERFORMANCE.md 2b.3b).
                s = step_fn(s, table, sentinel, k, col_ps, inline_ctx,
                            u % svc_every == svc_every - 1, fmt)

            if inline_ctx is not None and (not textures
                                           or inline_ctx["tex"]
                                           is not None):
                # Tick-free: shading, texturing (TEXG tile rows),
                # regeneration and retirement all happen in-step;
                # READY never occurs, so there is nothing for a tick
                # to service.
                return s

            def tick(ss):
                if with_debug:
                    ss["dbg_ticks"] = ss["dbg_ticks"] + 1.0
                ss = _shade_and_refill(ss, scene, textures, cam,
                                       frame_seed, pixel_idx, width,
                                       height, cfg, spp, sample_offset,
                                       seed_spp, sample_stride, n_items,
                                       stride=w)
                ss["cnt"] = (ss["mode"] != DONE).sum().astype(jnp.int32)
                return ss

            if shade_every == 1:
                return tick(s)
            do_shade = (s["it"] % shade_every) == (shade_every - 1)
            if cfg.shade_ready_frac > 0:
                # Fire early when enough lanes idle in READY/REFILL
                # (waiting costs a useless full-width gather per
                # step); scheduling only -- images are identical.
                waiting = ((s["mode"] == READY)
                           | (s["mode"] == REFILL)).sum()
                n_lanes = s["mode"].shape[0]
                do_shade = do_shade | (
                    waiting >= max(1, int(n_lanes
                                          * cfg.shade_ready_frac)))
            return jax.lax.cond(do_shade, tick, lambda ss: ss, s)

        def body(carry):
            s = unpack(carry)
            if with_debug:
                modes = [s["mode"]] + ([s["b.mode"]] if dual else [])
                for mm in modes:
                    s["dbg_ctx_done"] += (mm == DONE).sum().astype(
                        jnp.float32)
                    s["dbg_ctx_wait"] += ((mm == READY)
                                          | (mm == REFILL)
                                          | (mm == TEXG)).sum().astype(
                        jnp.float32)
                    s["dbg_ctx_shadeg"] += (mm == SHADEG).sum().astype(
                        jnp.float32)
                    s["dbg_ctx_steps"] += jnp.float32(mm.shape[0])
            if not dual:
                s = run_single(s)
                if inline_ctx is not None:
                    # Lanes retire in-step under inline shading; keep
                    # the ladder's live count exact per body.
                    s["cnt"] = (~lane_done(s)).sum().astype(jnp.int32)
            else:
                # Per-lane mux: step whichever context is mid-walk
                # (alternate when both are).  On shade-tick iterations
                # a PENDING context takes the slot instead so its tick
                # fires -- otherwise a long-running context starves its
                # partner and the two run sequentially.
                a_act = ((s["mode"] == TRAVERSE) | (s["mode"] == SHADOW)
                         | (s["mode"] == SHADEG))
                b_act = ((s["b.mode"] == TRAVERSE)
                         | (s["b.mode"] == SHADOW)
                         | (s["b.mode"] == SHADEG))
                a_pend = ((s["mode"] == READY) | (s["mode"] == REFILL)
                          | (s["mode"] == TEXG))
                b_pend = ((s["b.mode"] == READY)
                          | (s["b.mode"] == REFILL)
                          | (s["b.mode"] == TEXG))
                alt = (s["it"] % 2) == 0
                tick_now = ((s["it"] % shade_every) == (shade_every - 1)
                            if shade_every > 1 else True)
                pick_a = ((a_act & b_act & alt)
                          | (a_act & ~b_act & ~(tick_now & b_pend))
                          | (~a_act & b_act & (tick_now & a_pend))
                          | (~a_act & ~b_act & a_pend))
                w = dict(s)
                for kk in ctx_keys:
                    m = (pick_a if s[kk].ndim == 1 else pick_a[..., None])
                    w[kk] = jnp.where(m, s[kk], s[f"b.{kk}"])
                w = run_single(w)
                out_s = dict(w)
                for kk in ctx_keys:
                    m = (pick_a if s[kk].ndim == 1 else pick_a[..., None])
                    out_s[kk] = jnp.where(m, w[kk], s[kk])
                    out_s[f"b.{kk}"] = jnp.where(m, s[f"b.{kk}"], w[kk])
                s = out_s
                s["cnt"] = (~lane_done(s)).sum().astype(jnp.int32)
            s["it"] = s["it"] + 1
            return pack(s)

        return body

    def done_cond(carry):
        return jnp.any(~lane_done(unpack(carry)))

    def stage_cond(next_w):
        # Live-lane count (cnt, exact after every tick -- lanes only
        # retire at ticks) still exceeds the next stage's width.
        def cond(carry):
            s = unpack(carry)
            return jnp.any(~lane_done(s)) & (s["cnt"] > next_w)
        return cond

    body = make_body()
    # Narrow ladder stages (<= 4096 lanes, where the ~42 us fixed
    # per-body dispatch cost dominates lane math) may run a deeper
    # unroll (cfg.tail_unroll); each stage already compiles its own
    # loop body, so this adds no extra programs.
    tail_body = (make_body(max(1, cfg.tail_unroll))
                 if cfg.tail_unroll > 0 else body)

    def body_for(run_w: int):
        return tail_body if run_w <= 4096 else body

    lane_keys = [kk for kk in keys
                 if getattr(st[kk], "ndim", 0) >= 1
                 and (kk != "out" or not pool)]

    cur = st
    folds = []  # (pre-compaction state dict, sel) per stage
    for si, sw in enumerate(spill_widths):
        run_w = w if si == 0 else spill_widths[si - 1]
        cur = unpack(jax.lax.while_loop(stage_cond(sw), body_for(run_w),
                                        pack(cur)))
        # Compact the unfinished lanes (plus done fillers) to the
        # front.  ``out`` is per-pixel, not per-lane, in pool/quota
        # mode: it stays full-width and keeps being scattered into.
        sel = jnp.argsort(lane_done(cur))[:sw]
        small = dict(cur)
        for kk in lane_keys:
            small[kk] = cur[kk][sel]
        folds.append((cur, sel))
        cur = small
    final_w = spill_widths[-1] if spill_widths else w
    final = unpack(jax.lax.while_loop(done_cond, body_for(final_w),
                                      pack(cur)))

    if folds and not pool:
        # Fold the per-lane radiance back out through the compaction
        # chain (pool/quota ``out`` is already full-width).
        out = final["out"]
        for prev, sel in reversed(folds):
            out = prev["out"].at[sel].set(out)
        final["out"] = out

    if with_debug:
        dbg = dict(bodies=final["it"], ticks=final["dbg_ticks"],
                   visits=final["dbg_visits"],
                   shadow_visits=final["dbg_shadow_visits"],
                   lane_steps=final["dbg_lane_steps"],
                   ctx_done=final["dbg_ctx_done"],
                   ctx_wait=final["dbg_ctx_wait"],
                   ctx_shadeg=final["dbg_ctx_shadeg"],
                   shadeg_steps=final["dbg_shadeg_steps"],
                   ctx_steps=final["dbg_ctx_steps"])
        if with_stats:
            return final["out"], (final["n_traced"],
                                  final["n_shadow"]), dbg
        return final["out"], dbg
    if with_stats:
        return final["out"], (final["n_traced"], final["n_shadow"])
    return final["out"]


def _walk_inv(ls3, rd):
    """Per-lane inverse direction for the shared TRAVERSE/SHADOW step:
    the closest-hit walk uses the sign-preserving safe inverse
    (renderer.cu:371-373), the shadow walk the plain reciprocal
    (renderer.cu:276).  Fused into ONE lane-wide division -- division
    is the costliest VPU elementwise op in the step, and the naive
    ``where(ls3, 1/rd, safe_inv(rd))`` pays it twice.  Bit-identical:
    shadow lanes divide by rd exactly as before, traverse lanes follow
    vec.safe_inv's guarded divide."""
    tiny = (jnp.abs(rd) < 1e-8) & ~ls3
    q = 1.0 / jnp.where(tiny, jnp.float32(1.0), rd)
    big = jnp.where(rd >= 0, jnp.float32(1e20), jnp.float32(-1e20))
    return jnp.where(tiny, big, q)


def _step(s, table, sentinel, k: int, col_ps: int, inline=None,
          service: bool = True, fmt: str = "mt"):
    """One traversal step for TRAVERSE and SHADOW lanes -- a single
    shared node-row gather serves both walks.

    With ``inline`` (cfg.inline_shade), the same gather slot also
    serves SHADEG lanes: ``table`` is the unified [node rows; packed
    trimat rows; texture tile rows] table, a lane whose walk finished
    last step fetches its hit triangle's material row THIS step and
    shades right here, and terminated lanes regenerate in-step
    (_refill, owner schedule).  Textured hits take ONE more serviced
    step (mode TEXG): their bilinear footprint's 5x5 apron tile row
    (ops/texture.build_texture_tiles) rides the same slot next time
    and the shade completes from the stash -- the raw 4-tap gathers
    must stay out of the per-step program (measured -16% when
    forced), and with the tile region in play the engine is fully
    tick-free.  If the tile rows exceed the gather budget
    (TEX_TABLE_BUDGET_BYTES), textured hits park in READY for the
    shade tick instead.
    """
    live_t = s["mode"] == TRAVERSE
    live_s = s["mode"] == SHADOW
    stepping = live_t | live_s

    idx = jnp.where(stepping, jnp.minimum(s["cur"], sentinel - 1), 0)
    service = service and inline is not None
    tex_ctx = inline.get("tex") if service else None
    live_g = live_x = None
    if service:
        idx, live_g, live_x = _service_select(s, idx, sentinel, inline,
                                              tex_ctx)
    row = table[idx]

    ls3 = live_s[..., None]
    ro = jnp.where(ls3, s["so"], s["o"])
    rd = jnp.where(ls3, s["sd"], s["d"])
    inv = _walk_inv(ls3, rd)
    t_min = jnp.where(live_s, jnp.float32(1e-3), jnp.float32(0.0))
    t_max = jnp.where(live_s, s["smax"], s["d_min"])

    hit = aabb_hit(row[:, :6], ro, inv, t_min, t_max) & stepping
    prim_start = row[:, col_ps].astype(jnp.int32)
    prim_count = row[:, col_ps + 1].astype(jnp.int32)
    is_leaf = prim_start >= 0

    # Inline leaf triangles via the shared scan: closest-hit lanes use
    # the (0, d_min) window, shadow lanes the (1e-3, smax-1e-3) window
    # -- hoisted to per-lane (tlo, thi) bounds so the K-unroll pays two
    # compares per slot instead of a live_s select (tlo == t_min).
    thi = jnp.where(live_s, s["smax"] - 1e-3, s["d_min"])
    best_t, best_id = _leaf_intersect(
        row, k, ro, rd, prim_start, prim_count, t_min, thi, fmt=fmt)

    leaf_hit = hit & is_leaf
    found = leaf_hit & (best_id >= 0)
    d_min = jnp.where(found & live_t, best_t, s["d_min"])
    hit_id = jnp.where(found & live_t, best_id, s["hit_id"])
    occluded = found & live_s

    octant = ray_octant(rd)
    nh, nm = _decode_links(row, octant, k, fmt=fmt)
    nxt = jnp.where(hit & ~is_leaf, nh, nm)
    cur = jnp.where(stepping, nxt, s["cur"])

    # Transitions.
    t_done = live_t & (cur >= sentinel)
    s_done = live_s & (occluded | (cur >= sentinel))
    lit = s_done & ~occluded
    rad = s["rad"] + jnp.where(lit[..., None], s["pend"], 0.0)

    mode = s["mode"]
    if inline is None:
        mode = jnp.where(t_done, READY, mode)
    else:
        # A finished walk shades NEXT step (its material row rides the
        # same gather slot); a miss ends the path immediately
        # (renderer.cu:427) and regenerates below.
        mode = jnp.where(t_done, jnp.where(hit_id >= 0, SHADEG, REFILL),
                         mode)
    # A finished shadow ray resumes the (already-selected) next bounce
    # unless its path ended at this bounce: then the lane refills.
    mode = jnp.where(s_done,
                     jnp.where(s["cont_after_shadow"], TRAVERSE, REFILL),
                     mode)
    cur = jnp.where(s_done, 0, cur)
    d_min = jnp.where(s_done, MISS_T, d_min)
    hit_id = jnp.where(s_done, -1, hit_id)

    out = dict(s)
    out.update(mode=mode, cur=cur, d_min=d_min, hit_id=hit_id, rad=rad)
    if service:
        out = _service_shade(out, s, row, live_g, live_x, inline,
                             tex_ctx)
    return out


def _service_select(s, idx, sentinel, inline, tex_ctx):
    """Mux the inline-shading fetches into the step's single gather
    slot: SHADEG lanes take their hit triangle's packed material row
    (unified-table rows follow the node rows), TEXG lanes the absolute
    tile-row index they stashed in ``cur``.  Returns (idx, live_g,
    live_x) with live_x None when inline texturing is off."""
    live_g = s["mode"] == SHADEG
    sid = jnp.maximum(s["hit_id"], 0)
    shade_idx = sentinel + (sid >> 1 if inline["pack"] == 2 else sid)
    idx = jnp.where(live_g, shade_idx, idx)
    live_x = None
    if tex_ctx is not None:
        live_x = s["mode"] == TEXG
        idx = jnp.where(live_x, s["cur"], idx)
    return idx, live_g, live_x


def _service_shade(out, s, row, live_g, live_x, inline, tex_ctx):
    """The in-step shade/texture/regenerate block shared by every
    traversal's step function.  ``row`` is this step's gathered row
    (material row for SHADEG lanes, texture tile row for TEXG lanes),
    ``s`` the pre-step state (hit_id/so/sd/pend/tstash carry the TEXG
    stash across steps)."""
    if inline["pack"] == 2:
        trow = jnp.where(((s["hit_id"] & 1) == 1)[..., None],
                         row[:, 37:74], row[:, 0:37])
    else:
        trow = row[:, 0:37]
    # One _shade_finish instance serves both SHADEG lanes (material
    # row gathered this step) and TEXG lanes (tile row gathered
    # this step + material from last service's stash): prepare
    # handles the SHADEG side (parking NEW textured hits in TEXG),
    # then the TEXG side is muxed into its inputs.
    out, ready_u, deferred, qq = _shade_prepare(
        out, trow, live_g, inline["scene"], inline["textures"],
        inline["cfg"], defer_textured=True, inline_tex=tex_ctx)
    m_all = ready_u
    if tex_ctx is not None:
        ts = out["tstash"]
        offx = jnp.maximum(s["hit_id"], 0) % TEX_TILE
        offy = jnp.maximum(s["hit_id"], 0) // TEX_TILE % TEX_TILE
        factor = tile_bilinear(row, offx, offy, ts[:, 7], ts[:, 8])
        lx3 = live_x[..., None]
        front3 = (ts[:, 9] > 0.0)[..., None]
        nl_x = out["so"]
        qq = dict(qq)
        qq["nl"] = jnp.where(lx3, nl_x, qq["nl"])
        qq["nrm"] = jnp.where(lx3, jnp.where(front3, nl_x, -nl_x),
                              qq["nrm"])
        qq["nl_off"] = jnp.where(lx3, out["sd"], qq["nl_off"])
        qq["albedo"] = jnp.where(lx3, ts[:, 0:3] * factor,
                                 qq["albedo"])
        qq["emission"] = jnp.where(lx3, out["pend"], qq["emission"])
        qq["metallic"] = jnp.where(live_x, ts[:, 3], qq["metallic"])
        qq["roughness"] = jnp.where(live_x, ts[:, 4],
                                    qq["roughness"])
        qq["ior"] = jnp.where(live_x, ts[:, 5], qq["ior"])
        qq["transmission"] = jnp.where(live_x, ts[:, 6],
                                       qq["transmission"])
        m_all = ready_u | live_x
    out = _shade_finish(out, m_all, deferred, qq, inline["scene"],
                        inline["cfg"])
    # In-step path regeneration (all elementwise, no gathers:
    # owner refills its own pixel's next sample; quota claims
    # pos+stride with the pixel_pool_fn map and flushes by one-hot
    # FMA) -- REFILL lanes created by the shade above or the
    # miss/shadow transitions regenerate before the next step.
    return _refill(out, inline["cam"], inline["frame_seed"],
                   inline["pixel_pool"], inline["width"],
                   inline["height"], inline["cfg"], inline["spp"],
                   inline["sample_offset"], inline["seed_spp"],
                   inline["sample_stride"],
                   n_items=inline["n_items"],
                   stride=inline["stride"],
                   pool_fn=inline["pool_fn"])


def _step_pair(s, table, sentinel, k: int, col_ps: int, inline=None,
               service: bool = True, fmt: str = "mt"):
    """One pair-row traversal step (accel/bvh.py pack_pair_table) for
    TRAVERSE and SHADOW lanes, sharing the single row gather; with
    ``inline`` the same slot serves SHADEG/TEXG exactly like _step.

    Each fetched internal row tests BOTH children's boxes and branches
    near / far / threaded continuation; leaf rows MT their inline
    triangles with no own-box test (the MT window gates exactly).  The
    one-slot skip register (reg_e -> reg_s, per lane) removes most
    containment-absorbed entries into known-missed far nodes
    (scripts/sim_pair_walk.py: ~0.8x the threaded walk's gathers).  A
    lane at cur == 0 is starting a fresh walk, so its register resets
    first (no link ever re-enters the root)."""
    live_t = s["mode"] == TRAVERSE
    live_s = s["mode"] == SHADOW
    stepping = live_t | live_s

    fresh = (s["cur"] == 0) & stepping
    reg_e = jnp.where(fresh, -1, s["reg_e"])
    reg_s = jnp.where(fresh, -1, s["reg_s"])

    idx = jnp.where(stepping, jnp.minimum(s["cur"], sentinel - 1), 0)
    service = service and inline is not None
    tex_ctx = inline.get("tex") if service else None
    live_g = live_x = None
    if service:
        idx, live_g, live_x = _service_select(s, idx, sentinel, inline,
                                              tex_ctx)
    row = table[idx]

    ls3 = live_s[..., None]
    ro = jnp.where(ls3, s["so"], s["o"])
    rd = jnp.where(ls3, s["sd"], s["d"])
    inv = _walk_inv(ls3, rd)
    t_min = jnp.where(live_s, jnp.float32(1e-3), jnp.float32(0.0))

    prim_start = row[:, 0].astype(jnp.int32)
    prim_count = row[:, 1].astype(jnp.int32)
    is_leaf = prim_start >= 0

    thi = jnp.where(live_s, s["smax"] - 1e-3, s["d_min"])
    best_t, best_id = _fat_leaf_intersect(
        row, k, ro, rd, prim_start, prim_count, t_min, thi,
        base0=PAIR_COL_BODY, fmt=fmt)

    found = stepping & is_leaf & (best_id >= 0)
    d_min = jnp.where(found & live_t, best_t, s["d_min"])
    hit_id = jnp.where(found & live_t, best_id, s["hit_id"])
    occluded = found & live_s

    # Child boxes test against the post-leaf-update closest hit
    # (irrelevant in the same step -- a row is leaf xor internal --
    # but keeps the window exactly the walk's current best).
    t_max = jnp.where(live_s, s["smax"], d_min)
    octant = ray_octant(rd)
    cont, nxt_int, push, far = _pair_decode(row, octant, ro, inv,
                                            t_min, t_max)
    nxt = jnp.where(is_leaf, cont, nxt_int)
    push = push & ~is_leaf & stepping
    reg_e = jnp.where(push, far, reg_e)
    reg_s = jnp.where(push, cont, reg_s)
    redirect = stepping & (reg_e >= 0) & (nxt == reg_e)
    nxt = jnp.where(redirect, reg_s, nxt)
    reg_e = jnp.where(redirect, -1, reg_e)
    cur = jnp.where(stepping, nxt, s["cur"])

    # Transitions (identical to _step).
    t_done = live_t & (cur >= sentinel)
    s_done = live_s & (occluded | (cur >= sentinel))
    lit = s_done & ~occluded
    rad = s["rad"] + jnp.where(lit[..., None], s["pend"], 0.0)

    mode = s["mode"]
    if inline is None:
        mode = jnp.where(t_done, READY, mode)
    else:
        mode = jnp.where(t_done, jnp.where(hit_id >= 0, SHADEG, REFILL),
                         mode)
    mode = jnp.where(s_done,
                     jnp.where(s["cont_after_shadow"], TRAVERSE, REFILL),
                     mode)
    cur = jnp.where(s_done, 0, cur)
    d_min = jnp.where(s_done, MISS_T, d_min)
    hit_id = jnp.where(s_done, -1, hit_id)

    out = dict(s)
    out.update(mode=mode, cur=cur, d_min=d_min, hit_id=hit_id, rad=rad,
               reg_e=reg_e, reg_s=reg_s)
    if service:
        out = _service_shade(out, s, row, live_g, live_x, inline,
                             tex_ctx)
    return out


def _step_quad(s, table, sentinel, k: int, col_ps: int, inline=None,
               service: bool = True, fmt: str = "mt",
               redirect_passes: int = 2,
               oct_stride: int | None = None,
               select: str = "perm"):
    """One quad-row traversal step (accel/bvh.py pack_quad_table) for
    TRAVERSE and SHADOW lanes, sharing the single row gather; with
    ``inline`` the same slot serves SHADEG/TEXG exactly like _step.

    Each fetched internal row tests FOUR collapsed children's boxes
    and jumps to the first hit in per-octant front-to-back order; the
    3-slot skip-register file (reg_e/reg_s [w, 3], per lane) removes
    most containment-absorbed entries into known-missed siblings
    (scripts/sim_pair_walk.py multi_walk: 0.52-0.64x the threaded
    walk's gathers).  A lane at cur == 0 is starting a fresh walk, so
    its register file resets first (no link ever re-enters the root).

    ``oct_stride`` (not None): octant-baked table layout
    (pack_quad_oct_table) -- a fresh walk enters its lane's octant
    root row and the decode reads pre-permuted slots, dropping the
    permutation mux network from the step program.
    """
    live_t = s["mode"] == TRAVERSE
    live_s = s["mode"] == SHADOW
    stepping = live_t | live_s

    use_regs = "reg_e" in s  # cfg.quad_regs == 0 drops the file
    if use_regs:
        fresh = ((s["cur"] == 0) & stepping)[..., None]
        reg_e = jnp.where(fresh, -1, s["reg_e"])
        reg_s = jnp.where(fresh, -1, s["reg_s"])

    ls3 = live_s[..., None]
    ro = jnp.where(ls3, s["so"], s["o"])
    rd = jnp.where(ls3, s["sd"], s["d"])
    inv = _walk_inv(ls3, rd)
    t_min = jnp.where(live_s, jnp.float32(1e-3), jnp.float32(0.0))
    octant = ray_octant(rd)

    cur = s["cur"]
    if oct_stride is not None and oct_stride > 0:
        cur = jnp.where(cur == 0, octant * oct_stride, cur)
    idx = jnp.where(stepping, jnp.minimum(cur, sentinel - 1), 0)
    service = service and inline is not None
    tex_ctx = inline.get("tex") if service else None
    live_g = live_x = None
    if service:
        idx, live_g, live_x = _service_select(s, idx, sentinel, inline,
                                              tex_ctx)
    row = table[idx]

    prim_start = row[:, 0].astype(jnp.int32)
    prim_count = row[:, 1].astype(jnp.int32)
    is_leaf = prim_start >= 0

    thi = jnp.where(live_s, s["smax"] - 1e-3, s["d_min"])
    best_t, best_id = _fat_leaf_intersect(
        row, k, ro, rd, prim_start, prim_count, t_min, thi,
        base0=QUAD_COL_BODY, fmt=fmt)

    found = stepping & is_leaf & (best_id >= 0)
    d_min = jnp.where(found & live_t, best_t, s["d_min"])
    hit_id = jnp.where(found & live_t, best_id, s["hit_id"])
    occluded = found & live_s

    t_max = jnp.where(live_s, s["smax"], d_min)
    decode = (_quad_decode_rank if select == "rank"
              else _quad_decode if oct_stride is None
              else _quad_decode_oct)
    cont, nxt_int, pushes = decode(row, octant, ro, inv,
                                   t_min, t_max)
    nxt = jnp.where(is_leaf, cont, nxt_int)
    if use_regs:
        reg_e, reg_s, nxt = _regfile_apply(reg_e, reg_s, pushes, nxt,
                                           stepping,
                                           ~is_leaf & stepping,
                                           passes=redirect_passes)
    pred_on = "pred" in s  # cfg.shadow_pred (quad only)
    if pred_on:
        # A lane ON its predicted occluder row (pred_pending): if the
        # row did not occlude, restart the walk from the root -- the
        # predicted row's thread continuation belongs to a different
        # entry path, and nxt==0 never collides with stale skip
        # registers (no link re-enters the root).  The root pass may
        # re-test the predicted row later: one wasted fetch, exact
        # (any-hit is order-independent).
        pp = s["pred_pending"] & live_s
        nxt = jnp.where(pp, 0, nxt)
    cur = jnp.where(stepping, nxt, s["cur"])

    # Transitions (identical to _step/_step_pair).
    t_done = live_t & (cur >= sentinel)
    s_done = live_s & (occluded | (cur >= sentinel))
    lit = s_done & ~occluded
    rad = s["rad"] + jnp.where(lit[..., None], s["pend"], 0.0)

    mode = s["mode"]
    if inline is None:
        mode = jnp.where(t_done, READY, mode)
    else:
        mode = jnp.where(t_done, jnp.where(hit_id >= 0, SHADEG, REFILL),
                         mode)
    mode = jnp.where(s_done,
                     jnp.where(s["cont_after_shadow"], TRAVERSE, REFILL),
                     mode)
    cur = jnp.where(s_done, 0, cur)
    d_min = jnp.where(s_done, MISS_T, d_min)
    hit_id = jnp.where(s_done, -1, hit_id)

    out = dict(s)
    out.update(mode=mode, cur=cur, d_min=d_min, hit_id=hit_id, rad=rad)
    if use_regs:
        out.update(reg_e=reg_e, reg_s=reg_s)
    if pred_on:
        # Remember the occluding leaf row for the lane's NEXT shadow
        # walk (same pixel, next sample: highly coherent); the pending
        # bit clears once its step ran or the walk ended.
        out.update(pred=jnp.where(occluded, idx, s["pred"]),
                   pred_pending=s["pred_pending"] & ~pp & ~s_done)
    if service:
        out = _service_shade(out, s, row, live_g, live_x, inline,
                             tex_ctx)
    return out


def _step_fat(s, table, sentinel, k: int, col_ps: int, inline=None,
              service: bool = True, fmt: str = "mt"):
    """One fat-node traversal step for TRAVERSE and SHADOW lanes,
    sharing the single parent-row gather (see ops/traverse.py
    fatnode_step).  A lane with cur == 0 is starting a fresh walk, so
    its register stack resets first (roots are never revisited)."""
    live_t = s["mode"] == TRAVERSE
    live_s = s["mode"] == SHADOW
    stepping = live_t | live_s

    stack = jnp.where(((s["cur"] == 0) & stepping)[..., None],
                      sentinel, s["stack"])

    ls3 = live_s[..., None]
    ro = jnp.where(ls3, s["so"], s["o"])
    rd = jnp.where(ls3, s["sd"], s["d"])
    inv = _walk_inv(ls3, rd)
    t_min = jnp.where(live_s, jnp.float32(1e-3), jnp.float32(0.0))
    t_max = jnp.where(live_s, s["smax"], s["d_min"])

    thi = jnp.where(live_s, s["smax"] - 1e-3, s["d_min"])
    cur, stack, lt, lid = fatnode_step(
        table, k, ro, rd, inv, s["cur"], stack,
        t_min, t_max, t_min, thi, stepping, fmt=fmt)

    take = live_t & (lid >= 0)
    d_min = jnp.where(take, lt, s["d_min"])
    hit_id = jnp.where(take, lid, s["hit_id"])
    occluded = live_s & (lid >= 0)

    cur = jnp.where(stepping, cur, s["cur"])
    t_done = live_t & (cur >= sentinel)
    s_done = live_s & (occluded | (cur >= sentinel))
    lit = s_done & ~occluded
    rad = s["rad"] + jnp.where(lit[..., None], s["pend"], 0.0)

    mode = s["mode"]
    mode = jnp.where(t_done, READY, mode)
    mode = jnp.where(s_done,
                     jnp.where(s["cont_after_shadow"], TRAVERSE, REFILL),
                     mode)
    cur = jnp.where(s_done, 0, cur)
    d_min = jnp.where(s_done, MISS_T, d_min)
    hit_id = jnp.where(s_done, -1, hit_id)

    out = dict(s)
    out.update(mode=mode, cur=cur, d_min=d_min, hit_id=hit_id, rad=rad,
               stack=stack)
    return out


def _shade_and_refill(s, scene, textures, cam, frame_seed, pixel_pool,
                      width, height, cfg: RenderConfig, spp: int,
                      sample_offset: int, seed_spp: int,
                      sample_stride: int = 1, n_items: int = 0,
                      stride: int = 0):
    s = _shade_ready(s, scene, textures, cfg)
    return _refill(s, cam, frame_seed, pixel_pool, width, height, cfg, spp,
                   sample_offset, seed_spp, sample_stride, n_items, stride)


def _shade_ready(s, scene, textures, cfg: RenderConfig):
    """Shade every READY lane: the full reference shading block
    (renderer.cu:427-733) in masked form, slot-addressed RNG by the
    lane's own (sample seed, pixel, depth)."""
    ready = s["mode"] == READY
    sid = jnp.maximum(s["hit_id"], 0)
    hitrow = scene.trimat[sid]
    return _shade_core(s, hitrow, ready, scene, textures, cfg)


def _shade_core(s, hitrow, mask, scene, textures, cfg: RenderConfig,
                defer_textured: bool = False, inline_tex=None):
    """The reference shading block (renderer.cu:427-733) over the
    lanes in ``mask``, with ``hitrow`` their (already-gathered) fused
    triangle+material rows.  RNG is slot-addressed by the lane's own
    (sample seed, pixel, depth), so WHEN a lane is shaded cannot
    change WHAT it draws -- the tick path (_shade_ready) and the
    inline paths (SHADEG/TEXG lanes in _step) produce identical paths.

    ``defer_textured``: textured hits are not shaded here -- without
    ``inline_tex`` they park in READY for the shade tick (which
    redraws the same RNG slots, so deferral is exact); with
    ``inline_tex`` (the tiled-texture region of the unified gather
    table) they transition to TEXG with their material stashed, fetch
    their bilinear footprint's tile row through the per-step gather
    slot on the next serviced step, and shade there."""
    s, ready, deferred, q = _shade_prepare(s, hitrow, mask, scene,
                                           textures, cfg, defer_textured,
                                           inline_tex)
    return _shade_finish(s, ready, deferred, q, scene, cfg)


def _shade_prepare(s, hitrow, mask, scene, textures, cfg: RenderConfig,
                   defer_textured: bool = False, inline_tex=None):
    """Geometry/material extraction half of the shading block: normals,
    texture factor (or TEXG deferral), smooth shading.  Returns
    (s, ready, deferred, q) where q holds the per-lane quantities
    _shade_finish consumes -- the split lets the inline-tex path feed
    finish from its stash instead of a material row, with the RNG/
    branch/NEE body instantiated once per step program."""
    ready = mask
    found = s["hit_id"] >= 0
    deferred = jnp.zeros_like(ready)
    if defer_textured and textures:
        textured = hitrow[:, 19] >= 0.0
        if inline_tex is not None:
            # Out-of-range slots sample as factor 1 (sample_textures);
            # shade them immediately instead of tiling garbage.
            textured = textured & (hitrow[:, 19] < len(textures))
        deferred = ready & found & textured
        ready = ready & ~deferred

    v0 = hitrow[:, 0:3]
    v1 = hitrow[:, 3:6]
    v2 = hitrow[:, 6:9]
    o, d = s["o"], s["d"]
    x_hit = o + d * s["d_min"][..., None]

    nrm = vec.norm(vec.cross(v1 - v0, v2 - v0, jnp), jnp)
    nl = jnp.where((vec.dot(nrm, d, jnp) < 0.0)[..., None], nrm, -nrm)

    albedo = hitrow[:, 9:12]
    emission = hitrow[:, 12:15]
    metallic = hitrow[:, 15]
    roughness = hitrow[:, 16]
    ior = hitrow[:, 17]
    transmission = hitrow[:, 18]

    t_u = t_v = None
    if textures and (not defer_textured or inline_tex is not None):
        # Planar projection, or interpolated per-vertex UVs where
        # present (beyond-reference, RenderConfig.uv_mapping).
        t_u, t_v = planar_uv(x_hit, nrm, jnp.float32(cfg.tex_planar_scale))
        if cfg.uv_mapping and scene.has_uvs:
            b1, b2, okb = shade.barycentric(v0, v1, v2, x_hit)
            iu, iv = interp_uv(hitrow[:, 30:36], b1, b2)
            use_uv = (hitrow[:, 36] > 0.0) & okb
            t_u = jnp.where(use_uv, iu, t_u)
            t_v = jnp.where(use_uv, iv, t_v)
        if not defer_textured:
            # Tick path: 4-tap bilinear gathers, applied immediately.
            # (With deferral the tap gathers must not be in the
            # per-step program at all -- measured -16% when forced.)
            factor = sample_textures(
                textures, hitrow[:, 19].astype(jnp.int32), t_u, t_v)
            albedo = albedo * factor

    # Ray-offset origins always use the geometric front-face normal
    # (self-intersection robustness); with smooth shading on, every
    # shading *direction* below uses the interpolated normal instead.
    nl_off = nl
    if cfg.smooth_shading and scene.has_normals:
        nrm = shade.smooth_normal(v0, v1, v2, hitrow[:, 21:24],
                                  hitrow[:, 24:27], hitrow[:, 27:30],
                                  x_hit, nrm)
        nl = jnp.where((vec.dot(nrm, d, jnp) < 0.0)[..., None], nrm, -nrm)

    if inline_tex is not None and textures:
        # TEXG transition: stash everything the finish body will need
        # (the tile row takes the gather slot next serviced step, so
        # the material row is gone).  nrm is reconstructed from nl and
        # the front-face bit: nl == nrm when dot(nrm, d) < 0 else -nrm,
        # and negation is exact.
        trow_i, offx, offy, fx, fy = tile_coords(
            textures, inline_tex["metas"],
            hitrow[:, 19].astype(jnp.int32), t_u, t_v)
        front = vec.dot(nrm, d, jnp) < 0.0
        t3 = deferred[..., None]
        s = dict(s)
        s["so"] = jnp.where(t3, nl, s["so"])
        s["sd"] = jnp.where(t3, nl_off, s["sd"])
        s["pend"] = jnp.where(t3, emission, s["pend"])
        stash = jnp.concatenate(
            [albedo, metallic[..., None], roughness[..., None],
             ior[..., None], transmission[..., None], fx[..., None],
             fy[..., None], front[..., None].astype(jnp.float32)],
            axis=-1)
        s["tstash"] = jnp.where(t3, stash, s["tstash"])
        s["mode"] = jnp.where(deferred, TEXG, s["mode"])
        s["cur"] = jnp.where(deferred, inline_tex["tex0"] + trow_i,
                             s["cur"])
        s["hit_id"] = jnp.where(deferred, offy * TEX_TILE + offx,
                                s["hit_id"])
        deferred = jnp.zeros_like(deferred)

    q = dict(x_hit=x_hit, nrm=nrm, nl=nl, nl_off=nl_off, albedo=albedo,
             emission=emission, metallic=metallic, roughness=roughness,
             ior=ior, transmission=transmission)
    return s, ready, deferred, q


def _shade_finish(s, ready, deferred, q, scene, cfg: RenderConfig):
    """RNG/branch/NEE half of the shading block (renderer.cu:487-733):
    emitter accumulation, Russian roulette, the spec/trans/diff branch
    select, NEE shadow-segment setup, and the mode transitions."""
    seed = s["seed"]
    pixel_idx = s["pix"]
    found = s["hit_id"] >= 0
    alive = ready & found  # miss -> path ends (renderer.cu:427)
    o, d, tp, rad = s["o"], s["d"], s["tp"], s["rad"]
    depth = s["depth"]
    x_hit = q["x_hit"]
    nrm = q["nrm"]
    nl = q["nl"]
    nl_off = q["nl_off"]
    albedo = q["albedo"]
    emission = q["emission"]
    metallic = q["metallic"]
    roughness = q["roughness"]
    ior = q["ior"]
    transmission = q["transmission"]

    rad = rad + jnp.where((alive & s["prev_spec"])[..., None],
                          tp * emission, 0.0)
    is_emitter = (emission > cfg.emitter_stop_threshold).any(axis=-1)
    alive = alive & ~is_emitter

    p_spec, p_trans, fres = shade.pbr_weights(
        albedo, metallic, roughness, transmission, nl, d)

    base = rng.CAMERA_DRAWS + depth * rng.DRAWS_PER_BOUNCE
    u_rr = rng.uniform(seed, pixel_idx, base + rng.SLOT_RR, jnp)
    rr_on = depth > cfg.rr_threshold
    p_live = jnp.maximum(albedo.max(axis=-1), cfg.rr_min_p)
    survive = u_rr < p_live
    tp = jnp.where((rr_on & alive & survive)[..., None],
                   tp * (1.0 / p_live)[..., None], tp)
    alive = alive & (~rr_on | survive)

    u_b = rng.uniform(seed, pixel_idx, base + rng.SLOT_BRANCH, jnp)
    m_spec = alive & (u_b < p_spec)
    m_trans = alive & ~m_spec & (u_b < p_spec + p_trans)
    m_diff = alive & ~m_spec & ~m_trans

    u_d1 = rng.uniform(seed, pixel_idx, base + rng.SLOT_DIR_R1, jnp)
    u_d2 = rng.uniform(seed, pixel_idx, base + rng.SLOT_DIR_R2, jnp)

    # Branch A: specular (renderer.cu:571-589).
    perfect = shade.reflect(d, nrm)
    d_spec = shade.rough_perturb(perfect, roughness, u_d1, u_d2)
    kill_spec = vec.dot(d_spec, nl, jnp) <= 0.0
    tp_spec = tp * fres * (1.0 / p_spec)[..., None]
    o_spec = x_hit + nl_off * np.float32(cfg.shadow_eps)

    # Branch B: transmission (renderer.cu:592-648).
    d_trans, _ = shade.refract_branch(d, nrm, nl, ior, roughness, u_d1, u_d2)
    p_branch = (1.0 - p_spec) * transmission
    tp_trans = jnp.where(
        (p_branch > 1e-4)[..., None],
        tp * albedo / jnp.where(p_branch > 1e-4, p_branch, 1.0)[..., None],
        tp)
    o_trans = x_hit + d_trans * np.float32(cfg.refr_offset)

    # Branch C: diffuse + NEE setup (renderer.cu:651-733).
    has_shadow = jnp.zeros_like(m_diff)
    pend = jnp.zeros_like(tp)
    so = s["so"]
    sd = s["sd"]
    smax = s["smax"]
    if scene.num_lights > 0:
        lcount = scene.num_lights
        u4 = rng.uniform(seed, pixel_idx, base + rng.SLOT_LIGHT_PICK, jnp)
        u5 = rng.uniform(seed, pixel_idx, base + rng.SLOT_LIGHT_R1, jnp)
        u6 = rng.uniform(seed, pixel_idx, base + rng.SLOT_LIGHT_R2, jnp)
        if lcount == 1:
            # Single light (the reference scene's case): the picked row
            # is a constant -- broadcast it instead of gathering per
            # lane (u4 is still drawn for stream parity; pick==0).
            lrow = jnp.broadcast_to(scene.trimat[scene.light_indices[0]],
                                    (u4.shape[0], scene.trimat.shape[1]))
        else:
            pick = jnp.clip((u4 * (lcount - 0.001)).astype(jnp.int32), 0,
                            lcount - 1)
            if lcount <= INLINE_MAX_LIGHTS:
                # Few lights: a where-chain select over the (loop-
                # invariant) light rows is pure selection -- bit-exact
                # vs the gather and, unlike it, elementwise, so it may
                # live in the inline per-step program without claiming
                # a second gather slot (config.inline_resolved gate).
                lrows = scene.trimat[scene.light_indices]
                lrow = jnp.broadcast_to(lrows[0],
                                        (u4.shape[0], lrows.shape[1]))
                for kk in range(1, lcount):
                    lrow = jnp.where((pick == kk)[..., None], lrows[kk],
                                     lrow)
            else:
                li = scene.light_indices[pick]
                lrow = scene.trimat[li]
        lv0, lv1, lv2 = lrow[:, 0:3], lrow[:, 3:6], lrow[:, 6:9]
        light_pos = shade.sample_triangle(lv0, lv1, lv2, u5, u6)
        to_light = light_pos - x_hit
        dist_sq = vec.dot(to_light, to_light, jnp)
        if cfg.nee_dist_floor_enabled:
            dist_sq = jnp.maximum(dist_sq, cfg.nee_dist_sq_floor)
        dist = jnp.sqrt(dist_sq)
        l_dir = to_light * (1.0 / dist)[..., None]
        cos_theta = vec.dot(nl, l_dir, jnp)
        light_n = vec.norm(vec.cross(lv1 - lv0, lv2 - lv0, jnp), jnp)
        cos_light = -vec.dot(light_n, l_dir, jnp)
        geo_ok = m_diff & (cos_theta > 0.0) & (cos_light > 0.0)

        area = lrow[:, 20]
        pdf = 1.0 / (area * lcount)
        g_term = (cos_theta * cos_light) / dist_sq
        brdf = albedo * (1.0 / PI)
        contrib = lrow[:, 12:15] * brdf * (g_term / pdf)[..., None]

        has_shadow = geo_ok
        g3 = geo_ok[..., None]
        pend = jnp.where(g3, tp * contrib, pend)
        so = jnp.where(g3, x_hit + nl_off * np.float32(cfg.shadow_eps),
                       so)
        sd = jnp.where(g3, l_dir, sd)
        smax = jnp.where(geo_ok,
                         dist - np.float32(cfg.shadow_max_dist_eps), smax)

    d_diff = shade.cosine_hemisphere(nl, u_d1, u_d2)
    p_diff = 1.0 - p_spec - (1.0 - p_spec) * transmission
    tp_diff = (tp * (albedo * (1.0 - metallic)[..., None])
               * (1.0 / p_diff)[..., None])
    o_diff = x_hit + nl_off * np.float32(cfg.shadow_eps)

    ms3, mt3, md3 = m_spec[..., None], m_trans[..., None], m_diff[..., None]
    new_d = jnp.where(ms3, d_spec, jnp.where(mt3, d_trans, d_diff))
    new_o = jnp.where(ms3, o_spec, jnp.where(mt3, o_trans, o_diff))
    new_tp = jnp.where(ms3, tp_spec,
                       jnp.where(mt3, tp_trans,
                                 jnp.where(md3, tp_diff, tp)))
    alive = alive & ~(m_spec & kill_spec)
    new_prev = jnp.where(m_spec | m_trans, True,
                         jnp.where(m_diff, False, s["prev_spec"]))

    # Depth cap (renderer.cu:367): NEE still fires at the final depth
    # (the reference runs the full diffuse body before the loop exits).
    next_depth = depth + 1
    alive = alive & (next_depth < cfg.max_depth)
    shadow_fire = ready & has_shadow  # implies m_diff

    mode = s["mode"]
    mode = jnp.where(ready, REFILL, mode)  # default: path over
    mode = jnp.where(deferred, READY, mode)  # textured -> shade tick
    cont = ready & alive
    mode = jnp.where(cont & ~has_shadow, TRAVERSE, mode)
    mode = jnp.where(shadow_fire, SHADOW, mode)
    cont_after_shadow = jnp.where(shadow_fire, alive,
                                  s["cont_after_shadow"])
    cur = jnp.where(ready, 0, s["cur"])
    d_min = jnp.where(ready, MISS_T, s["d_min"])
    hit_id = jnp.where(ready, -1, s["hit_id"])

    out = dict(s)
    if "pred" in s:
        # Shadow-ray occluder prediction (cfg.shadow_pred, quad walk):
        # a fired shadow segment with a remembered occluder starts ON
        # that leaf row instead of the root.
        pred_ok = shadow_fire & (s["pred"] >= 0)
        cur = jnp.where(pred_ok, s["pred"], cur)
        out["pred_pending"] = jnp.where(ready, pred_ok,
                                        s["pred_pending"])
    out.update(
        mode=mode, cur=cur, d_min=d_min, hit_id=hit_id,
        o=jnp.where(ready[..., None], new_o, o),
        d=jnp.where(ready[..., None], new_d, d),
        tp=jnp.where(ready[..., None], new_tp, tp),
        rad=rad,
        depth=jnp.where(ready, next_depth, depth),
        prev_spec=jnp.where(ready, new_prev, s["prev_spec"]),
        so=so, sd=sd, smax=smax,
        pend=jnp.where(ready[..., None], pend, s["pend"]),
        cont_after_shadow=cont_after_shadow,
        n_traced=s["n_traced"] + cont.sum().astype(jnp.float32),
        n_shadow=s["n_shadow"] + shadow_fire.sum().astype(jnp.float32),
    )
    return out


def _refill(s, cam, frame_seed, pixel_pool, width, height,
            cfg: RenderConfig, spp: int, sample_offset: int,
            seed_spp: int, sample_stride: int = 1, n_items: int = 0,
            stride: int = 0, pool_fn=None):
    """Path regeneration: flush the finished sample's radiance through
    the reference's sanitation filters (renderer.cu:737-759) and start
    the lane's next sample.  When the lane's pixel is out of samples:
    owner schedule (n_items == 0) retires the lane; pool/quota
    schedules flush into ``out`` and claim the next pool position --
    pool from a shared counter (true stealing), quota statically at
    ``pos + stride`` (lane i owns column i of the [n/w, w] pool grid),
    so lanes only go DONE once their share of the pool is drained."""
    refill = s["mode"] == REFILL
    flushed = _sanitize(s["rad"], cfg)
    rad = jnp.where(refill[..., None], 0.0, s["rad"])

    next_sample = s["sample"] + sample_stride
    exhausted = next_sample >= spp
    res = dict(s)

    if n_items > 0 and cfg.scheduler == "quota":
        pixel_done = refill & exhausted
        upd = jnp.where(refill[..., None], flushed, 0.0)
        w_cur = int(refill.shape[0])
        if (cfg.quota_accum == "onehot" and w_cur == stride
                and n_items % stride == 0):
            # Full-width wave: lane i owns column i of the [Q, w] pool
            # grid (pos = i + k*w), so the flush is a one-hot FMA over
            # the Q quota rows -- pure vector math, no scatter (TPU
            # scatters cost more per element even with the uniqueness
            # promise).  Spill waves (compacted, columns no longer
            # aligned) take the scatter branch below.
            q = n_items // stride
            k_idx = s["pos"] // stride
            oh = (k_idx[None, :] == jnp.arange(q, dtype=jnp.int32)[:, None])
            out = (s["out"].reshape(q, stride, 3)
                   + oh[..., None].astype(jnp.float32) * upd[None]
                   ).reshape(n_items, 3)
        else:
            # Lane positions are distinct pool positions for the whole
            # frame, so the scatter can promise unique in-bounds
            # indices (serialization-free); non-refill lanes add exact
            # 0.0 at their current position.
            out = s["out"].at[s["pos"]].add(
                upd, unique_indices=True, mode="promise_in_bounds")
        newpos = s["pos"] + stride
        have = pixel_done & (newpos < n_items)
        safe = jnp.minimum(newpos, n_items - 1)
        # pool_fn is the elementwise pixel_idx[pos] map (see
        # render_frame_persistent): required in the inline per-step
        # program, where the gather would claim a second slot.
        nextpix = pool_fn(safe) if pool_fn is not None else pixel_pool[safe]
        pix = jnp.where(have, nextpix, s["pix"])
        new_sample = jnp.where(pixel_done, 0,
                               jnp.where(refill, next_sample, s["sample"]))
        start = refill & (~exhausted | have)
        mode = jnp.where(refill, jnp.where(start, TRAVERSE, DONE),
                         s["mode"])
        res.update(
            out=out,
            pos=jnp.where(have, newpos, s["pos"]),
            pix=pix,
        )
    elif n_items > 0:  # pool schedule
        acc = s["acc"] + jnp.where(refill[..., None], flushed, 0.0)
        pixel_done = refill & exhausted
        # Every lane's ``pos`` is a distinct pool position for the
        # whole frame (claims are unique), so the scatter can promise
        # unique in-bounds indices -- without the promise TPU scatter-
        # add serializes.  Idle lanes add exact 0.0 at their old pos.
        out = s["out"].at[s["pos"]].add(
            jnp.where(pixel_done[..., None], acc, 0.0),
            unique_indices=True, mode="promise_in_bounds")
        claims = pixel_done.astype(jnp.int32)
        newpos = s["pool_next"] + jnp.cumsum(claims) - claims
        have = pixel_done & (newpos < n_items)
        pix = jnp.where(
            have, pixel_pool[jnp.minimum(newpos, n_items - 1)], s["pix"])
        new_sample = jnp.where(pixel_done, 0,
                               jnp.where(refill, next_sample, s["sample"]))
        start = refill & (~exhausted | have)
        mode = jnp.where(refill, jnp.where(start, TRAVERSE, DONE),
                         s["mode"])
        res.update(
            out=out,
            acc=jnp.where(pixel_done[..., None], 0.0, acc),
            pos=jnp.where(have, newpos, s["pos"]),
            pix=pix,
            pool_next=s["pool_next"] + claims.sum(),
        )
    else:  # owner schedule: lane pixel is fixed, out is per lane
        out = s["out"] + jnp.where(refill[..., None], flushed, 0.0)
        new_sample = jnp.where(refill, next_sample, s["sample"])
        start = refill & ~exhausted
        mode = jnp.where(refill, jnp.where(exhausted, DONE, TRAVERSE),
                         s["mode"])
        pix = s["pix"]
        res.update(out=out)

    new_seed = _lane_seed(frame_seed, seed_spp,
                          new_sample + jnp.int32(sample_offset))
    r_o, r_d = generate_rays(cam, width, height, new_seed, pix)

    st3 = start[..., None]
    res.update(
        mode=mode,
        cur=jnp.where(start, 0, s["cur"]),
        d_min=jnp.where(start, MISS_T, s["d_min"]),
        hit_id=jnp.where(start, -1, s["hit_id"]),
        o=jnp.where(st3, r_o, s["o"]),
        d=jnp.where(st3, r_d, s["d"]),
        tp=jnp.where(st3, 1.0, s["tp"]),
        rad=rad,
        sample=new_sample,
        seed=jnp.where(refill, new_seed, s["seed"]),
        depth=jnp.where(start, 0, s["depth"]),
        prev_spec=jnp.where(start, True, s["prev_spec"]),
        n_traced=s["n_traced"] + start.sum().astype(jnp.float32),
    )
    return res
