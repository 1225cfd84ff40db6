"""Cross-frame persistent progressive renderer.

The batch engine (render_frame_persistent) renders EXACTLY ``spp``
samples per pixel per call, so every frame ends with a spill-ladder
drain: as lanes exhaust their samples the wave empties and the tail
iterations run at partial occupancy (measured 0.13 of lane-steps idle
in DONE at the 16-spp headline, and ~35% of the 1-spp interactive
frame -- the drain cannot amortize over one sample).

The reference application is not a batch renderer: it is an endless
*progressive* accumulator -- 1 spp per kernel launch, ``accum +=
sample`` forever, reset on camera motion
(/root/reference/src/main.cpp:149,170-181).  That loop structure never
needs a drain at all: a lane that finishes its pixel's sample s can
start sample s+1 IMMEDIATELY, because the next frame wants it anyway.
This engine exploits exactly that: the persistent wave state lives
ACROSS display frames (carried through donated jit calls), lanes
regenerate into their pixel's next sample indefinitely, and a
"frame" is just ``run these chunks for N iterations, then snapshot``.
There is no ladder, no tail, and no DONE lane ever (unbounded spp), so
wave occupancy is 100% for the whole session -- the idle buckets the
batch engine pays per frame (drain 0.13 + low-spp amortization)
disappear structurally.

Consequences:
  - per-pixel sample counts DIVERGE (cheap sky pixels accumulate
    samples faster than deep-traversal pixels), so the accumulator is
    normalized per pixel by its own completed-sample count -- which is
    also the statistically correct progressive estimate per pixel;
  - frame latency is fixed (iterations x step time), not
    slowest-pixel-bound: the display shows whatever has completed;
  - RNG streams are the absolute (pixel, sample) streams of the batch
    engine (core/rng.py sample_seed), so with a finite ``spp`` cap
    this engine's accumulator is sample-for-sample the SAME SUM the
    batch owner engine produces (tests/test_progressive.py).

Scope: owner schedule + inline shading only (the tick path needs the
cadence machinery; inline is the default everywhere it matters).  The
scene must be tick-free under inline -- no textures, or the texture
tiles fit the unified-table budget (true for every bench scene).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from tryraytrace_tpu.config import RenderConfig, inline_resolved
from tryraytrace_tpu.engine.device_scene import upload_scene
from tryraytrace_tpu.engine.persistent import (
    DONE,
    build_inline_table,
    init_lane_ctx,
    _step,
    _step_pair,
    _step_quad,
)
from tryraytrace_tpu.ops.intersect import LEAF_STRIDE

# Effectively-unbounded per-pixel sample cap: lanes regenerate forever
# (int32 sample counters; a v5e would need ~years to reach it).
UNBOUNDED_SPP = 1 << 30


class ProgressiveRenderer:
    """Persistent-wave progressive renderer with cross-frame state.

    Typical use (the interactive loop)::

        pr = ProgressiveRenderer(arrays, cfg=cfg)
        while running:
            pr.step(cam.get_params(w, h), iters=pr.default_iters)
            accum, spp = pr.snapshot()      # per-pixel sums + counts
            display(accum / np.maximum(spp, 1)[:, None])
            if camera_moved:
                pr.reset()                  # main.cpp:170-173 parity

    ``spp_cap`` bounds samples per pixel (lanes retire at the cap;
    used by the equivalence tests); the default is unbounded.
    ``frame_seed``/``seed_spp`` select the RNG stream schedule
    (core/rng.py sample_seed): the default (0, 1) makes lane sample s
    draw from seed 1984+s -- exactly the reference's frame-s 1-spp
    streams (renderer.cu:326).
    """

    def __init__(self, arrays, cfg: RenderConfig | None = None,
                 width: int | None = None, height: int | None = None,
                 spp_cap: int = UNBOUNDED_SPP, frame_seed: int = 0,
                 seed_spp: int = 1):
        cfg = cfg or RenderConfig()
        if (width is None) != (height is None):
            raise ValueError("width and height must be given together")
        self.cfg = cfg if width is None else cfg.with_size(width, height)
        self.width = self.cfg.width
        self.height = self.cfg.height
        self.spp_cap = int(spp_cap)
        self.frame_seed = int(frame_seed)
        self.seed_spp = int(seed_spp)
        cfg = self.cfg
        if cfg.scheduler != "owner":
            raise ValueError(
                "ProgressiveRenderer supports the owner schedule only "
                f"(got {cfg.scheduler!r}); pool/quota claim pixels from "
                "a finite pool, which contradicts unbounded regeneration")
        if cfg.traversal not in ("threaded", "pair", "quad"):
            raise ValueError(
                f"unsupported traversal {cfg.traversal!r} (fatnode has "
                "no inline-shading step; see config.inline_resolved)")
        if cfg.engine != "persistent":
            raise ValueError("ProgressiveRenderer wraps the persistent "
                             f"engine (cfg.engine={cfg.engine!r})")

        from tryraytrace_tpu.config import quad_select_resolved

        self.scene, self.textures, self.bvh = upload_scene(
            arrays, leaf_size=cfg.bvh_leaf_size,
            method=cfg.bvh_method, traversal=cfg.traversal,
            leaf_fmt=cfg.leaf_isect,
            quad_collapse=cfg.quad_collapse,
            quad_layout=cfg.quad_layout,
            quad_select=quad_select_resolved(cfg))
        if not inline_resolved(self.cfg, self.scene.num_lights):
            raise ValueError(
                "scene/config does not support inline shading "
                "(config.inline_resolved); the progressive engine is "
                "tick-free by construction -- use the batch Renderer")

        scene = self.scene
        self._quad = cfg.traversal == "quad"
        self._pair = cfg.traversal == "pair"
        self._table_attr = ("quad_table" if self._quad
                            else "pair_table" if self._pair
                            else "node_table")
        base_table = getattr(scene, self._table_attr)
        self._sentinel = int(base_table.shape[0])
        if self._sentinel == 0 and scene.trimat.shape[0] > 0:
            raise ValueError(
                f"cfg.traversal={cfg.traversal!r} but the scene was "
                "uploaded without that table (upload_scene(traversal=))")
        self._k = scene.leaf_size
        self._fmt = scene.leaf_fmt
        self._col_ps = 6 + LEAF_STRIDE[self._fmt] * self._k

        # Equal-width chunks covering all pixels: ceil(n/k) lanes each
        # (one compiled program; the last chunk's overhang lanes are
        # born DONE and stay inert).
        n = self.width * self.height
        mw = cfg.max_wave_lanes or n
        n_chunks = max(1, -(-n // mw))
        self._w = -(-n // n_chunks)
        self._n = n
        self._pix = [
            np.minimum(np.arange(c * self._w, (c + 1) * self._w,
                                 dtype=np.int32), n - 1)
            for c in range(n_chunks)
        ]
        self._overhang = n_chunks * self._w - n  # inert lanes, last chunk

        # Tick-free check: probe the unified-table build once.  The
        # probe context is discarded; only tex-presence is kept (it
        # decides the tstash lane state, so it must match the traced
        # build exactly -- same function, same inputs).
        _, probe = self._build_table(
            scene, self.textures,
            jax.tree_util.tree_map(jnp.zeros_like, _dummy_cam()),
            jnp.uint32(0))
        self._with_tstash = probe["tex"] is not None
        if self.textures and probe["tex"] is None:
            raise ValueError(
                "textured scene whose tile rows exceed the unified-"
                "table budget: inline texturing is off, so shading "
                "would need the tick path -- use the batch Renderer")

        self._step_fn = (
            functools.partial(
                _step_quad,
                redirect_passes=max(1, cfg.quad_redirect_passes),
                oct_stride=(scene.quad_oct_stride
                            if scene.quad_layout == "octant" else None),
                select=scene.quad_select)
            if self._quad else _step_pair if self._pair else _step)
        self._unroll = max(1, cfg.step_unroll)
        self._make_programs()
        self.states: list | None = None
        # Host-side iteration total (diagnostics; device carries none).
        self.total_iters = 0

    # -- traced helpers -------------------------------------------------

    def _build_table(self, scene, textures, cam, frame_seed):
        """Unified inline gather table + step ctx (owner schedule)."""
        base_table = getattr(scene, self._table_attr)
        return build_inline_table(
            base_table, self._sentinel, scene, textures, self.cfg, cam,
            frame_seed, jnp.zeros((1,), jnp.int32), self.width,
            self.height, self.spp_cap, 0, self.seed_spp, 1, self._w,
            n_items=0, pool_fn=None)

    def _make_programs(self):
        cfg = self.cfg
        scene_struct = self.scene

        def init(scene, textures, cam, frame_seed, pix, first_done):
            st = init_lane_ctx(
                0, frame_seed, self.seed_spp, 0, pix, cam, self.width,
                self.height, cfg, self._pair, self._quad,
                self._with_tstash)
            # Overhang lanes (duplicated pixel ids past n-1) are born
            # DONE so they never trace or flush.
            st["mode"] = jnp.where(first_done, DONE, st["mode"])
            st.update(
                out=jnp.zeros((pix.shape[0], 3), jnp.float32),
                it=jnp.int32(0),
                n_traced=(first_done.size
                          - first_done.sum()).astype(jnp.float32),
                n_shadow=jnp.float32(0),
            )
            return st

        def run(state, scene, textures, cam, frame_seed, iters):
            table, inline_ctx = self._build_table(scene, textures, cam,
                                                  frame_seed)
            keys = tuple(sorted(state.keys()))
            pack = lambda dd: tuple(dd[kk] for kk in keys)
            unpack = lambda tt: dict(zip(keys, tt))

            svc = cfg.inline_service_steps or self._unroll

            def body(carry):
                s = unpack(carry)
                for u in range(self._unroll):
                    s = self._step_fn(s, table, self._sentinel, self._k,
                                      self._col_ps, inline_ctx,
                                      u % svc == svc - 1, self._fmt)
                s["it"] = s["it"] + 1
                return pack(s)

            def cond(carry):
                s = unpack(carry)
                # Iteration-bounded (fixed latency); with a finite
                # spp_cap the wave may also finish outright.
                return (s["it"] < iters) & jnp.any(s["mode"] != DONE)

            state = dict(state, it=jnp.int32(0))
            return unpack(jax.lax.while_loop(cond, body, pack(state)))

        self._init = jax.jit(init)
        self._run = jax.jit(run, donate_argnums=(0,))

    # -- public API -----------------------------------------------------

    def reset(self):
        """Discard all accumulated state -- the camera-moved reset
        (main.cpp:170-173 parity).  The next step() re-initializes the
        waves with ITS camera, so post-reset frames never mix rays
        from the old pose."""
        self.states = None
        self.total_iters = 0

    def _init_states(self, cam_params):
        fs = jnp.uint32(self.frame_seed)
        self.states = []
        for c, pix in enumerate(self._pix):
            first_done = jnp.asarray(
                np.arange(c * self._w, (c + 1) * self._w) >= self._n)
            self.states.append(self._init(
                self.scene, self.textures, cam_params, fs,
                jnp.asarray(pix), first_done))
        self.total_iters = 0

    def step(self, cam_params, iters: int):
        """Advance every chunk's wave ``iters`` unrolled iterations.
        ``cam_params`` must be constant since the last reset()."""
        self._cam = cam_params
        if self.states is None:
            self._init_states(cam_params)
        fs = jnp.uint32(self.frame_seed)
        it = jnp.int32(iters)
        for c in range(len(self.states)):
            self.states[c] = self._run(self.states[c], self.scene,
                                       self.textures, cam_params, fs, it)
        self.total_iters += int(iters)

    def block_until_ready(self):
        if self.states:
            jax.block_until_ready(self.states[-1]["out"])

    def snapshot(self) -> tuple[np.ndarray, np.ndarray]:
        """-> (accum [n,3] float32, completed-sample counts [n] int32).
        ``accum`` is the sum over completed samples; normalize per
        pixel by ``np.maximum(counts, 1)``."""
        outs, counts = [], []
        for c, st in enumerate(self.states or []):
            o = np.asarray(st["out"])
            s = np.asarray(st["sample"])
            if c == len(self.states) - 1 and self._overhang:
                o = o[:self._w - self._overhang]
                s = s[:self._w - self._overhang]
            outs.append(o)
            counts.append(np.minimum(s, self.spp_cap))
        return np.concatenate(outs), np.concatenate(counts)

    def rays_traced(self) -> float:
        """Total path segments + shadow rays traced since reset()."""
        tot = 0.0
        for st in self.states or []:
            tot += float(st["n_traced"]) + float(st["n_shadow"])
        return tot

    def done(self) -> bool:
        """True when every lane retired (finite spp_cap only)."""
        return all(bool((np.asarray(st["mode"]) == DONE).all())
                   for st in self.states or [])

    _cam = None


def _dummy_cam():
    """Zero camera pytree for the tick-free probe (never traced)."""
    from tryraytrace_tpu.camera.controller import CameraController

    return CameraController().get_params(8, 8)
