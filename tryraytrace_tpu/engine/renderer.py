"""High-level progressive renderer.

The analogue of the reference's two-function renderer API
(renderer.h:35-57: ``init_scene_data`` + ``launch_render_kernel``)
plus the main loop's buffer/accumulation management (main.cpp:110-222):

  - construction = scene upload (BVH build, SoA flatten, device_put);
  - ``step(cam)`` = one progressive pass: jitted render + accumulate
    (the accumulator is donated, so it updates in place on device);
  - ``reset()`` on camera move;
  - ``image()`` / ``accum_host()`` for display/snapshot.

Dispatch is async exactly like the CUDA launch: ``step`` returns as
soon as XLA enqueues the computation; only host reads synchronize.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from tryraytrace_tpu.config import DEFAULT_CONFIG, RenderConfig
from tryraytrace_tpu.engine.device_scene import upload_scene
from tryraytrace_tpu.engine.state import RenderState
from tryraytrace_tpu.engine.wavefront import render_frame
from tryraytrace_tpu.io.snapshot import tonemap_accum
from tryraytrace_tpu.scene.model import Scene, SceneArrays, flatten_scene
from tryraytrace_tpu.utils.jaxtools import enable_compilation_cache

enable_compilation_cache()


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "cfg", "spp"),
    donate_argnames=("state",),
)
def _render_step(scene, textures, cam, state, frame_seed, *,
                 width, height, cfg, spp):
    acc = render_frame(scene, textures, cam, frame_seed, width, height,
                       cfg, spp=spp)
    return RenderState(state.accum + acc, state.spp + spp)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "cfg", "spp"))
def _render_tile(scene, textures, cam, pixel_idx, frame_seed, *,
                 width, height, cfg, spp):
    return render_frame(scene, textures, cam, frame_seed, width, height,
                        cfg, spp=spp, pixel_idx=pixel_idx)


class Renderer:
    """Progressive wavefront renderer bound to one scene + resolution."""

    def __init__(self, scene, width: int | None = None,
                 height: int | None = None,
                 cfg: RenderConfig = DEFAULT_CONFIG,
                 textures=None):
        if isinstance(scene, Scene):
            arrays = flatten_scene(scene, textures=textures,
                                   light_scan_threshold=cfg.light_scan_threshold)
        elif isinstance(scene, SceneArrays):
            arrays = scene
        else:
            raise TypeError(f"unsupported scene type {type(scene)}")
        if (width is None) != (height is None):
            raise ValueError("width and height must be given together")
        self.cfg = cfg if width is None else cfg.with_size(width, height)
        self.width = self.cfg.width
        self.height = self.cfg.height
        from tryraytrace_tpu.config import quad_select_resolved

        self.scene, self.textures, self.bvh = upload_scene(
            arrays, leaf_size=self.cfg.bvh_leaf_size,
            method=self.cfg.bvh_method, traversal=self.cfg.traversal,
            leaf_fmt=self.cfg.leaf_isect,
            quad_collapse=self.cfg.quad_collapse,
            quad_layout=self.cfg.quad_layout,
            quad_select=quad_select_resolved(self.cfg))
        if self.cfg.shade_every < 1:
            from tryraytrace_tpu.config import inline_resolved
            from tryraytrace_tpu.engine.device_scene import auto_shade_every

            self.cfg = self.cfg.replace(shade_every=auto_shade_every(
                self.bvh, arrays, self.cfg.step_unroll,
                inline=inline_resolved(self.cfg, self.scene.num_lights)))
        self.state = RenderState.zeros(self.width * self.height)
        self.frame = 1  # gpu_frame counter parity (main.cpp:149)
        self._step_spp = None

    # -- rendering -----------------------------------------------------
    def step(self, cam, spp: int | None = None) -> None:
        """One progressive pass (launch_render_kernel analogue)."""
        spp = self.cfg.spp if spp is None else spp
        # The seed schedule 1984 + frame*spp + sample (core/rng.py) is
        # collision-free only at constant spp; a mid-accumulation spp
        # change would silently reuse earlier sample streams.
        if self._step_spp is not None and spp != self._step_spp:
            raise ValueError(
                f"spp changed {self._step_spp} -> {spp} mid-accumulation; "
                "call reset() first (RNG streams would alias)")
        self._step_spp = spp
        self.state = _render_step(
            self.scene, self.textures, cam, self.state,
            jnp.uint32(self.frame), width=self.width, height=self.height,
            cfg=self.cfg, spp=spp,
        )
        self.frame += 1

    def step_tiled(self, cam, tiles: int, spp: int | None = None) -> None:
        """One progressive pass rendered as ``tiles`` sequential
        pixel-strip dispatches instead of a single device call.

        Sample-identical to ``step``: the RNG is keyed by absolute
        (pixel, sample) (core/rng.py), so tiling cannot change which
        samples are drawn -- renders are bit-identical at practical
        tile widths and within the engines' 1-ULP XLA fusion-drift
        budget at degenerate (few-pixel) widths
        (tests/test_tiled.py).  Each dispatch touches only ~1/tiles
        of the frame:
        this bounds per-call device time and working set, which is how
        >4K frames stay under the sandbox TPU's ~10s-per-call limit
        (CLAUDE.md) -- streamed rendering the reference's one-launch
        kernel (renderer.cu:764-770) has no counterpart for.
        """
        spp = self.cfg.spp if spp is None else spp
        if self._step_spp is not None and spp != self._step_spp:
            raise ValueError(
                f"spp changed {self._step_spp} -> {spp} mid-accumulation; "
                "call reset() first (RNG streams would alias)")
        self._step_spp = spp
        n = self.width * self.height
        tiles = max(1, min(int(tiles), n))
        span = -(-n // tiles)
        accum = self.state.accum
        for k in range(tiles):
            s = k * span
            if s >= n:
                break
            e = min(s + span, n)
            # Static tile width: the tail tile clamps (duplicate lanes
            # render pixel n-1 again and are sliced off).
            idx = jnp.minimum(jnp.arange(s, s + span, dtype=jnp.int32),
                              n - 1)
            part = _render_tile(
                self.scene, self.textures, cam, idx,
                jnp.uint32(self.frame), width=self.width,
                height=self.height, cfg=self.cfg, spp=spp)
            accum = accum.at[s:e].add(part[: e - s])
        self.state = RenderState(accum, self.state.spp + spp)
        self.frame += 1

    def reset(self) -> None:
        """Camera moved: restart accumulation (main.cpp:170-173)."""
        self.state = self.state.reset()
        self.frame = 1
        self._step_spp = None

    def refit(self, scene, textures=None) -> None:
        """Animated geometry: re-upload deformed vertices/materials
        (same topology and light set) via a BVH refit instead of a
        rebuild, then restart accumulation.  Beyond-reference: the
        reference uploads the scene exactly once (renderer.cu:134-184)
        and cannot animate geometry at all.  All array shapes and
        static fields are preserved, so the jitted step is NOT
        recompiled."""
        from tryraytrace_tpu.engine.device_scene import refit_scene

        if isinstance(scene, Scene):
            arrays = flatten_scene(
                scene, textures=textures,
                light_scan_threshold=self.cfg.light_scan_threshold)
        else:
            arrays = scene
        # Original-order count (the SBVH perm is surjective: slot count
        # can exceed the original count via duplicated references).
        n_orig = (int(self.bvh.perm.max()) + 1 if self.bvh.perm.size
                  else self.scene.num_objects)
        if arrays.num_objects != n_orig:
            raise ValueError(
                f"refit needs identical topology: {arrays.num_objects} "
                f"objects vs {n_orig} at upload "
                "(rebuild with a new Renderer instead)")
        self.scene, self.bvh = refit_scene(self.scene, self.bvh, arrays)
        self.reset()

    # -- readback ------------------------------------------------------
    def accum_host(self) -> np.ndarray:
        """Blocking device->host accumulator read, [H, W, 3] f32."""
        return np.asarray(self.state.accum).reshape(self.height, self.width, 3)

    def spp(self) -> int:
        return int(self.state.spp)

    def image(self, on_device: bool | None = None) -> np.ndarray:
        """Tonemapped uint8 [H, W, 3] of the current accumulation.

        ``on_device=True`` runs the Pallas tonemap kernel on the TPU so
        only uint8 pixels are transferred (ops/pallas_tonemap.py);
        default: device path on TPU, host path elsewhere.
        """
        if on_device is None:
            on_device = jax.devices()[0].platform not in ("cpu",)
        if on_device:
            from tryraytrace_tpu.ops.pallas_tonemap import tonemap_image

            img = tonemap_image(self.state.accum,
                                jnp.maximum(self.state.spp, 1))
            return np.asarray(img).reshape(self.height, self.width, 3)
        return tonemap_accum(self.accum_host(), max(self.spp(), 1))

    def block_until_ready(self) -> None:
        jax.block_until_ready(self.state.accum)
