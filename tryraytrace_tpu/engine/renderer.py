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
        self.scene, self.textures, self.bvh = upload_scene(
            arrays, leaf_size=self.cfg.bvh_leaf_size,
            method=self.cfg.bvh_method, traversal=self.cfg.traversal)
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

    def reset(self) -> None:
        """Camera moved: restart accumulation (main.cpp:170-173)."""
        self.state = self.state.reset()
        self.frame = 1
        self._step_spp = None

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
