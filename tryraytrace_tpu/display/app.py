"""Application loop: the main.cpp analogue.

Reproduces the reference game loop's phase structure (main.cpp:152-223):
  A input -> (camera move? reset accumulation) ->
  B render dispatch (async) ->
  C snapshot + pipeline dispatch (drop-frame) ->
  D display when the worker has produced pixels.

Headless by default (no window; the pipeline still runs so the
overlap behavior is exercised); with pygame installed and
``window=True`` an interactive window opens with the reference's key
bindings.  SIGINT triggers save-and-exit like main.cpp:32-39,224.
"""

from __future__ import annotations

import signal
import time

import numpy as np

from tryraytrace_tpu.camera.controller import CameraController
from tryraytrace_tpu.config import RenderConfig
from tryraytrace_tpu.display.input import InputState, ScriptedInput
from tryraytrace_tpu.display.pipeline import DisplayPipeline
from tryraytrace_tpu.engine.renderer import Renderer
from tryraytrace_tpu.io.snapshot import save_snapshot


class App:
    def __init__(self, arrays, cfg: RenderConfig,
                 camera: CameraController | None = None,
                 input_source=None, window: bool = False,
                 out_dir: str = ".", checkpoint_every: int = 0,
                 checkpoint_path: str | None = None):
        self.cfg = cfg
        self.renderer = Renderer(arrays, cfg=cfg)
        self.camera = camera or CameraController()
        self.pipeline = DisplayPipeline(cfg.width, cfg.height)
        self.out_dir = out_dir
        self.frames_displayed = 0
        self.snapshots: list[str] = []
        self._quit = False
        # Elastic-recovery extension (SURVEY.md section 5): the
        # reference loses all render state on any interruption; a
        # periodic raw-accumulator checkpoint enables exact resume.
        self.checkpoint_every = checkpoint_every
        self.checkpoint_path = checkpoint_path or f"{out_dir}/render_state.npz"

        self._window = None
        if window:
            import pygame

            pygame.init()
            self._pg = pygame
            self._window = pygame.display.set_mode((cfg.width, cfg.height))
            pygame.display.set_caption("tpurt engine")
            from tryraytrace_tpu.display.input import InputManager

            self.input = InputManager()
        else:
            self.input = input_source or ScriptedInput([])

        signal.signal(signal.SIGINT, self._on_sigint)

    def _on_sigint(self, *_):
        self._quit = True  # main loop saves + exits (main.cpp:32-39)

    # -- one loop iteration -------------------------------------------
    def tick(self) -> bool:
        """Run one frame of the game loop; False when the app should
        exit."""
        r = self.renderer
        state: InputState = self.input.process_events(self.camera)

        if state.save_request:
            # Reference quirk preserved: saves the last *displayed*
            # buffer's accumulation state timing-wise; here we save
            # the current device accumulator (strictly fresher).
            self.snapshots.append(self._save())
        if state.quit or self._quit:
            return False
        if state.camera_moved:
            r.reset()  # main.cpp:170-173

        params = self.camera.get_params(self.cfg.width, self.cfg.height)
        t0 = time.perf_counter()
        r.step(params)  # async dispatch (launch_render_kernel analogue)

        # Perf HUD every 10 frames (SURVEY.md section 5 observability:
        # the reference only had the window-title counter,
        # main.cpp:213-218).
        if r.frame % 10 == 0:
            from tryraytrace_tpu.utils.logging import log_event

            # Host-side spp counter: reading device state.spp here
            # would block on the just-dispatched step and stall the
            # async loop whose dispatch latency this line reports.
            host_spp = (r.frame - 1) * (r._step_spp or self.cfg.spp)
            log_event("frame", n=r.frame, spp=host_spp,
                      dispatch_ms=round((time.perf_counter() - t0) * 1e3, 2))

        # Snapshot + drop-frame dispatch (main.cpp:183-198).  The
        # device->host read is the sync point, standing in for
        # cudaDeviceSynchronize at main.cpp:192 -- skipped entirely when
        # the worker is busy, since the frame would be dropped anyway.
        if not self.pipeline.busy():
            accum = r.accum_host()
            self.pipeline.try_dispatch(accum, max(r.spp(), 1))

        if (self.checkpoint_every and
                r.frame % self.checkpoint_every == 0):
            from tryraytrace_tpu.engine.state import save_checkpoint

            save_checkpoint(self.checkpoint_path, r.state, self.cfg.width,
                            self.cfg.height, camera=self.camera,
                            frame_seed=r.frame)

        if self.pipeline.check_frame_ready():
            self.frames_displayed += 1
            if self._window is not None:
                buf = self.pipeline.pixel_buffer.reshape(
                    self.cfg.height, self.cfg.width)
                rgb = np.stack([(buf >> 16) & 0xFF, (buf >> 8) & 0xFF,
                                buf & 0xFF], axis=-1).astype(np.uint8)
                surf = self._pg.surfarray.make_surface(
                    rgb.transpose(1, 0, 2))
                self._window.blit(surf, (0, 0))
                self._pg.display.flip()
                if r.frame % 10 == 0:  # title HUD (main.cpp:213-218)
                    self._pg.display.set_caption(
                        f"Frame: {r.frame} | Focus: "
                        f"{self.camera.focus_dist:.1f} | Aperture: "
                        f"{self.camera.aperture:.1f}")
        return True

    def run(self, max_frames: int | None = None) -> None:
        n = 0
        while self.tick():
            n += 1
            if max_frames is not None and n >= max_frames:
                break
        self.snapshots.append(self._save())  # exit snapshot (main.cpp:224)
        self.pipeline.destroy()
        if self._window is not None:
            self._pg.quit()

    def _save(self) -> str:
        r = self.renderer
        return save_snapshot(
            r.accum_host().reshape(-1, 3), self.cfg.width, self.cfg.height,
            max(r.spp(), 1), self.camera.get_focus_dist(),
            self.camera.get_aperture(), out_dir=self.out_dir)


class ProgressiveApp(App):
    """The game loop over the cross-frame persistent wave
    (engine/progressive.py): phase B advances every chunk's resident
    wave a fixed number of iterations instead of rendering an exact-spp
    batch frame, so no frame ever pays a wave drain and frame latency
    is iteration-bounded.  Per-pixel sample counts diverge (cheap
    pixels converge faster); the display normalizes each pixel by its
    own completed-sample count.

    ``iters_per_frame=0`` (default) adapts the per-frame iteration
    budget so the MEAN per-pixel sample count advances ~1 per displayed
    frame -- the reference's 1-spp-per-frame pacing (main.cpp:181) at
    whatever wall-clock the scene costs.
    """

    def __init__(self, arrays, cfg: RenderConfig,
                 camera: CameraController | None = None,
                 input_source=None, window: bool = False,
                 out_dir: str = ".", iters_per_frame: int = 0):
        from tryraytrace_tpu.engine.progressive import ProgressiveRenderer

        super().__init__(arrays, cfg, camera=camera,
                         input_source=input_source, window=window,
                         out_dir=out_dir)
        # Replace the batch renderer (the base __init__ built one; its
        # upload is reused nowhere -- acceptable startup cost for the
        # shared loop plumbing).
        self.renderer = ProgressiveRenderer(arrays, cfg=cfg)
        self._iters = iters_per_frame
        self._adapt = iters_per_frame <= 0
        if self._adapt:
            self._iters = 16
        self._frame = 1
        self._last_mean = 0.0

    def tick(self) -> bool:
        r = self.renderer
        state: InputState = self.input.process_events(self.camera)

        if state.save_request:
            self.snapshots.append(self._save())
        if state.quit or self._quit:
            return False
        if state.camera_moved:
            r.reset()  # main.cpp:170-173
            self._last_mean = 0.0

        params = self.camera.get_params(self.cfg.width, self.cfg.height)
        t0 = time.perf_counter()
        r.step(params, self._iters)
        self._frame += 1

        if self._frame % 10 == 0:
            from tryraytrace_tpu.utils.logging import log_event

            log_event("frame", n=self._frame,
                      mean_spp=round(self._last_mean, 2),
                      iters=self._iters,
                      dispatch_ms=round((time.perf_counter() - t0) * 1e3,
                                        2))

        if not self.pipeline.busy():
            accum, counts = r.snapshot()
            mean = float(counts.mean())
            if self._adapt and mean > self._last_mean:
                # Aim the next frame's budget at +1 mean sample.
                per_iter = (mean - self._last_mean) / self._iters
                if per_iter > 0:
                    self._iters = int(np.clip(round(1.0 / per_iter),
                                              4, 4096))
            self._last_mean = mean
            img = accum / np.maximum(counts, 1)[:, None]
            self.pipeline.try_dispatch(img, 1)

        if self.pipeline.check_frame_ready():
            self.frames_displayed += 1
            if self._window is not None:
                buf = self.pipeline.pixel_buffer.reshape(
                    self.cfg.height, self.cfg.width)
                rgb = np.stack([(buf >> 16) & 0xFF, (buf >> 8) & 0xFF,
                                buf & 0xFF], axis=-1).astype(np.uint8)
                surf = self._pg.surfarray.make_surface(
                    rgb.transpose(1, 0, 2))
                self._window.blit(surf, (0, 0))
                self._pg.display.flip()
                if self._frame % 10 == 0:
                    self._pg.display.set_caption(
                        f"Frame: {self._frame} | Focus: "
                        f"{self.camera.focus_dist:.1f} | Aperture: "
                        f"{self.camera.aperture:.1f}")
        return True

    def _save(self) -> str:
        r = self.renderer
        if r.states is None:
            accum = np.zeros((self.cfg.width * self.cfg.height, 3),
                             np.float32)
        else:
            acc, counts = r.snapshot()
            accum = acc / np.maximum(counts, 1)[:, None]
        return save_snapshot(
            accum, self.cfg.width, self.cfg.height, 1,
            self.camera.get_focus_dist(), self.camera.get_aperture(),
            out_dir=self.out_dir)
