"""Background display pipeline: device snapshot -> tonemap -> pixels.

Parity target: the reference's Pipeline (pipeline.h:12-48,
pipeline.cpp:13-164): one worker thread consuming frame-snapshots with
*drop-frame* semantics -- if the worker is still busy when the next
frame is dispatched, that frame is simply never displayed
(pipeline.cpp:122-137), so the render loop never stalls on post-
processing.

TPU-native mapping: the CUDA D2D snapshot + D2H pinned copy become a
``jax.device_get`` of the accumulator (JAX's async dispatch plays the
role of the CUDA stream); the OpenMP average+gamma+pack loop
(pipeline.cpp:59-71) becomes one vectorized tonemap (native C++ when
built, NumPy otherwise).  Synchronization is a single-slot mailbox
guarded by a mutex+condvar, mirroring the reference's worker_busy /
frame_ready flags.
"""

from __future__ import annotations

import threading

import numpy as np

from tryraytrace_tpu.core import vec


def tonemap_to_argb(accum: np.ndarray, frame: int) -> np.ndarray:
    """Average + gamma + pack to 0xAARRGGBB uint32 (pipeline.cpp:59-71)."""
    from tryraytrace_tpu import native

    out = native.tonemap_argb(accum, frame)
    if out is not None:
        return out
    avg = np.asarray(accum, np.float32).reshape(-1, 3) * np.float32(
        1.0 / max(frame, 1))
    rgb = vec.to_int(avg, np).astype(np.uint32)
    return ((np.uint32(255) << 24) | (rgb[:, 0] << 16)
            | (rgb[:, 1] << 8) | rgb[:, 2])


class DisplayPipeline:
    """Single-slot worker pipeline with drop-frame dispatch."""

    def __init__(self, width: int, height: int):
        self.width = width
        self.height = height
        self.pixel_buffer = np.zeros(width * height, np.uint32)
        self._back_buffer = np.zeros(width * height, np.uint32)
        self._mtx = threading.Condition()
        self._task = None          # (accum snapshot, frame) or None
        self._worker_busy = False
        self._frame_ready = False
        self._quit = False
        self._thread = threading.Thread(target=self._worker_loop,
                                        daemon=True)
        self._thread.start()

    # -- producer side (render loop) ------------------------------------
    def try_dispatch(self, accum_snapshot: np.ndarray, frame: int) -> bool:
        """Hand a frame to the worker; False = worker busy, frame dropped
        (pipeline_try_dispatch, pipeline.cpp:122-137)."""
        with self._mtx:
            if self._worker_busy:
                return False
            self._task = (accum_snapshot, frame)
            self._worker_busy = True
            self._mtx.notify()
            return True

    def busy(self) -> bool:
        """True while the worker is processing a frame -- callers can
        skip the (expensive) device snapshot for frames that would be
        dropped anyway."""
        with self._mtx:
            return self._worker_busy

    def check_frame_ready(self) -> bool:
        """True exactly once per completed frame (pipeline.cpp:141-151)."""
        with self._mtx:
            if self._frame_ready:
                self._frame_ready = False
                return True
            return False

    def destroy(self) -> None:
        """Stop and join the worker (pipeline_destroy, pipeline.cpp:155-164)."""
        with self._mtx:
            self._quit = True
            self._mtx.notify()
        self._thread.join(timeout=5.0)

    # -- worker side ------------------------------------------------------
    def _worker_loop(self) -> None:
        while True:
            with self._mtx:
                self._mtx.wait_for(lambda: self._quit or self._worker_busy)
                if self._quit:
                    return
                accum, frame = self._task
                self._task = None
            # Out of the lock: the compute phase (pipeline.cpp:40-71).
            # Tonemap into the back buffer, then publish under the lock
            # so readers never observe a torn frame (an improvement over
            # the reference, which overwrites its display buffer live).
            self._back_buffer[:] = tonemap_to_argb(accum, frame)
            with self._mtx:
                self.pixel_buffer, self._back_buffer = (
                    self._back_buffer, self.pixel_buffer)
                self._frame_ready = True
                self._worker_busy = False
