"""Snapshot writer: accumulator -> tonemapped P6 file.

Parity target: save_snapshot (reference image_io.cpp:17-92): create
``logs/``, build a ``YYYY-MM-DD_HH-MM-SS_Frame<N>_F<focus>_A<aperture>.ppm``
filename, average the accumulator by the frame count, gamma-quantize
(the OpenMP loop becomes one vectorized op), and write binary P6.
"""

from __future__ import annotations

import sys

import os
import time

import numpy as np

from tryraytrace_tpu.core import vec
from tryraytrace_tpu.io.ppm import save_ppm


def tonemap_accum(h_accum: np.ndarray, frame: int) -> np.ndarray:
    """Average by sample count + gamma quantize -> uint8 [H, W, 3].

    Mirrors the per-pixel loop at image_io.cpp:53-68.
    """
    avg = np.asarray(h_accum, dtype=np.float32) * np.float32(1.0 / max(frame, 1))
    return vec.to_int(avg, np).astype(np.uint8)


def snapshot_filename(frame: int, focus_dist: float, aperture: float,
                      when: float | None = None) -> str:
    t = time.localtime(when if when is not None else time.time())
    time_str = time.strftime("%Y-%m-%d_%H-%M-%S", t)
    # Format string parity with image_io.cpp:38-39 (focus %.1f, aperture %.2f).
    return f"logs/{time_str}_Frame{frame}_F{focus_dist:.1f}_A{aperture:.2f}.ppm"


def save_snapshot(h_accum: np.ndarray, w: int, h: int, frame: int,
                  focus_dist: float, aperture: float,
                  out_dir: str = ".") -> str:
    """Write the tonemapped accumulator to logs/; returns the path."""
    img = tonemap_accum(np.asarray(h_accum).reshape(h, w, 3), frame)
    rel = snapshot_filename(frame, focus_dist, aperture)
    path = os.path.join(out_dir, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_ppm(path, img)
    print(f"[IO] Snapshot saved: {path}", file=sys.stderr)
    return path
