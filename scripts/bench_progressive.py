"""Sustained-throughput benchmark for the cross-frame progressive
engine (engine/progressive.py) at the headline raster.

The batch headline (bench.py) pays a spill-ladder drain every frame
(idle_done 0.13 of lane-steps, PERFORMANCE.md 2b.3b) because each
frame must retire exactly spp samples.  The progressive engine never
drains -- lanes regenerate into their pixel's next sample forever --
so its sustained Mrays/s bounds what the headline would be with the
drain bucket recovered.  This script measures it: windows of a fixed
iteration budget (calibrated to ~one batch frame's ray volume),
rays counted exactly from the engine's n_traced/n_shadow counters.

Prints one JSON line; run serialized on an idle host (CLAUDE.md).

Usage: python scripts/bench_progressive.py [--width 1920 --height 1080]
           [--windows 5] [--target-mrays 33.2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tryraytrace_tpu.utils.jaxtools import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from tryraytrace_tpu.camera.controller import CameraController  # noqa: E402
from tryraytrace_tpu.config import RenderConfig  # noqa: E402
from tryraytrace_tpu.engine.progressive import ProgressiveRenderer  # noqa: E402
from tryraytrace_tpu.scene.assets import checker_texture  # noqa: E402
from tryraytrace_tpu.scene.cornell import create_cornell_box  # noqa: E402
from tryraytrace_tpu.scene.model import flatten_scene  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--target-mrays", type=float, default=33.2,
                    help="ray volume per timed window (the 16-spp "
                         "batch headline frame traces ~33.2M rays)")
    ap.add_argument("--mesh", default="teapot.obj")
    ap.add_argument("--service-steps", type=int, default=None)
    args = ap.parse_args()

    scene_h = create_cornell_box(mesh=args.mesh)
    arrays = flatten_scene(scene_h, textures=[checker_texture(256)])
    cfg = RenderConfig(width=args.width, height=args.height, spp=1)
    if args.service_steps is not None:
        cfg = cfg.replace(inline_service_steps=args.service_steps)
    pr = ProgressiveRenderer(arrays, cfg=cfg)
    cam = CameraController().get_params(args.width, args.height)

    t0 = time.time()
    pr.step(cam, 4)
    pr.block_until_ready()
    compile_s = time.time() - t0
    print(f"[prog] compile+4 iters: {compile_s:.1f}s "
          f"({len(pr.states)} chunks x {pr._w} lanes)", file=sys.stderr)

    # Calibrate iterations per window from a probe.
    r0 = pr.rays_traced()
    pr.step(cam, 16)
    pr.block_until_ready()
    rays_per_iter = (pr.rays_traced() - r0) / 16.0
    iters = max(1, round(args.target_mrays * 1e6 / rays_per_iter))
    print(f"[prog] {rays_per_iter / 1e6:.3f} Mrays/iter -> {iters} "
          f"iters/window", file=sys.stderr)

    times, rates = [], []
    for wdx in range(args.windows):
        rs = pr.rays_traced()
        t0 = time.time()
        pr.step(cam, iters)
        pr.block_until_ready()
        dt = time.time() - t0
        rw = pr.rays_traced() - rs
        times.append(dt)
        rates.append(rw / dt / 1e6)
        print(f"[prog] window {wdx}: {dt:.2f}s, {rw / 1e6:.1f}M rays, "
              f"{rates[-1]:.2f} Mrays/s", file=sys.stderr)

    best = max(rates)
    srt = sorted(rates)
    median = srt[len(srt) // 2]
    _, counts = pr.snapshot()
    print(json.dumps({
        "metric": (f"sustained Mrays/s/chip, progressive persistent "
                   f"wave, {args.mesh} {args.width}x{args.height}"),
        "value": round(best, 2),
        "median": round(median, 2),
        "window_seconds": [round(t, 2) for t in times],
        "iters_per_window": iters,
        "mean_spp": round(float(counts.mean()), 2),
        "min_spp": int(counts.min()),
        "max_spp": int(counts.max()),
        "compile_seconds": round(compile_s, 1),
        "loadavg": list(os.getloadavg()),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
