"""Driver benchmark: teapot.obj at 1920x1080, 16 spp on one chip.

Prints ONE JSON line on stdout:
  {"metric": "...", "value": N, "unit": "Mrays/s", "vs_baseline": N}

The metric is rays traced per second (path rays + NEE shadow rays,
counted exactly by the instrumented render, engine/wavefront.py
frame_ray_stats) over the steady-state frame time.  vs_baseline is
against the 200 Mrays/s/chip north-star target (BASELINE.json) --
the reference publishes no numbers of its own (BASELINE.md).

Usage: python bench.py [--width W] [--height H] [--spp S] [--frames K]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--mesh", default="teapot.obj")
    args = ap.parse_args()

    import jax

    from tryraytrace_tpu.camera.controller import CameraController
    from tryraytrace_tpu.config import RenderConfig
    from tryraytrace_tpu.engine.renderer import Renderer
    from tryraytrace_tpu.engine.wavefront import frame_ray_stats
    from tryraytrace_tpu.scene.assets import checker_texture
    from tryraytrace_tpu.scene.cornell import create_cornell_box
    from tryraytrace_tpu.scene.model import flatten_scene

    log(f"[bench] devices: {jax.devices()}")
    w, h, spp = args.width, args.height, args.spp

    scene = create_cornell_box(mesh=args.mesh)
    arrays = flatten_scene(scene, textures=[checker_texture(256)])
    cfg = RenderConfig(width=w, height=h, spp=spp)

    t0 = time.time()
    r = Renderer(arrays, cfg=cfg)
    log(f"[bench] scene: {arrays.num_objects} tris, BVH {r.bvh.num_nodes} "
        f"nodes, build+upload {time.time() - t0:.2f}s")

    cam = CameraController()
    params = cam.get_params(w, h)

    # Exact ray count for one frame (path + shadow rays).
    stats_fn = jax.jit(frame_ray_stats,
                       static_argnames=("width", "height", "cfg", "spp"))
    tr, sh = stats_fn(r.scene, r.textures, params, 1, width=w, height=h,
                      cfg=cfg, spp=spp)
    rays_per_frame = float(tr) + float(sh)
    log(f"[bench] rays/frame: {rays_per_frame / 1e6:.2f}M "
        f"(path {float(tr) / 1e6:.2f}M + shadow {float(sh) / 1e6:.2f}M; "
        f"{rays_per_frame / (w * h * spp):.2f} rays per primary sample)")

    # Warmup (compile).
    t0 = time.time()
    r.step(params)
    r.block_until_ready()
    log(f"[bench] first frame (compile+run): {time.time() - t0:.2f}s")

    # Steady state.
    t0 = time.time()
    for _ in range(args.frames):
        r.step(params)
    r.block_until_ready()
    dt = (time.time() - t0) / args.frames
    mrays = rays_per_frame / dt / 1e6
    log(f"[bench] steady state: {dt * 1e3:.1f} ms/frame over {args.frames} "
        f"frames -> {mrays:.1f} Mrays/s")

    result = {
        "metric": (f"Mrays/s/chip, {args.mesh} {w}x{h} {spp}spp "
                   f"(path+shadow rays / frame time)"),
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 200.0, 4),
        "ms_per_frame": round(dt * 1e3, 2),
        "rays_per_frame": rays_per_frame,
    }
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
