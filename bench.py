"""Driver benchmark: teapot.obj at 1920x1080, 16 spp on one chip.

Prints ONE JSON line on stdout:
  {"metric": "...", "value": N, "unit": "Mrays/s", "vs_baseline": N}

The metric is rays traced per second (path rays + NEE shadow rays,
counted exactly by the instrumented render) over the steady-state
frame time.  vs_baseline is against the 200 Mrays/s/chip north-star
target (BASELINE.json) -- the reference publishes no numbers of its
own (BASELINE.md).

Exactly ONE program is compiled (the render step with ray counters
folded in): the TPU compile service in this environment can take
minutes per program, so the benchmark is structured around a single
executable and the persistent compilation cache.

Usage: python bench.py [--width W] [--height H] [--spp S] [--frames K]
"""

from __future__ import annotations

import argparse
import functools
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
    ap.add_argument("--engine", default=None, help="persistent | bounce")
    ap.add_argument("--shade-every", type=int, default=None)
    ap.add_argument("--step-unroll", type=int, default=None)
    ap.add_argument("--leaf-size", type=int, default=None)
    ap.add_argument("--bvh", default=None, help="sah | median")
    ap.add_argument("--traversal", default=None,
                    help="threaded | fatnode | pair | quad")
    ap.add_argument("--leaf-isect", default=None, help="mt | bw")
    ap.add_argument("--max-wave", type=int, default=None)
    ap.add_argument("--dual-walk", action=argparse.BooleanOptionalAction,
                    default=None, help="--dual-walk / --no-dual-walk "
                    "(default: config default)")
    ap.add_argument("--inline-shade", action=argparse.BooleanOptionalAction,
                    default=None, help="--inline-shade / --no-inline-shade "
                    "(default: config default)")
    ap.add_argument("--inline-tex", action=argparse.BooleanOptionalAction,
                    default=None, help="--inline-tex / --no-inline-tex "
                    "(default: config default = auto)")
    ap.add_argument("--scheduler", default=None, help="owner | pool | quota")
    ap.add_argument("--spill-stages", type=int, default=None,
                    help="compaction-ladder depth (config default: 4)")
    ap.add_argument("--c-isect", type=float, default=0.4,
                    help="SAH intersection cost (cost-model sweeps)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tryraytrace_tpu.camera.controller import CameraController
    from tryraytrace_tpu.config import RenderConfig
    from tryraytrace_tpu.engine.device_scene import upload_scene
    from tryraytrace_tpu.engine.wavefront import render_frame
    from tryraytrace_tpu.scene.assets import checker_texture
    from tryraytrace_tpu.scene.cornell import create_cornell_box
    from tryraytrace_tpu.scene.model import flatten_scene
    from tryraytrace_tpu.utils.jaxtools import enable_compilation_cache

    enable_compilation_cache()
    log(f"[bench] devices: {jax.devices()}")
    w, h, spp = args.width, args.height, args.spp

    scene_h = create_cornell_box(mesh=args.mesh)
    arrays = flatten_scene(scene_h, textures=[checker_texture(256)])
    cfg = RenderConfig(width=w, height=h, spp=spp)
    if args.engine:
        cfg = cfg.replace(engine=args.engine)
    if args.shade_every:
        cfg = cfg.replace(shade_every=args.shade_every)
    if args.step_unroll:
        cfg = cfg.replace(step_unroll=args.step_unroll)
    if args.leaf_size:
        cfg = cfg.replace(bvh_leaf_size=args.leaf_size)
    if args.bvh:
        cfg = cfg.replace(bvh_method=args.bvh)
    if args.traversal:
        cfg = cfg.replace(traversal=args.traversal)
    if args.leaf_isect:
        cfg = cfg.replace(leaf_isect=args.leaf_isect)
    if args.max_wave is not None:
        cfg = cfg.replace(max_wave_lanes=args.max_wave)
    if args.dual_walk is not None:
        cfg = cfg.replace(dual_walk=args.dual_walk)
    if args.inline_shade is not None:
        cfg = cfg.replace(inline_shade=args.inline_shade)
    if args.inline_tex is not None:
        cfg = cfg.replace(inline_tex=args.inline_tex)
    if args.scheduler:
        cfg = cfg.replace(scheduler=args.scheduler)
    if args.spill_stages is not None:
        cfg = cfg.replace(spill_stages=args.spill_stages)

    t0 = time.time()
    scene, textures, bvh = upload_scene(arrays, leaf_size=cfg.bvh_leaf_size,
                                        method=cfg.bvh_method,
                                        traversal=cfg.traversal,
                                        c_isect=args.c_isect,
                                        leaf_fmt=cfg.leaf_isect)
    if cfg.shade_every < 1:
        from tryraytrace_tpu.config import inline_resolved
        from tryraytrace_tpu.engine.device_scene import auto_shade_every

        cfg = cfg.replace(shade_every=auto_shade_every(
            bvh, arrays, cfg.step_unroll,
            inline=inline_resolved(cfg, scene.num_lights)))
    log(f"[bench] scene: {arrays.num_objects} tris, BVH {bvh.num_nodes} "
        f"nodes ({cfg.bvh_method}), shade_every {cfg.shade_every}, "
        f"build+upload {time.time() - t0:.2f}s")

    cam = CameraController().get_params(w, h)

    @functools.partial(jax.jit, donate_argnames=("accum",))
    def step(accum, frame_seed):
        """One frame: spp samples accumulated, with exact ray counts."""
        rad, (tr, sh) = render_frame(scene, textures, cam, frame_seed,
                                     w, h, cfg, spp=spp, with_stats=True)
        return accum + rad, tr, sh

    accum = jnp.zeros((w * h, 3), jnp.float32)
    t0 = time.time()
    accum, tr, sh = step(accum, jnp.uint32(1))
    jax.block_until_ready(accum)
    compile_s = time.time() - t0
    rays_per_frame = float(tr) + float(sh)
    log(f"[bench] first frame (compile+run): {compile_s:.1f}s; rays/frame "
        f"{rays_per_frame / 1e6:.2f}M (path {float(tr) / 1e6:.2f}M + "
        f"shadow {float(sh) / 1e6:.2f}M; "
        f"{rays_per_frame / (w * h * spp):.2f} per primary sample)")

    # Adaptive frame count: at 1080p a frame can take minutes; one
    # timed frame is enough for a stable number there, while fast
    # configs average over the requested count.
    t0 = time.time()
    accum, tr, sh = step(accum, jnp.uint32(2))
    jax.block_until_ready(accum)
    first_dt = time.time() - t0
    frames = 1 if first_dt > 60.0 else args.frames
    if frames > 1:
        t0 = time.time()
        for f in range(frames - 1):
            accum, tr, sh = step(accum, jnp.uint32(3 + f))
        jax.block_until_ready(accum)
        dt = (first_dt + time.time() - t0) / frames
    else:
        dt = first_dt
    mrays = rays_per_frame / dt / 1e6
    log(f"[bench] steady state: {dt * 1e3:.1f} ms/frame over "
        f"{args.frames} frames -> {mrays:.2f} Mrays/s")

    # Two decimals for real runs; tiny smoke configs (CPU, 16x12) fall
    # below 0.005 Mrays/s and must not round to a lying 0.0.
    value = round(mrays, 2) if mrays >= 0.05 else float(f"{mrays:.2g}")
    result = {
        "metric": (f"Mrays/s/chip, {args.mesh} {w}x{h} {spp}spp "
                   f"(path+shadow rays / frame time, engine="
                   f"{cfg.engine})"),
        "value": value,
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 200.0, 4),
        "ms_per_frame": round(dt * 1e3, 2),
        "rays_per_frame": rays_per_frame,
        "compile_seconds": round(compile_s, 1),
    }
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
