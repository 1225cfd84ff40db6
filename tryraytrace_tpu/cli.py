"""Command-line interface: ``tpurt render | interactive | bench | info``.

The reference has no CLI at all (main.cpp ignores argv; everything is
a compile-time constant).  These commands drive the same phases as
main.cpp -- scene -> BVH -> upload -> progressive loop -> snapshot --
with the reference's constants as defaults (SURVEY.md section 5,
config system), plus checkpoint/resume which the reference lacks.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

from tryraytrace_tpu.config import RenderConfig


def _add_scene_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--scene", default="cornell",
                   help="cornell | cornell-nomesh | empty")
    p.add_argument("--obj", action="append", default=[],
                   help="extra mesh: path[:scale[:ox,oy,oz]] (repeatable)")
    p.add_argument("--width", type=int, default=1200)   # main.cpp:49
    p.add_argument("--height", type=int, default=800)   # main.cpp:50
    p.add_argument("--spp", type=int, default=1)
    p.add_argument("--max-depth", type=int, default=30)
    p.add_argument("--aperture", type=float, default=0.0)
    p.add_argument("--focus", type=float, default=240.0)
    p.add_argument("--engine", default=None,
                   help="persistent | bounce (default: config)")
    p.add_argument("--leaf-isect", default=None,
                   help="leaf intersection format: mt | bw")
    p.add_argument("--traversal", default=None,
                   help="threaded | fatnode | pair | quad (default: config)")
    p.add_argument("--scheduler", default=None,
                   help="owner | pool | quota (default: config)")
    p.add_argument("--smooth", action="store_true",
                   help="smooth shading from computed vertex normals "
                        "(beyond-reference; engines agree to ULP, rare "
                        "RNG branch flips possible across programs)")
    p.add_argument("--bvh-method", default=None,
                   help="sah | median | sbvh (default: config)")
    p.add_argument("--uv", action="store_true",
                   help="UV texture mapping: parse OBJ vt/slash faces "
                        "(the reference skips them) and sample textures "
                        "at interpolated per-vertex UVs; --obj entries "
                        "get texture slot 0 when UVs are present")


def build_scene_arrays(args):
    from tryraytrace_tpu.scene.assets import checker_texture, find_asset
    from tryraytrace_tpu.scene.cornell import create_cornell_box
    from tryraytrace_tpu.scene.model import Scene, flatten_scene
    from tryraytrace_tpu.scene.objloader import load_obj

    if args.scene == "cornell":
        scene = create_cornell_box()
    elif args.scene == "cornell-nomesh":
        scene = create_cornell_box(mesh=None)
    elif args.scene == "empty":
        scene = Scene()
    else:
        raise SystemExit(f"unknown scene {args.scene!r}")

    for spec in args.obj:
        parts = spec.split(":")
        path = find_asset(parts[0]) or parts[0]
        scale = float(parts[1]) if len(parts) > 1 else 1.0
        offset = (tuple(float(x) for x in parts[2].split(","))
                  if len(parts) > 2 else (0.0, 0.0, 0.0))
        if getattr(args, "uv", False):
            before = len(scene.objects)
            load_obj(path, scene.objects, offset=offset, scale=scale,
                     parse_uv=True,
                     tex_id=0 if scene.texture_files else -1)
            # Meshes that came back without any UVs stay untextured.
            if not any(o.uv0 is not None
                       for o in scene.objects[before:]):
                for o in scene.objects[before:]:
                    o.tex_id = -1
        else:
            load_obj(path, scene.objects, offset=offset, scale=scale)

    # earth.ppm is absent from the reference mount; substitute the
    # checker stand-in so tex_id 0 renders (SURVEY.md section 0).
    textures = None
    if scene.texture_files:
        from tryraytrace_tpu.scene.assets import find_asset as fa

        textures = []
        for f in scene.texture_files:
            p = fa(f.split("/")[-1])
            if p is not None:
                from tryraytrace_tpu.io.ppm import load_ppm

                textures.append(load_ppm(p).astype(np.float32) / 255.0)
            else:
                textures.append(checker_texture(256))
    return flatten_scene(scene, textures=textures)


def _make_renderer(args, arrays, cfg):
    """Single-chip Renderer, or ShardedRenderer over the (dp, sp) mesh
    of ALL devices -- every process's, once init_distributed ran."""
    if not (args.coordinator or args.sharded):
        from tryraytrace_tpu.engine.renderer import Renderer

        return Renderer(arrays, cfg=cfg)
    from tryraytrace_tpu.parallel.mesh import make_mesh
    from tryraytrace_tpu.parallel.shard import ShardedRenderer

    mesh = make_mesh(tile=args.mesh_tile, sample=args.mesh_sample)
    return ShardedRenderer(arrays, cfg, mesh=mesh)


def cmd_render(args) -> int:
    # Multi-process init must precede every other JAX call.
    if args.coordinator:
        from tryraytrace_tpu.parallel.distributed import init_distributed

        init_distributed(args.coordinator, args.num_processes,
                         args.process_id,
                         cpu_devices_per_process=args.cpu_devices)

    from tryraytrace_tpu.camera.controller import CameraController
    from tryraytrace_tpu.engine.renderer import Renderer
    from tryraytrace_tpu.engine.state import load_checkpoint, save_checkpoint
    from tryraytrace_tpu.io.ppm import save_image
    from tryraytrace_tpu.io.snapshot import tonemap_accum
    from tryraytrace_tpu.utils.logging import log_event
    from tryraytrace_tpu.utils.profiling import PhaseTimer

    timer = PhaseTimer()
    cfg = _cfg_from_args(args)
    with timer.phase("build+upload"):
        arrays = build_scene_arrays(args)
        r = _make_renderer(args, arrays, cfg)
    cam = CameraController()
    cam.aperture = args.aperture
    cam.focus_dist = args.focus

    if args.resume:
        state, w, h, frame_seed, saved_cam = load_checkpoint(args.resume)
        if (w, h) != (cfg.width, cfg.height):
            raise SystemExit(f"checkpoint is {w}x{h}, requested "
                             f"{cfg.width}x{cfg.height}")
        import jax

        # Keep the renderer's shardings (a ShardedRenderer state is
        # dp-sharded).  device_put handles fully-addressable shardings
        # (single process); on a multi-host mesh each process supplies
        # its addressable shards from the (replicated) host checkpoint
        # via make_array_from_callback.
        shardings = jax.tree.map(lambda x: x.sharding, r.state)
        if jax.process_count() > 1:
            r.state = jax.tree.map(
                lambda arr, sh: jax.make_array_from_callback(
                    np.asarray(arr).shape, sh,
                    lambda idx, a=arr: np.asarray(a)[idx]),
                state, shardings)
        else:
            r.state = jax.device_put(state, shardings)
        r.frame = frame_seed
        if saved_cam is not None:
            cam = saved_cam
        log_event("resume", path=args.resume, spp=r.spp())

    params = cam.get_params(cfg.width, cfg.height)
    t0 = time.time()
    tiles = getattr(args, "tiles", 0) or 0
    with timer.phase("render"):
        for _ in range(args.frames):
            if tiles > 1 and hasattr(r, "step_tiled"):
                r.step_tiled(params, tiles)
            else:
                r.step(params)
        r.block_until_ready()
    dt = time.time() - t0
    log_event("render_done", frames=args.frames, spp=r.spp(),
              ms_per_frame=round(dt / args.frames * 1e3, 2))

    # Every process participates in the accumulator gather (it is a
    # collective on a multi-host mesh); only process 0 touches disk.
    from tryraytrace_tpu.engine.state import RenderState
    from tryraytrace_tpu.parallel.distributed import gather_accum_host

    accum = gather_accum_host(r.state.accum)
    import jax

    if jax.process_index() == 0:
        if args.checkpoint:
            host_state = RenderState(accum, r.state.spp)
            save_checkpoint(args.checkpoint, host_state, cfg.width,
                            cfg.height, camera=cam, frame_seed=r.frame)
            log_event("checkpoint_saved", path=args.checkpoint)

        with timer.phase("tonemap+write"):
            img = tonemap_accum(
                accum.reshape(cfg.height, cfg.width, 3), max(r.spp(), 1))
            save_image(args.out, img)
        print(f"[tpurt] wrote {args.out} ({cfg.width}x{cfg.height}, "
              f"{r.spp()} spp, {dt:.2f}s)")
    print(timer.summary(), file=sys.stderr)
    return 0


def _cfg_from_args(args) -> RenderConfig:
    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_depth=args.max_depth)
    if getattr(args, "engine", None):
        cfg = cfg.replace(engine=args.engine)
    if getattr(args, "traversal", None):
        cfg = cfg.replace(traversal=args.traversal)
    if getattr(args, "leaf_isect", None):
        cfg = cfg.replace(leaf_isect=args.leaf_isect)
    if getattr(args, "scheduler", None):
        cfg = cfg.replace(scheduler=args.scheduler)
    if getattr(args, "smooth", False):
        cfg = cfg.replace(smooth_shading=True)
    if getattr(args, "uv", False):
        cfg = cfg.replace(uv_mapping=True)
    if getattr(args, "bvh_method", None):
        cfg = cfg.replace(bvh_method=args.bvh_method)
    return cfg


def cmd_interactive(args) -> int:
    from tryraytrace_tpu.display.app import App, ProgressiveApp
    from tryraytrace_tpu.display.input import ScriptedInput

    cfg = _cfg_from_args(args)
    arrays = build_scene_arrays(args)
    window = not args.headless
    if window:
        try:
            import pygame  # noqa: F401
        except ImportError:
            print("[tpurt] pygame not available; running headless")
            window = False
    script = None
    if args.script:
        with open(args.script) as f:
            script = ScriptedInput(json.load(f))
    if getattr(args, "progressive", False):
        # Cross-frame persistent wave (engine/progressive.py): no
        # per-frame drain, per-pixel progressive accumulation.
        app = ProgressiveApp(arrays, cfg, input_source=script,
                             window=window, out_dir=args.out_dir)
    else:
        app = App(arrays, cfg, input_source=script, window=window,
                  out_dir=args.out_dir,
                  checkpoint_every=args.checkpoint_every)
    app.run(max_frames=args.frames)
    print(f"[tpurt] displayed {app.frames_displayed} frames; "
          f"snapshots: {app.snapshots}")
    return 0


def cmd_bench(args) -> int:
    if args.config:
        from tryraytrace_tpu.benchmarks import CONFIGS, run_config

        names = CONFIGS if args.config == "all" else [args.config]
        cfg_kw = {}
        if args.leaf_size is not None:
            cfg_kw["bvh_leaf_size"] = args.leaf_size
        if getattr(args, "traversal", None):
            cfg_kw["traversal"] = args.traversal
        if getattr(args, "leaf_isect", None):
            cfg_kw["leaf_isect"] = args.leaf_isect
        if getattr(args, "scheduler", None):
            cfg_kw["scheduler"] = args.scheduler
        cfg_kw = cfg_kw or None
        for name in names:
            print(json.dumps(run_config(name, frames=args.frames,
                                        cfg_kw=cfg_kw)),
                  flush=True)
        return 0
    import bench as bench_mod  # repo-root bench.py is the harness

    sys.argv = ["bench.py",
                "--width", str(args.width), "--height", str(args.height),
                "--spp", str(args.spp), "--frames", str(args.frames)]
    return bench_mod.main()


def cmd_info(args) -> int:
    import jax

    print(f"jax {jax.__version__}; devices: {jax.devices()}")
    arrays = build_scene_arrays(args)
    from tryraytrace_tpu.accel.bvh import build_bvh

    bvh = build_bvh(arrays.tri_v0, arrays.tri_v1, arrays.tri_v2,
                    leaf_size=8)
    print(f"scene: {arrays.num_objects} triangles, "
          f"{arrays.num_lights} lights, {len(arrays.textures)} textures")
    print(f"bvh: {bvh.num_nodes} nodes, depth {bvh.max_depth()}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tpurt")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("render", help="offline progressive render -> PPM")
    _add_scene_args(p)
    p.add_argument("--frames", type=int, default=16,
                   help="progressive passes (each adds --spp samples)")
    p.add_argument("--out", default="out.ppm")
    p.add_argument("--checkpoint", default=None,
                   help="save accumulator+camera after rendering "
                        "(*.npz = NumPy archive, else Orbax directory)")
    p.add_argument("--resume", default=None,
                   help="resume from a checkpoint (.npz or Orbax dir)")
    p.add_argument("--tiles", type=int, default=0,
                   help="render each pass as N sequential pixel-strip "
                        "dispatches (bit-identical; bounds per-call "
                        "device time for >4K frames)")
    p.add_argument("--sharded", action="store_true",
                   help="render over a (dp, sp) mesh of all devices")
    p.add_argument("--mesh-tile", type=int, default=None,
                   help="dp (pixel-tile) mesh extent; default all devices")
    p.add_argument("--mesh-sample", type=int, default=None,
                   help="sp (sample-parallel) mesh extent; default 1")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="multi-host: jax.distributed coordinator address "
                        "(run the same command on every host)")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--cpu-devices", type=int, default=None,
                   help="multi-host smoke testing: force the CPU "
                        "platform with N devices per process")
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser("interactive", help="windowed/headless game loop")
    _add_scene_args(p)
    p.add_argument("--frames", type=int, default=None)
    p.add_argument("--headless", action="store_true")
    p.add_argument("--script", default=None,
                   help="JSON input script (see display/input.py)")
    p.add_argument("--out-dir", default=".")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="autosave render state every N frames (0 = off)")
    p.add_argument("--progressive", action="store_true",
                   help="cross-frame persistent wave: no per-frame "
                        "drain, per-pixel progressive sample counts "
                        "(engine/progressive.py)")
    p.set_defaults(fn=cmd_interactive)

    p = sub.add_parser("bench", help="performance benchmark (JSON line)")
    _add_scene_args(p)
    p.add_argument("--frames", type=int, default=3)
    p.add_argument("--config", default=None,
                   help="BASELINE.json config: cube256 | teapot512 | "
                        "cow800 | teddy1024 | flythrough1080 | all")
    p.add_argument("--leaf-size", type=int, default=None,
                   help="BVH fat-leaf size (0 = auto under the 3 MB "
                        "gather knee; default: RenderConfig default)")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("info", help="device + scene info")
    _add_scene_args(p)
    p.set_defaults(fn=cmd_info)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
