"""The five measurement configs from BASELINE.json, runnable
individually (``tpurt bench --config <name>``) or all together.

Each config returns a JSON-able dict with Mrays/s, ms/frame, and (for
the small configs where the NumPy oracle is tractable) the MSE vs the
oracle -- the acceptance metric.
"""

from __future__ import annotations

import sys

import time

from tryraytrace_tpu.config import RenderConfig
from tryraytrace_tpu.scene.assets import checker_texture, cube_mesh, find_asset
from tryraytrace_tpu.scene.cornell import create_cornell_box
from tryraytrace_tpu.scene.model import Object, Scene, flatten_scene
from tryraytrace_tpu.scene.objloader import load_obj

CONFIGS = ("cube256", "teapot512", "cow800", "teddy1024",
           "flythrough1080", "interactive")


def _cornell_with(meshes: list[tuple[str, float, tuple]],
                  texture_size: int = 256) -> Scene:
    scene = create_cornell_box(mesh=None)
    for name, scale, offset in meshes:
        path = find_asset(name)
        if path is not None:
            load_obj(path, scene.objects, offset=offset, scale=scale,
                     albedo=(0.75, 0.75, 0.75), metallic=0.0, roughness=1.0)
        else:
            print(f"[bench] asset {name} missing; substituting cube", file=sys.stderr)
            v0, v1, v2 = cube_mesh(scale)
            for a, b, c in zip(v0 + offset, v1 + offset, v2 + offset):
                scene.objects.append(Object(v0=tuple(a), v1=tuple(b),
                                            v2=tuple(c),
                                            albedo=(0.75, 0.75, 0.75),
                                            roughness=1.0))
    return scene


def build_config(name: str):
    """-> (SceneArrays, width, height, spp, check_oracle)."""
    if name == "cube256":
        scene = _cornell_with([("cube.obj", 15.0, (50.0, 20.0, 50.0))])
        return flatten_scene(scene, textures=[checker_texture(64)]), \
            256, 256, 1, True
    if name == "teapot512":
        scene = _cornell_with([("teapot.obj", 10.0, (50.0, 10.0, 50.0))])
        return flatten_scene(scene, textures=[checker_texture(128)]), \
            512, 512, 4, False
    if name == "cow800":
        scene = _cornell_with([("cow.obj", 10.0, (50.0, 30.0, 50.0))])
        return flatten_scene(scene, textures=[checker_texture(256)]), \
            800, 600, 16, False
    if name == "teddy1024":
        scene = _cornell_with([
            ("teddy.obj", 1.5, (30.0, 35.0, 60.0)),
            ("pumpkin.obj", 0.12, (70.0, 0.0, 60.0)),
        ])
        return flatten_scene(scene, textures=[checker_texture(128)]), \
            1024, 1024, 64, False
    if name == "interactive":
        # The reference's implied dev operating point: 1200x800 window,
        # 1 spp per frame, progressive accumulation with drop-frame
        # display (/root/reference/src/main.cpp:49-50,181).  Scene =
        # the default Cornell+teapot the reference opens with
        # (scene.cpp:24-123).
        scene = _cornell_with([("teapot.obj", 10.0, (50.0, 10.0, 50.0))])
        return flatten_scene(scene, textures=[checker_texture(256)]), \
            1200, 800, 1, False
    if name == "flythrough1080":
        scene = _cornell_with([
            ("teapot.obj", 10.0, (50.0, 10.0, 50.0)),
            ("cow.obj", 8.0, (25.0, 25.0, 80.0)),
            ("teddy.obj", 1.2, (75.0, 30.0, 40.0)),
        ])
        return flatten_scene(scene, textures=[checker_texture(256)]), \
            1920, 1080, 16, False
    raise ValueError(f"unknown config {name!r}; choose from {CONFIGS}")


def run_progressive(name: str, frames: int = 10, iters: int = 0,
                    cfg_kw: dict | None = None) -> dict:
    """Measure the cross-frame persistent wave (engine/progressive.py)
    at config ``name``'s raster: sustained Mrays/s plus ms per
    1-spp-equivalent frame (the interactive pacing metric --
    the mean per-pixel sample count advancing by 1 is one reference
    frame's worth of work, main.cpp:181).

    ``iters=0`` calibrates the per-frame iteration budget to ~1 mean
    sample per frame from a warmup probe.
    """
    from tryraytrace_tpu.camera.controller import CameraController
    from tryraytrace_tpu.engine.progressive import ProgressiveRenderer

    arrays, w, h, _spp, _ = build_config(name)
    cfg = RenderConfig(width=w, height=h, spp=1, **(cfg_kw or {}))
    pr = ProgressiveRenderer(arrays, cfg=cfg)
    cam = CameraController().get_params(w, h)

    # Warm up / compile, then calibrate iterations-per-mean-sample.
    t0 = time.time()
    pr.step(cam, 4)
    pr.block_until_ready()
    compile_s = time.time() - t0
    m0 = float(pr.snapshot()[1].mean())
    pr.step(cam, 16)
    pr.block_until_ready()
    m1 = float(pr.snapshot()[1].mean())
    per_iter = max((m1 - m0) / 16.0, 1e-6)
    iters = iters or max(1, round(1.0 / per_iter))

    r0 = pr.rays_traced()
    t0 = time.time()
    for _ in range(frames):
        pr.step(cam, iters)
        pr.block_until_ready()
    dt = (time.time() - t0) / frames
    rays = (pr.rays_traced() - r0) / frames
    m2 = float(pr.snapshot()[1].mean())
    spp_per_frame = max((m2 - m1) / frames, 1e-9)
    return dict(
        config=name, mode="progressive", width=w, height=h,
        tris=arrays.num_objects, iters_per_frame=iters,
        ms_per_frame=round(dt * 1e3, 2),
        spp_per_frame=round(spp_per_frame, 3),
        ms_per_1spp=round(dt * 1e3 / spp_per_frame, 2),
        fps=round(1.0 / dt, 2),
        mrays_per_s=round(rays / dt / 1e6, 3),
        compile_s=round(compile_s, 1),
    )


def run_config(name: str, frames: int = 2, engine: str | None = None,
               fly: bool = False, cfg_kw: dict | None = None) -> dict:
    import jax

    from tryraytrace_tpu.camera.controller import CameraController
    from tryraytrace_tpu.engine.renderer import Renderer

    arrays, w, h, spp, check = build_config(name)
    # Long single device calls can crash the TPU worker in this
    # environment (CLAUDE.md); cap each step call at ~2e8 traced rays
    # (~12 per primary sample) and accumulate progressive passes.
    spp_chunk = max(1, min(spp, int(2e8 / (w * h * 12))))
    while spp % spp_chunk:
        spp_chunk -= 1
    cfg = RenderConfig(width=w, height=h, spp=spp_chunk,
                       **(cfg_kw or {}))
    if engine:
        cfg = cfg.replace(engine=engine)
    r = Renderer(arrays, cfg=cfg)
    cam = CameraController()
    fly = fly or name == "flythrough1080"

    # Warm up / compile.
    params = cam.get_params(w, h)
    r.step(params)
    r.block_until_ready()

    # Exact ray count for one frame.
    import jax.numpy as jnp

    from tryraytrace_tpu.engine.wavefront import frame_ray_stats

    tr, sh = jax.jit(
        frame_ray_stats, static_argnames=("width", "height", "cfg", "spp"),
    )(r.scene, r.textures, params, jnp.uint32(1), width=w, height=h,
      cfg=cfg, spp=spp_chunk)
    rays = (float(tr) + float(sh)) * (spp // spp_chunk)

    t0 = time.time()
    for f in range(frames):
        if fly:
            # Scripted camera path: the config-5 animated fly-through.
            cam.update(1.0, {"w"})
            cam.process_mouse(30.0, 0.0)
            r.reset()
            params = cam.get_params(w, h)
        for _ in range(spp // spp_chunk):
            r.step(params)
        r.block_until_ready()
    dt = (time.time() - t0) / frames

    result = dict(
        config=name, width=w, height=h, spp=spp,
        tris=arrays.num_objects,
        ms_per_frame=round(dt * 1e3, 2),
        fps=round(1.0 / dt, 2),
        rays_per_frame=rays,
        mrays_per_s=round(rays / dt / 1e6, 3),
        engine=cfg.engine,
    )
    if check:
        from tryraytrace_tpu.oracle.cpu_renderer import oracle_render

        r2 = Renderer(arrays, cfg=cfg)
        r2.step(params)
        eng = r2.accum_host().reshape(-1, 3) / max(r2.spp(), 1)
        ora = oracle_render(arrays, params, w, h,
                            frame_seed=1, spp=spp, cfg=cfg) / spp
        result["mse_vs_oracle"] = float(((eng - ora) ** 2).mean())
    return result
