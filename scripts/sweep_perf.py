"""On-chip perf sweep driver: one subprocess per engine variant.

Each variant is a bench.py-style measurement at a chosen config; a
subprocess isolates the flaky axon compile service (a hung compile or
a TPU worker crash kills only that variant).  Results append to a
JSONL file so a partial sweep is still data.

Usage:
  python scripts/sweep_perf.py --out sweep.jsonl --timeout 1200 \
      '{"width":512,"height":512,"spp":4,"step_unroll":8}' \
      '{"width":512,"height":512,"spp":4,"step_unroll":16}'

Keys: width/height/spp/frames/mesh plus any RenderConfig field.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

BENCH_KEYS = {"width", "height", "spp", "frames", "mesh"}

CHILD = r"""
import json, sys, time
spec = json.loads(sys.argv[1])
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
import functools

enable_compilation_cache()
w = spec.pop("width", 512); h = spec.pop("height", 512)
spp = spec.pop("spp", 4); frames = spec.pop("frames", 3)
mesh = spec.pop("mesh", "teapot.obj")
scene_h = create_cornell_box(mesh=mesh or None)
arrays = flatten_scene(scene_h, textures=[checker_texture(256)])
cfg = RenderConfig(width=w, height=h, spp=spp, **spec)
from tryraytrace_tpu.config import quad_select_resolved

scene, textures, bvh = upload_scene(arrays, leaf_size=cfg.bvh_leaf_size,
                                    method=cfg.bvh_method,
                                    traversal=cfg.traversal,
                                    leaf_fmt=cfg.leaf_isect,
                                    quad_collapse=cfg.quad_collapse,
                                    quad_layout=cfg.quad_layout,
                                    quad_select=quad_select_resolved(cfg))
cam = CameraController().get_params(w, h)

@functools.partial(jax.jit, donate_argnames=("accum",))
def step(accum, frame_seed):
    rad, (tr, sh) = render_frame(scene, textures, cam, frame_seed,
                                 w, h, cfg, spp=spp, with_stats=True)
    return accum + rad, tr, sh

accum = jnp.zeros((w * h, 3), jnp.float32)
t0 = time.time()
accum, tr, sh = step(accum, jnp.uint32(1))
jax.block_until_ready(accum)
compile_s = time.time() - t0
rays = float(tr) + float(sh)
t0 = time.time()
for f in range(frames):
    accum, tr, sh = step(accum, jnp.uint32(2 + f))
jax.block_until_ready(accum)
dt = (time.time() - t0) / frames
print(json.dumps({"ms_per_frame": round(dt * 1e3, 1),
                  "mrays": round(rays / dt / 1e6, 3),
                  "rays_per_frame": rays,
                  "compile_s": round(compile_s, 1),
                  "mean": float(accum.mean())}), flush=True)
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="+", help="JSON spec per variant")
    ap.add_argument("--out", default="sweep.jsonl")
    ap.add_argument("--timeout", type=float, default=1800.0)
    args = ap.parse_args()

    for raw in args.variants:
        spec = json.loads(raw)
        t0 = time.time()
        rec = {"spec": spec}
        try:
            proc = subprocess.run(
                [sys.executable, "-c", CHILD, json.dumps(spec)],
                capture_output=True, text=True, timeout=args.timeout)
            if proc.returncode == 0:
                rec.update(json.loads(proc.stdout.strip().splitlines()[-1]))
            else:
                rec["error"] = proc.stderr[-2000:]
        except subprocess.TimeoutExpired:
            rec["error"] = f"timeout after {args.timeout}s"
        rec["wall_s"] = round(time.time() - t0, 1)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
