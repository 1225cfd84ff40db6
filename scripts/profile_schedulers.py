"""Scheduler A/B at the real headline config with debug counters:
did the pool/quota schedulers actually cut lane-steps, and what is
each scheduler's realized ms per lane-step?

One subprocess per scheduler (axon compile isolation).  Prints/appends
JSONL: {scheduler, ms, lane_steps, visits, utilization, ns_per_lane_step}.

Usage: python scripts/profile_schedulers.py [--out f.jsonl]
       [--spp 16] [--width 1920] [--height 1080] [--schedulers a,b,c]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

CHILD = r"""
import json, sys, time, functools
spec = json.loads(sys.argv[1])
import jax, jax.numpy as jnp
from tryraytrace_tpu.camera.controller import CameraController
from tryraytrace_tpu.config import RenderConfig
from tryraytrace_tpu.engine.device_scene import upload_scene
from tryraytrace_tpu.engine.wavefront import render_frame
from tryraytrace_tpu.scene.assets import checker_texture
from tryraytrace_tpu.scene.cornell import create_cornell_box
from tryraytrace_tpu.scene.model import flatten_scene
from tryraytrace_tpu.utils.jaxtools import enable_compilation_cache

enable_compilation_cache()
w = spec.pop("width"); h = spec.pop("height"); spp = spec.pop("spp")
sched = spec.pop("scheduler")
arrays = flatten_scene(create_cornell_box(),
                       textures=[checker_texture(256)])
cfg = RenderConfig(width=w, height=h, spp=spp, scheduler=sched, **spec)
from tryraytrace_tpu.config import quad_select_resolved

scene, textures, bvh = upload_scene(arrays, leaf_size=cfg.bvh_leaf_size,
                                    method=cfg.bvh_method,
                                    traversal=cfg.traversal,
                                    leaf_fmt=cfg.leaf_isect,
                                    quad_collapse=cfg.quad_collapse,
                                    quad_layout=cfg.quad_layout,
                                    quad_select=quad_select_resolved(cfg))
cam = CameraController().get_params(w, h)

from tryraytrace_tpu.engine.persistent import render_frame_persistent

DBG_KEYS = ("visits", "shadow_visits", "lane_steps", "ticks", "bodies")

@jax.jit
def frame(seed):
    # Mirror render_frame's chunking (wavefront.py) inside ONE jit --
    # the same program shape bench.py measures -- with debug counters.
    n = w * h
    mw = cfg.pool_span if sched in ("pool", "quota") else cfg.max_wave_lanes
    tot = {k: jnp.float32(0) for k in DBG_KEYS}
    outs = []
    for c0 in range(0, n, mw):
        idx = jnp.arange(c0, min(c0 + mw, n), dtype=jnp.int32)
        out, dbg = render_frame_persistent(
            scene, textures, cam, seed, w, h, cfg, spp=spp,
            pixel_idx=idx, with_debug=True)
        outs.append(out)
        for k in tot:
            tot[k] = tot[k] + jnp.asarray(dbg[k], jnp.float32)
    return jnp.concatenate(outs), tot

t0 = time.time()
out, tot = frame(1)
out.block_until_ready()
compile_s = time.time() - t0
t0 = time.time()
out, tot = frame(2)
out.block_until_ready()
ms = (time.time() - t0) * 1e3
tot = {k: float(v) for k, v in tot.items()}
print(json.dumps({
    "scheduler": sched, "ms": round(ms, 1), "compile_s": round(compile_s, 1),
    **{k: tot[k] for k in tot},
    "utilization": round(tot["visits"] / max(tot["lane_steps"], 1), 4),
    "ns_per_lane_step": round(ms * 1e6 / max(tot["lane_steps"], 1), 3),
    "mean": float(out.mean()),
}))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--timeout", type=int, default=1800)
    ap.add_argument("--schedulers", default="owner,pool,quota")
    ap.add_argument("--extra", default="{}",
                    help="extra RenderConfig fields as JSON")
    args = ap.parse_args()
    for sched in args.schedulers.split(","):
        spec = dict(width=args.width, height=args.height, spp=args.spp,
                    scheduler=sched, dual_walk=False)
        spec.update(json.loads(args.extra))
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", CHILD,
                                json.dumps(spec)],
                               capture_output=True, text=True,
                               timeout=args.timeout)
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() \
                else json.dumps({"scheduler": sched, "error": r.stderr[-500:]})
        except subprocess.TimeoutExpired:
            line = json.dumps({"scheduler": sched, "error": "timeout",
                               "wall_s": round(time.time() - t0, 1)})
        print(line, flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
