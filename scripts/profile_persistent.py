"""Scheduler cost breakdown for the persistent engine on the real chip.

Runs one 65536-lane wave of the teapot scene (the headline's chunk
shape) under several (step_unroll, shade_every, dual_walk) settings
with the engine's debug counters on, then prints per-variant:

  ms/frame, bodies, ticks, visits, utilization (visits/lane_steps),
  visits/ray

With >= 3 variants the (C_body, C_step, C_tick) per-unit costs are
solvable by least squares: T = bodies*C_body + steps*C_step +
ticks*C_tick.  This replaces guessing where the frame time goes
(ROADMAP round-1 breakdown) with measured coefficients.

Usage: python scripts/profile_persistent.py [--out prof.jsonl]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

VARIANTS = [
    {"step_unroll": 4, "shade_every": 4, "dual_walk": True},
    {"step_unroll": 4, "shade_every": 2, "dual_walk": True},
    {"step_unroll": 2, "shade_every": 4, "dual_walk": True},
    {"step_unroll": 4, "shade_every": 4, "dual_walk": False},
    {"step_unroll": 1, "shade_every": 8, "dual_walk": True},
    {"step_unroll": 8, "shade_every": 2, "dual_walk": True},
]

# --buckets: decompose the per-lane-step cost into leaf-intersection /
# decode / service / base-gather buckets by differencing variants that
# scale exactly one bucket (VERDICT r2 #5).  All inline variants have
# ticks == 0, and the body contribution is a near-constant ~7%, so
# per-variant ns/lane-step deltas isolate the buckets:
#   leaf slope (ns per leaf slot) = (C[K=8] - C[K=4]) / 4, per format;
#   service block = C[inline] - C[no-inline]  (shade/regen block runs
#     masked every step under inline; the no-inline step drops it);
#   decode delta = C[quad] - C[threaded] at equal (fmt, K).
BUCKET_VARIANTS = [
    {"label": "bw-K8-quad-inline"},                    # default config
    {"label": "mt-K8-quad-inline", "leaf_isect": "mt"},
    {"label": "bw-K4-quad-inline", "bvh_leaf_size": 4},
    {"label": "mt-K4-quad-inline", "leaf_isect": "mt", "bvh_leaf_size": 4},
    {"label": "bw-K8-quad-tick", "inline_shade": False},
    {"label": "bw-K8-threaded-inline", "traversal": "threaded"},
]

CHILD = r"""
import json, sys, time, functools
spec = json.loads(sys.argv[1])
spec.pop("label", None)
import jax, jax.numpy as jnp
from tryraytrace_tpu.camera.controller import CameraController
from tryraytrace_tpu.config import RenderConfig
from tryraytrace_tpu.engine.device_scene import upload_scene
from tryraytrace_tpu.engine.persistent import render_frame_persistent
from tryraytrace_tpu.scene.assets import checker_texture
from tryraytrace_tpu.scene.cornell import create_cornell_box
from tryraytrace_tpu.scene.model import flatten_scene
from tryraytrace_tpu.utils.jaxtools import enable_compilation_cache

enable_compilation_cache()
w, h, spp = 512, 512, 4
lanes = spec.pop("lanes", 65536)
roll = spec.pop("roll", 0)
scene_h = create_cornell_box(mesh="teapot.obj")
arrays = flatten_scene(scene_h, textures=[checker_texture(128)])
cfg = RenderConfig(width=w, height=h, spp=spp, **spec)
scene, textures, bvh = upload_scene(arrays, leaf_size=cfg.bvh_leaf_size,
                                    method=cfg.bvh_method,
                                    traversal=cfg.traversal,
                                    leaf_fmt=cfg.leaf_isect,
                                    quad_collapse=cfg.quad_collapse)
cam = CameraController().get_params(w, h)
pix = jnp.arange(lanes, dtype=jnp.int32)

@jax.jit
def run(frame_seed):
    out, (tr, sh), dbg = render_frame_persistent(
        scene, textures, cam, frame_seed, w, h, cfg, spp,
        pixel_idx=pix, with_stats=True, with_debug=True)
    if roll:
        # Traced no-op with ``roll`` as an HLO literal (bench.py's
        # compile-roll trick): the module hash differs so the flaky
        # remote-compile service cannot reuse an earlier roll's slow
        # executable; XLA folds the multiply-by-zero out.
        tr = tr + tr * jnp.float32(0) * (roll + 1)
    return out, (tr, sh), dbg

t0 = time.time()
out, (tr, sh), dbg = run(jnp.uint32(1))
jax.block_until_ready(out)
compile_s = time.time() - t0
t0 = time.time()
reps = 3
for f in range(reps):
    out, (tr, sh), dbg = run(jnp.uint32(2 + f))
jax.block_until_ready(out)
dt = (time.time() - t0) / reps
rays = float(tr) + float(sh)
visits = float(dbg["visits"]); lane_steps = float(dbg["lane_steps"])
ctx_steps = float(dbg["ctx_steps"])
print(json.dumps({
    "ms": round(dt * 1e3, 1),
    "bodies": int(dbg["bodies"]),
    "ticks": int(float(dbg["ticks"])),
    "visits": visits,
    "lane_steps": lane_steps,
    "utilization": round(visits / lane_steps, 4),
    # Idle split (VERDICT r3 #5): fraction of context-steps spent
    # DONE (intra-stage drain -- the spill ladder's residual) vs
    # READY/REFILL/TEXG (waiting for a shade tick / texture service).
    "idle_done_frac": round(float(dbg["ctx_done"]) / ctx_steps, 4),
    "idle_wait_frac": round(float(dbg["ctx_wait"]) / ctx_steps, 4),
    # Sub-step-resolution SHADEG/TEXG occupancy vs lane_steps (round-5
    # split of 2b.3b's 0.21 remainder bucket: the inline-service
    # wait + serviced steps); ctx_shadeg is the per-body-start view.
    "shadeg_steps_frac": round(float(dbg["shadeg_steps"]) / lane_steps,
                               4),
    "idle_shadeg_frac": round(float(dbg["ctx_shadeg"]) / ctx_steps, 4),
    "rays": rays,
    "visits_per_ray": round(visits / rays, 2),
    "compile_s": round(compile_s, 1),
    "mean": float(out.mean()),
}), flush=True)
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/profile_persistent.jsonl")
    ap.add_argument("--timeout", type=float, default=1500.0)
    ap.add_argument("--variants", default=None,
                    help="JSON list overriding the built-in grid")
    ap.add_argument("--buckets", action="store_true",
                    help="run the bucket-decomposition grid and print "
                    "the per-lane-step cost split (leaf / service / "
                    "decode / base)")
    args = ap.parse_args()
    variants = (BUCKET_VARIANTS if args.buckets
                else json.loads(args.variants) if args.variants
                else VARIANTS)

    rows = []
    for spec in variants:
        rec = {"spec": dict(spec)}
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
        rows.append(rec)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    good = [r for r in rows if "ms" in r]
    if args.buckets:
        by = {r["spec"].get("label"): r for r in good}

        def ns_step(r, c_tick_ms=0.278):
            # ns per lane-step, tick cost removed with the round-2
            # fitted C_tick (only the no-inline variant has ticks).
            ms = r["ms"] - r["ticks"] * c_tick_ms
            return ms * 1e6 / r["lane_steps"]  # ns/lane-step

        out = {}
        for lbl, r in by.items():
            out[lbl] = round(ns_step(r), 3)
        bk = {}
        if {"bw-K8-quad-inline", "bw-K4-quad-inline"} <= by.keys():
            bk["leaf_ns_per_slot_bw"] = round(
                (ns_step(by["bw-K8-quad-inline"])
                 - ns_step(by["bw-K4-quad-inline"])) / 4, 3)
        if {"mt-K8-quad-inline", "mt-K4-quad-inline"} <= by.keys():
            bk["leaf_ns_per_slot_mt"] = round(
                (ns_step(by["mt-K8-quad-inline"])
                 - ns_step(by["mt-K4-quad-inline"])) / 4, 3)
        if {"bw-K8-quad-inline", "bw-K8-quad-tick"} <= by.keys():
            bk["service_block_ns"] = round(
                ns_step(by["bw-K8-quad-inline"])
                - ns_step(by["bw-K8-quad-tick"]), 3)
        if {"bw-K8-quad-inline", "bw-K8-threaded-inline"} <= by.keys():
            bk["quad_decode_minus_threaded_ns"] = round(
                ns_step(by["bw-K8-quad-inline"])
                - ns_step(by["bw-K8-threaded-inline"]), 3)
        if "leaf_ns_per_slot_bw" in bk:
            bk["base_gather_plus_decode_ns"] = round(
                ns_step(by["bw-K8-quad-inline"])
                - 8 * bk["leaf_ns_per_slot_bw"]
                - bk.get("service_block_ns", 0.0), 3)
        rec = {"ns_per_lane_step": out, "buckets": bk}
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec, indent=1), flush=True)
        return 0
    if len(good) >= 3:
        import numpy as np

        # Normalize steps by each variant's own lane count (the
        # C_step unit is "one full-width step at that width").
        a = np.array([[r["bodies"],
                       r["lane_steps"] / r["spec"].get("lanes", 65536),
                       r["ticks"]] for r in good])
        y = np.array([r["ms"] for r in good])
        coef, res, *_ = np.linalg.lstsq(a, y, rcond=None)
        fit = {"C_body_ms": round(float(coef[0]), 4),
               "C_step_ms": round(float(coef[1]), 4),
               "C_tick_ms": round(float(coef[2]), 4),
               "residual_ms": [round(float(v), 1)
                               for v in (a @ coef - y)]}
        with open(args.out, "a") as f:
            f.write(json.dumps({"fit": fit}) + "\n")
        print(json.dumps({"fit": fit}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
