"""Summarize a profile_persistent --buckets jsonl into the per-lane-step
cost decomposition table (docs/PERFORMANCE.md; VERDICT r2 #5).

Usage: python scripts/bucket_report.py [/tmp/r3logs/buckets_r3.jsonl]

Differencing (all variants share the workload; ns = ms*1e6/lane_steps,
tick cost removed with the round-2 fitted C_tick for the one variant
that ticks):
  leaf/slot   = (bw-K8 - bw-K4) / 4        (same for mt)
  service     = bw-K8-inline - bw-K8-tick  (the in-step shade/regen block)
  quad decode = bw-K8-quad - bw-K8-threaded (4 slab tests + select +
                register file, minus the threaded walk's 1-box decode)
  base        = bw-K8 - 8*leaf/slot - service (gather + 1-box-equiv
                decode + state bookkeeping)
"""
import json
import sys

C_TICK_MS = 0.278


def ns_step(r):
    ms = r["ms"] - r["ticks"] * C_TICK_MS
    return ms * 1e6 / r["lane_steps"]


def main(path="/tmp/r3logs/buckets_r3.jsonl"):
    by = {}
    for line in open(path):
        r = json.loads(line)
        if "ms" in r:
            by[r["spec"]["label"]] = r  # last occurrence wins

    print(f"{'variant':<28} {'ms':>8} {'ns/lane-step':>13} {'compile_s':>10}")
    for lbl, r in by.items():
        print(f"{lbl:<28} {r['ms']:>8.1f} {ns_step(r):>13.3f} "
              f"{r['compile_s']:>10.1f}")

    k8, k4 = by.get("bw-K8-quad-inline"), by.get("bw-K4-quad-inline")
    tick = by.get("bw-K8-quad-tick")
    thr = by.get("bw-K8-threaded-inline")
    mt8, mt4 = by.get("mt-K8-quad-inline"), by.get("mt-K4-quad-inline")
    print()
    leaf_bw = service = None
    if k8 and k4:
        leaf_bw = (ns_step(k8) - ns_step(k4)) / 4
        print(f"leaf ns/slot (bw):        {leaf_bw:7.3f}"
              f"   (x8 slots = {8 * leaf_bw:6.3f})")
    if mt8 and mt4:
        leaf_mt = (ns_step(mt8) - ns_step(mt4)) / 4
        print(f"leaf ns/slot (mt):        {leaf_mt:7.3f}"
              f"   (x8 slots = {8 * leaf_mt:6.3f})")
    if k8 and tick:
        service = ns_step(k8) - ns_step(tick)
        print(f"service block ns:         {service:7.3f}")
    if k8 and thr:
        print(f"quad decode - threaded ns:{ns_step(k8) - ns_step(thr):7.3f}")
    if k8 and leaf_bw is not None and service is not None:
        base = ns_step(k8) - 8 * leaf_bw - service
        print(f"base (gather+decode+state):{base:6.3f}")


if __name__ == "__main__":
    main(*sys.argv[1:])
