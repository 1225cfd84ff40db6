#!/bin/bash
# Round-5 serialized TPU queue, batch 1 (VERDICT r4 #1):
# fresh state-of-record numbers for all five acceptance configs at the
# round-4 defaults (bw + quad + dp collapse + stages 8 + auto leaf/
# cadence), plus the big-scene knee A/Bs: under inline shading the
# unified in-loop table (quad rows + trimat rows) is 5.73 MB on
# flythrough and 4.93 MB on teddy -- past the ~2.5-2.9 MB knee the r4
# K-sweep priced at a flat ~1.49x -- while the tick path's in-loop
# table (quad rows only) fits.  Host must stay otherwise idle
# (steady-state frames are dispatch-bound on 1-core hosts).
set -u
cd /root/repo
OUT=sweeps/r5_batch1.jsonl
echo "=== R5 QUEUE START $(date +%H:%M:%S)" >&2

run_one() {
  local name="$1" frames="$2" kw="$3" tag="$4" tmo="$5"
  echo "=== $tag $(date +%H:%M:%S)" >&2
  timeout "$tmo" python -c "
import json, time
from tryraytrace_tpu.utils.jaxtools import enable_compilation_cache
enable_compilation_cache()
from tryraytrace_tpu.benchmarks import run_config
t0 = time.time()
r = run_config('$name', frames=$frames, cfg_kw=dict($kw))
r['tag'] = '$tag'
r['cfg_kw'] = '$kw'
r['wall_s'] = round(time.time() - t0, 1)
print(json.dumps(r))
" 2>/tmp/r5_err_"$tag".log | tail -1 >> "$OUT" \
    || echo "{\"tag\": \"$tag\", \"error\": true}" >> "$OUT"
}

# State of record at defaults (auto leaf, auto cadence, inline auto).
run_one cube256        6 ""  cube256_default        2400
run_one teapot512      5 ""  teapot512_default      2400
run_one cow800         5 ""  cow800_default         3000
run_one teddy1024      3 ""  teddy1024_default      4200
run_one flythrough1080 3 ""  flythrough1080_default 4200

# Big-scene knee A/Bs: tick path (quad-only in-loop table).
run_one flythrough1080 3 "inline_shade=False" fly_tick_leaf8 4200
run_one flythrough1080 3 "inline_shade=False, bvh_leaf_size=6" fly_tick_leaf6 4200
run_one teddy1024      3 "inline_shade=False" teddy_tick_leaf8 4200

echo "=== R5 QUEUE DONE $(date +%H:%M:%S)" >&2
