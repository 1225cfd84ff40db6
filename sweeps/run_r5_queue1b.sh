#!/bin/bash
# Round-5 batch 1b: flythrough INLINE leaf sweep (batch 1 tested the
# tick path, which loses to tick-wait idle regardless of table size;
# the open question is whether shrinking the inline unified table
# 5.73 -> 4.46 -> 3.38 MB pays on the one scene still well past the
# 2.5-2.9 MB regime).
set -u
cd /root/repo
OUT=sweeps/r5_batch1.jsonl
echo "=== R5 QUEUE1B START $(date +%H:%M:%S)" >&2

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

run_one flythrough1080 3 "bvh_leaf_size=6" fly_inline_leaf6 4200
run_one flythrough1080 3 "bvh_leaf_size=4" fly_inline_leaf4 4200

echo "=== R5 QUEUE1B DONE $(date +%H:%M:%S)" >&2
