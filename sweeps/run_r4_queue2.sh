#!/bin/bash
# Round-4 queue, part 2 (re-prioritized after the batch2 early
# results): dp collapse (sa measured +1.1%, dp is its exact
# optimizer), utilization knobs, then the bucket re-roll and the
# interactive operating point.  Host must stay otherwise idle.
set -u
cd /root/repo
echo "=== QUEUE2 START $(date +%H:%M:%S)" >&2

bash sweeps/run_batch.sh sweeps/batch3.txt sweeps/r4_batch3.jsonl 2400

echo "=== buckets $(date +%H:%M:%S)" >&2
timeout 5400 python scripts/profile_persistent.py --buckets \
  --out sweeps/r4_buckets.jsonl >> sweeps/r4_buckets.log 2>&1

echo "=== interactive $(date +%H:%M:%S)" >&2
for sched in owner pool; do
  timeout 2400 python -c "
import json
from tryraytrace_tpu.utils.jaxtools import enable_compilation_cache
enable_compilation_cache()
from tryraytrace_tpu.benchmarks import run_config
r = run_config('interactive', frames=10, cfg_kw=dict(scheduler='$sched'))
r['scheduler'] = '$sched'
print(json.dumps(r))
" 2>/tmp/inter_err.log | tail -1 >> sweeps/r4_interactive.jsonl \
    || echo "{\"error\": \"$sched failed\"}" >> sweeps/r4_interactive.jsonl
done

echo "=== QUEUE2 DONE $(date +%H:%M:%S)" >&2
