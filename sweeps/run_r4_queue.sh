#!/bin/bash
# Round-4 serialized TPU queue. Host must stay otherwise idle
# (steady-state frames are dispatch-bound on 1-core hosts).
set -u
cd /root/repo
OUT=sweeps/r4_batch2.jsonl
echo "=== QUEUE START $(date +%H:%M:%S)" >&2

# 1) batch2: quad decode-thinning A/Bs on the headline.
bash sweeps/run_batch.sh sweeps/batch2.txt "$OUT" 2400

# 2) bucket re-roll under bw (VERDICT r3 #4).
echo "=== buckets $(date +%H:%M:%S)" >&2
timeout 5400 python scripts/profile_persistent.py --buckets \
  --out sweeps/r4_buckets.jsonl >> sweeps/r4_buckets.log 2>&1

# 3) interactive operating point (VERDICT r3 #7): owner vs pool.
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

# 4) constant-bytes width microbench (VERDICT r3 #2 tail).
echo "=== microbench_gather $(date +%H:%M:%S)" >&2
timeout 2400 python scripts/microbench_gather.py \
  > sweeps/r4_gather_width.log 2>&1

echo "=== QUEUE DONE $(date +%H:%M:%S)" >&2
