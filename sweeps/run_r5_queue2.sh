#!/bin/bash
# Round-5 serialized TPU queue, batch 2: headline control + the
# service-step experiment (VERDICT r4 #2), the last decode op-count
# knob (#5), the updated idle decomposition, and the progressive
# engine's sustained + interactive numbers (#3).  Host must stay
# otherwise idle.
set -u
cd /root/repo
OUT=sweeps/r5_batch2.jsonl
echo "=== R5 QUEUE2 START $(date +%H:%M:%S)" >&2

bench_one() {
  local tag="$1"; shift
  echo "=== $tag $(date +%H:%M:%S)" >&2
  timeout 3600 python bench.py --compile-rolls 1 --no-mse "$@" \
    2>>sweeps/r5_queue2.err | tail -1 \
    | python -c "
import json, sys
r = json.loads(sys.stdin.read()); r['tag'] = '$tag'
print(json.dumps(r))" >> "$OUT" \
    || echo "{\"tag\": \"$tag\", \"error\": true}" >> "$OUT"
}

# 1) Fresh headline control at the committed defaults.
bench_one headline_default

# 2) Inline service twice per body (u in {1,3}): halves SHADEG wait
#    for one extra service-block copy (analysis: PERFORMANCE.md 2b.3b;
#    prediction: a wash or small loss -- this is the numbered kill).
bench_one headline_svc2 --service-steps 2

# 3) redirect_passes=1 (round-4 measured +0.25%, at the spread floor;
#    the last open decode op-count knob -- 2b.5).
bench_one headline_rp1 --redirect-passes 1

# 4) Updated idle decomposition with the SHADEG split counters.
echo "=== profile $(date +%H:%M:%S)" >&2
timeout 3000 python scripts/profile_persistent.py \
  --variants '[{"label": "default"}, {"label": "svc2", "inline_service_steps": 2}]' \
  --out sweeps/r5_profile.jsonl >> sweeps/r5_queue2.err 2>&1

# 5) Progressive sustained headline (drain-free throughput bound).
echo "=== progressive_sustained $(date +%H:%M:%S)" >&2
timeout 3600 python scripts/bench_progressive.py 2>>sweeps/r5_queue2.err \
  | tail -1 >> "$OUT" \
  || echo '{"tag": "progressive_sustained", "error": true}' >> "$OUT"

# 6) Progressive interactive operating point (1200x800@1spp pacing).
echo "=== progressive_interactive $(date +%H:%M:%S)" >&2
timeout 2400 python -c "
import json
from tryraytrace_tpu.utils.jaxtools import enable_compilation_cache
enable_compilation_cache()
from tryraytrace_tpu.benchmarks import run_progressive
r = run_progressive('interactive', frames=10)
r['tag'] = 'progressive_interactive'
print(json.dumps(r))
" 2>>sweeps/r5_queue2.err | tail -1 >> "$OUT" \
  || echo '{"tag": "progressive_interactive", "error": true}' >> "$OUT"

# 7) Batch interactive control (the round-4 731 ms point, re-measured
#    on today's service for an apples-to-apples delta).
echo "=== batch_interactive $(date +%H:%M:%S)" >&2
timeout 2400 python -c "
import json
from tryraytrace_tpu.utils.jaxtools import enable_compilation_cache
enable_compilation_cache()
from tryraytrace_tpu.benchmarks import run_config
r = run_config('interactive', frames=10)
r['tag'] = 'batch_interactive'
print(json.dumps(r))
" 2>>sweeps/r5_queue2.err | tail -1 >> "$OUT" \
  || echo '{"tag": "batch_interactive", "error": true}' >> "$OUT"

echo "=== R5 QUEUE2 DONE $(date +%H:%M:%S)" >&2
