#!/bin/bash
# Serialized on-chip bench batch: one bench.py run per line of $1,
# appending {"args": ..., "result": ...} JSONL to $2.
# Never run two at once (1-core host: dispatch-bound steady state).
set -u
SPEC="$1"; OUT="$2"; TMO="${3:-1800}"
while IFS= read -r line; do
  [ -z "$line" ] && continue
  echo "=== $(date +%H:%M:%S) bench $line" >&2
  res=$(timeout "$TMO" python /root/repo/bench.py --no-mse --compile-rolls 1 $line 2>/tmp/bench_err.log | tail -1)
  rc=$?
  if [ $rc -ne 0 ] || [ -z "$res" ]; then
    res="{\"error\": \"rc=$rc\", \"tail\": $(tail -c 400 /tmp/bench_err.log | python -c 'import json,sys; print(json.dumps(sys.stdin.read()))')}"
  fi
  printf '{"args": "%s", "result": %s}\n' "$line" "$res" >> "$OUT"
done < "$SPEC"
echo "BATCH DONE $(date +%H:%M:%S)" >&2
