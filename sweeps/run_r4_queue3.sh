#!/bin/bash
# Waits for queue2 (buckets + interactive) to finish, then measures
# the dp-default x deeper-ladder combos.
set -u
cd /root/repo
Q2=$(cat /tmp/r4queue2.pid 2>/dev/null || echo 0)
while kill -0 "$Q2" 2>/dev/null; do sleep 30; done
echo "=== QUEUE3 START $(date +%H:%M:%S)" >&2
bash sweeps/run_batch.sh sweeps/batch4.txt sweeps/r4_batch4.jsonl 2400
echo "=== QUEUE3 DONE $(date +%H:%M:%S)" >&2
