#!/bin/bash
# Repeated bench sampler: waits for a calm window (1-min loadavg below
# threshold), runs bench.py, appends the JSON line + loadavg to the log.
# Usage: bench_calm_loop.sh [n_samples] [log] [max_load]
N=${1:-8}
LOG=${2:-/tmp/bench_r4_samples.jsonl}
MAXLOAD=${3:-1.5}
cd /root/repo
for i in $(seq 1 "$N"); do
  while :; do
    L=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $L < $MAXLOAD else 0)")
    [ "$ok" = 1 ] && break
    sleep 30
  done
  J=$(timeout 900 python bench.py 2>/dev/null | tail -1)
  J=${J:-null}  # failed/timed-out run → valid JSON null, not a malformed line
  L2=$(cut -d' ' -f1 /proc/loadavg)
  echo "{\"load_pre\": $L, \"load_post\": $L2, \"bench\": $J}" >> "$LOG"
  sleep 15
done
