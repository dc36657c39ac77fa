#!/bin/bash
# Interleaved A/B bench sampler: alternates bench.py between two
# checkouts in calm windows so steal hits both variants equally.
# Usage: ab_bench_loop.sh [n_rounds] [log] [max_load]
N=${1:-8}
LOG=${2:-/tmp/bench_ab_r4.jsonl}
MAXLOAD=${3:-1.5}
for i in $(seq 1 "$N"); do
  for variant in current base; do
    dir=/root/repo
    [ "$variant" = base ] && dir=/tmp/base_r4
    while :; do
      L=$(cut -d' ' -f1 /proc/loadavg)
      ok=$(python3 -c "print(1 if $L < $MAXLOAD else 0)")
      [ "$ok" = 1 ] && break
      sleep 30
    done
    J=$(cd "$dir" && timeout 900 python bench.py 2>/dev/null | tail -1)
    J=${J:-null}  # failed/timed-out run → valid JSON null, not a malformed line
    L2=$(cut -d' ' -f1 /proc/loadavg)
    echo "{\"variant\": \"$variant\", \"round\": $i, \"load_pre\": $L, \"load_post\": $L2, \"bench\": $J}" >> "$LOG"
    sleep 10
  done
done
