#!/bin/sh
# Interleaved N->4N scaling rounds: one Spark JVM at a time, pinned cores,
# SAME data-sized partition count at every core count (see
# tools/scaling_probe.py docstring).  Appends one JSON line per probe run.
# Usage: sh tools/run_scaling_rounds.sh <edges> <supersteps> <partitions> <rounds> <logfile>
set -e
EDGES=${1:-64000000}
STEPS=${2:-5}
PARTS=${3:-32}
ROUNDS=${4:-3}
LOG=${5:-/tmp/scaling_rounds.jsonl}
GRAPH=${6:-/tmp/scaling_graph_$EDGES.parquet}
cd /root/repo
# generate the (distinct) edge table ONCE at full width: every leg then
# reads the identical bytes and no pinned leg pays the generator shuffle
if [ ! -d "$GRAPH" ]; then
  python tools/gen_scaling_graph.py "$EDGES" "$GRAPH" "$PARTS" 2>/dev/null | tail -1
fi
for i in $(seq 1 "$ROUNDS"); do
  for CFG in "2 0-1" "8 0-7" "32 0-31"; do
    CPUS=$(echo "$CFG" | cut -d' ' -f1)
    PIN=$(echo "$CFG" | cut -d' ' -f2)
    echo "== round $i cpus=$CPUS pin=$PIN edges=$EDGES parts=$PARTS =="
    taskset -c "$PIN" python tools/scaling_probe.py "$CPUS" "$EDGES" "$STEPS" "$PARTS" "$GRAPH" \
      2>/dev/null | tail -1 | tee -a "$LOG"
  done
done
echo "ALL_ROUNDS_DONE"
