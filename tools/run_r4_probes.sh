#!/bin/sh
# Round-4 probe sequence — ONE Spark JVM at a time (concurrent JVMs on this
# host produce phantom slowdowns).  Appends JSON lines to the log files.
#
#  1. shuffle-byte-rate probes: 8 vs 32 cores x lz4 vs zstd at 64M edges,
#     2 interleaved rounds (evidence for the 8->32 0.66 wide-pair wall)
#  2. dedup-at-1M-docs demo (candidates/doc linearity, one more decade)
#
# Usage: sh tools/run_r4_probes.sh [edges] [log_dir]
set -e
EDGES=${1:-64000000}
OUT=${2:-/tmp/r4_probes}
mkdir -p "$OUT"
cd /root/repo

for i in 1 2; do
  for CFG in "8 0-7 lz4" "32 0-31 lz4" "8 0-7 zstd" "32 0-31 zstd"; do
    CPUS=$(echo "$CFG" | cut -d' ' -f1)
    PIN=$(echo "$CFG" | cut -d' ' -f2)
    CODEC=$(echo "$CFG" | cut -d' ' -f3)
    echo "== round $i cpus=$CPUS codec=$CODEC edges=$EDGES =="
    taskset -c "$PIN" python tools/shuffle_bytes_probe.py \
      "$CPUS" "$EDGES" 5 32 "$CODEC" 2>/dev/null | tail -1 \
      | tee -a "$OUT/shuffle_bytes.jsonl"
  done
done
echo "SHUFFLE_PROBES_DONE"

python tools/dedup_scale_demo.py 100000 32 2>/dev/null | tail -1 \
  | tee -a "$OUT/dedup_1m.jsonl"
echo "ALL_R4_PROBES_DONE"
