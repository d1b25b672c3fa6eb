#!/bin/sh
# N->4N scaling via the SHIPPING interface: spark-submit --py-files,
# pinned cores, fixed data-sized partitions, identical input bytes.
# Needs the pre-generated graph (tools/gen_scaling_graph.py 64000000 ...).
set -e
GRAPH=${GRAPH:-/tmp/scaling_graph_64000000.parquet}
LOG=${LOG:-/tmp/ss_scaling_r5.jsonl}
[ -d "$GRAPH" ] || { echo "missing $GRAPH (gen_scaling_graph.py first)"; exit 1; }
cd /tmp
for i in 1 2; do
  for CFG in "2 0-1" "8 0-7"; do
    C=$(echo "$CFG" | cut -d' ' -f1); PIN=$(echo "$CFG" | cut -d' ' -f2)
    echo "== round $i cores=$C =="
    # capture-then-test: spark-submit heads a pipeline, so its exit code
    # is invisible to set -e — an empty JSON line is the failure signal
    OUT=$(SPARK_GRAFT_CPUS=$C taskset -c "$PIN" spark-submit \
      --master "local[$C]" --driver-memory 8g \
      --py-files /root/repo/sbustreamspot_core_spark.zip \
      /root/repo/jobs/run_pagerank.py --edges "$GRAPH" \
      --algo pagerank --max-iters 5 --tol 0 --partitions 32 \
      2>/dev/null | grep -E '^\{' | head -1)
    [ -n "$OUT" ] || { echo "leg FAILED (cores=$C round=$i)"; exit 1; }
    printf '{"cores": %s, "round": %s, "res": %s}\n' "$C" "$i" "$OUT" >> "$LOG"
  done
done
echo DONE_SS_SCALING
