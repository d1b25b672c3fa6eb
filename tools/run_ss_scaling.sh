#!/bin/sh
# N->4N scaling via the SHIPPING interface: spark-submit --py-files,
# pinned cores, fixed data-sized partitions, identical input bytes.
set -e
cd /tmp
for i in 1 2; do
  for CFG in "2 0-1" "8 0-7"; do
    C=$(echo "$CFG" | cut -d' ' -f1); PIN=$(echo "$CFG" | cut -d' ' -f2)
    echo "== round $i cores=$C =="
    SPARK_GRAFT_CPUS=$C taskset -c "$PIN" spark-submit --master "local[$C]" \
      --driver-memory 8g --py-files /root/repo/sbustreamspot_core_spark.zip \
      /root/repo/jobs/run_pagerank.py --edges /tmp/scaling_graph_64000000.parquet \
      --algo pagerank --max-iters 5 --tol 0 --partitions 32 \
      2>/dev/null | grep -E '^\{' | sed "s/^/{\"cores\": $C, \"round\": $i, \"res\": /; s/$/}/" >> "${LOG:-/tmp/ss_scaling_r5.jsonl}"
  done
done
echo DONE_SS_SCALING
