"""Large-graph label-propagation demo (G5 at 10^8-edge scale).
Usage: python tools/lpa_demo.py <cpus> <n_edges> [max_iters] [partitions]

Same generated power-law graph as scaling_probe.py; reports per-superstep
times, label-change counts and edges/sec.  10^8-edge runs want
SPARK_DRIVER_MEMORY=64g (see BENCH.md heap-sizing note).
"""

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sbustreamspot_core_spark.config import GraphParams
from sbustreamspot_core_spark.graph.labelprop import label_propagation
from sbustreamspot_core_spark.session import get_spark


def main():
    cpus = int(sys.argv[1])
    n_edges = int(sys.argv[2])
    max_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    partitions = int(sys.argv[4]) if len(sys.argv) > 4 else max(
        cpus, n_edges // 2_000_000)
    n_nodes = max(n_edges // 10, 1000)
    spark = get_spark(f"lpa{cpus}", cpus=cpus, shuffle_partitions=partitions)
    r = spark.range(0, n_edges, 1, max(cpus, partitions))
    src = F.pmod(F.xxhash64(F.col("id")), n_nodes)
    dst = (F.when(F.pmod(F.xxhash64(F.col("id") + 1), 16) == 0, F.lit(0))
           .otherwise(F.pmod(F.xxhash64(F.col("id") * 31 + 7), n_nodes)))
    graph = r.select(src.alias("src"), dst.alias("dst")) \
        .filter("src != dst").cache()
    real_edges = graph.count()
    t0 = time.time()
    res = label_propagation(spark, graph, GraphParams(
        num_partitions=partitions, lpa_max_iters=max_iters,
        checkpoint_interval=3))
    res.labels.count()
    total = time.time() - t0
    n_labels = res.labels.select("label").distinct().count()
    steps = [m["step_sec"] for m in res.metrics]
    changed = [m.get("changed") for m in res.metrics]
    print(json.dumps({
        "cpus": cpus, "partitions": partitions, "edges": real_edges,
        "supersteps": res.supersteps, "converged": res.converged,
        "total_sec": round(total, 2),
        "edges_per_sec_total": round(real_edges * res.supersteps / total, 1),
        "distinct_labels": n_labels,
        "steps": steps, "changed": changed,
    }))


if __name__ == "__main__":
    main()
