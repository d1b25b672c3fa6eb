"""Shuffle-byte-rate probe for the wide-pair scaling question (8 -> 32
cores measured ~0.66 efficiency in round 3; hypothesis: the single host's
memory/shuffle bandwidth saturates, so more cores move no more bytes/sec).

Runs the same data-sized PageRank as tools/scaling_probe.py with Spark
EVENT LOGGING enabled, then parses the event log (public
SparkListenerTaskEnd JSON) to sum shuffle read/write bytes over the
superstep window and report measured bytes/sec at each core count.

Usage: python tools/shuffle_bytes_probe.py <cpus> <n_edges> [supersteps]
       [partitions] [codec] [input_parquet]
(``input_parquet``: read the edge table written by
tools/gen_scaling_graph.py instead of generating per leg.)
Prints ONE JSON line with wall time, shuffle bytes, and bytes/sec.
"""

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sbustreamspot_core_spark.config import GraphParams
from sbustreamspot_core_spark.graph.pagerank import pagerank
from sbustreamspot_core_spark.session import get_spark


def parse_event_log(log_dir: str) -> dict:
    sw = sr = srd = 0  # shuffle write bytes, remote read, local read
    task_time_ms = 0
    n_tasks = 0
    # Spark 4 writes rolling event-log DIRECTORIES
    # (eventlog_v2_<appid>/events_*); walk recursively
    paths = [p for p in glob.glob(os.path.join(log_dir, "**", "*"),
                                  recursive=True)
             if os.path.isfile(p) and "appstatus" not in os.path.basename(p)]
    for path in paths:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerTaskEnd":
                    continue
                m = ev.get("Task Metrics") or {}
                wm = m.get("Shuffle Write Metrics") or {}
                rm = m.get("Shuffle Read Metrics") or {}
                sw += wm.get("Shuffle Bytes Written", 0)
                sr += rm.get("Remote Bytes Read", 0)
                srd += rm.get("Local Bytes Read", 0)
                task_time_ms += m.get("Executor Run Time", 0)
                n_tasks += 1
    return {"shuffle_write_bytes": sw, "shuffle_read_bytes": sr + srd,
            "executor_task_ms": task_time_ms, "tasks": n_tasks}


def main():
    cpus = int(sys.argv[1])
    n_edges = int(sys.argv[2])
    supersteps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    partitions = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    codec = sys.argv[5] if len(sys.argv) > 5 else "lz4"
    input_parquet = sys.argv[6] if len(sys.argv) > 6 else None
    n_nodes = max(n_edges // 10, 1000)
    log_dir = tempfile.mkdtemp(prefix=f"evlog{cpus}_")
    spark = get_spark(
        f"shufbytes{cpus}", cpus=cpus, shuffle_partitions=partitions,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": log_dir,
            "spark.io.compression.codec": codec,
        })
    if input_parquet:
        graph = (spark.read.parquet(input_parquet)
                 .repartition(partitions).cache())
    else:
        r = spark.range(0, n_edges, 1, max(cpus, partitions))
        src = F.pmod(F.xxhash64(F.col("id")), n_nodes)
        dst = (F.when(F.pmod(F.xxhash64(F.col("id") + 1), 16) == 0, F.lit(0))
               .otherwise(F.pmod(F.xxhash64(F.col("id") * 31 + 7), n_nodes)))
        graph = (r.select(src.alias("src"), dst.alias("dst"))
                 .filter("src != dst").distinct().cache())
    real_edges = graph.count()
    t0 = time.time()
    res = pagerank(spark, graph, GraphParams(
        num_partitions=partitions, max_iters=supersteps, tol=0.0,
        checkpoint_interval=4, edges_distinct=True))
    res.ranks.count()
    total = time.time() - t0
    steps = [m["step_sec"] for m in res.metrics]
    tail = steps[1:] or steps           # supersteps=1: fall back to step 0
    steady = sorted(tail)[len(tail) // 2]
    spark.stop()        # flush the event log
    time.sleep(2)
    stats = parse_event_log(log_dir)
    print(json.dumps({
        "cpus": cpus, "partitions": partitions, "codec": codec,
        "edges": real_edges, "supersteps": supersteps,
        "total_sec": round(total, 2),
        "steady_step_sec": round(steady, 3),
        "edges_per_sec_steady": round(real_edges / steady, 1),
        **stats,
        "shuffle_mb_per_sec": round(
            (stats["shuffle_write_bytes"] + stats["shuffle_read_bytes"])
            / total / 1e6, 1),
    }))


if __name__ == "__main__":
    main()
