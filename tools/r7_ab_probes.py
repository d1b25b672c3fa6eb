"""Round-7 interleaved A/B probes (committed evidence for OPTIMIZATION_r07.md).

Each leg re-implements the ROUND-START plan inline (the library now ships
the optimized one) and interleaves it with the current implementation in
one session, so host-load drift hits both sides.  Emits JSONL with
loadavg per sample.

Usage: python tools/r7_ab_probes.py [reps] > tools/r7_ab_probes.jsonl
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sbustreamspot_core_spark.config import GraphParams
from sbustreamspot_core_spark.graph.pagerank import pagerank
from sbustreamspot_core_spark.graph.triangles import triangle_count
from sbustreamspot_core_spark.session import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EDGES = 2_000_000
N_NODES = N_EDGES // 10


def log(**kw):
    print(json.dumps({**kw, "loadavg": round(os.getloadavg()[0], 1)}),
          flush=True)


def old_triangle_count(graph) -> int:
    """Round-start plan: distinct orientation + wedge join + closure
    left_semi (verbatim from the pre-r7 graph/triangles.py)."""
    und = (graph.select(F.least("src", "dst").alias("u"),
                        F.greatest("src", "dst").alias("v"))
           .filter("u != v").distinct())
    deg = (und.select(F.col("u").alias("id")).unionByName(
        und.select(F.col("v").alias("id")))
        .groupBy("id").agg(F.count("*").alias("deg")))
    d_u = deg.select(F.col("id").alias("u"), F.col("deg").alias("deg_u"))
    d_v = deg.select(F.col("id").alias("v"), F.col("deg").alias("deg_v"))
    with_deg = und.join(d_u, "u").join(d_v, "v")
    lo_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v")))
    o = with_deg.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("hi")).cache()
    e1 = o.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = o.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    wedges = e1.join(e2, "a").filter(F.col("b") != F.col("c"))
    closing = o.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    n = wedges.join(closing, ["b", "c"], "left_semi").count()
    o.unpersist()
    return n


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("r7_ab", cpus=CPUS, shuffle_partitions=CPUS)
    r = spark.range(0, N_EDGES, 1, CPUS)
    src = F.pmod(F.xxhash64(F.col("id")), N_NODES)
    dst = F.when(F.pmod(F.xxhash64(F.col("id") + 1), 16) == 0, F.lit(0)) \
        .otherwise(F.pmod(F.xxhash64(F.col("id") * 31 + 7), N_NODES))
    graph = r.select(src.alias("src"), dst.alias("dst")) \
        .filter("src != dst").cache()
    graph.count()
    gp = GraphParams(num_partitions=CPUS, max_iters=5, tol=0.0,
                     checkpoint_interval=3)

    for rep in range(reps):
        # triangle: round-start vs current
        t0 = time.time()
        n_old = old_triangle_count(graph)
        log(probe="triangle", leg="round_start", rep=rep,
            sec=round(time.time() - t0, 3), triangles=n_old)
        t0 = time.time()
        n_new = triangle_count(spark, graph, GraphParams(num_partitions=CPUS))
        log(probe="triangle", leg="r7", rep=rep,
            sec=round(time.time() - t0, 3), triangles=n_new)
        assert n_old == n_new, (n_old, n_new)

        # objagg fallback threshold: 128 (spark default) vs session value
        session_thr = spark.conf.get(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
        for thr in ["128", session_thr]:
            spark.conf.set(
                "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
                thr)
            t0 = time.time()
            res = pagerank(spark, graph, gp)
            res.ranks.count()
            log(probe="pagerank_objagg", leg=f"thr_{thr}", rep=rep,
                sec=round(time.time() - t0, 3))
        spark.conf.set(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            session_thr)


if __name__ == "__main__":
    main()
