"""Hot-bucket clustering at a scale where the quadratic pair graph is
infeasible: N near-identical docs (every doc shares every LSH bucket).

The full co-bucket self-join emits ~N^2/2 pairs through ONE task (a
same-key self-join cannot be split) — at N=100k that is 5e9 pairs before
CC even starts.  ``bucket_star_edges`` emits at most one edge per band
row (O(N*bands)), and the tiny derived graph then takes the driver
union-find fast path; the whole clustering is seconds, with cluster
output verified (one cluster holding all N docs).

Usage: python tools/star_clusters_demo.py [n_docs]
Appends one JSON line to tools/r5_star_clusters.jsonl.
"""
import json
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")
from sbustreamspot_core_spark.session import get_spark          # noqa: E402
from sbustreamspot_core_spark.config import GraphParams         # noqa: E402
from sbustreamspot_core_spark.graph.components import (         # noqa: E402
    connected_components)
from sbustreamspot_core_spark.operators.dedup import (          # noqa: E402
    build_dedup_index)
from sbustreamspot_core_spark.operators.lsh import (            # noqa: E402
    bucket_star_edges)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("star-clusters-demo")

    # identical text -> identical signatures -> every doc in every bucket
    docs = spark.range(0, n_docs, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.lit("the quick brown fox jumps over the lazy dog again and "
              "again in an endlessly repeated web boilerplate footer")
        .alias("text"))

    t0 = time.monotonic()
    bands = build_dedup_index(docs, num_hashes=64, n=5, bands=16,
                              id_col="doc_id", text_col="text")
    edges = bucket_star_edges(bands, ["band_idx", "band_key"],
                              id_col="id").cache()
    n_edges = edges.count()
    t_edges = time.monotonic() - t0

    t0 = time.monotonic()
    res = connected_components(
        spark, edges,
        nodes=docs.select(F.col("doc_id").alias("id")),
        params=GraphParams(num_partitions=32, checkpoint_interval=3,
                           small_graph_threshold=4_000_000))
    n_clusters = res.components.select("component").distinct().count()
    sizes = res.components.groupBy("component").count().collect()
    t_cc = time.monotonic() - t0
    assert n_clusters == 1 and sizes[0]["count"] == n_docs

    rec = {"n_docs": n_docs, "star_edges": n_edges,
           "quadratic_pairs_avoided": n_docs * (n_docs - 1) // 2,
           "edges_sec": round(t_edges, 2), "cc_sec": round(t_cc, 2),
           "cc_mode": res.metrics[0].get("mode", "distributed"),
           "clusters": n_clusters}
    print(json.dumps(rec))
    with open("/root/repo/tools/r5_star_clusters.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    edges.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
