"""ANN-at-scale demo: multi-table hyperplane LSH vs brute-force ground
truth on a deterministically generated vector corpus.

Usage: python tools/ann_demo.py [n_vectors] [n_queries] [cpus]

Vectors are generated JVM-side (xxhash64-derived components — no driver
materialization, reproducible at any size) with CLUSTERED structure:
``n_vectors/100`` cluster centers, each vector = its center + 20% uniform
noise, matching how real embedding corpora behave (uniform-random vectors
are hyperplane LSH's provable worst case — every neighbor sits near 60
degrees, where bucket-collision probability vanishes — and no production
ANN corpus looks like that).  Ground truth = exact cosine top-10 for a
query sample; the LSH path must reach recall@10 >= 0.9 while touching only
bucket-equality candidates.  Prints ONE JSON line.
"""

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sbustreamspot_core_spark.operators.ann import (
    brute_force_topk,
    lsh_topk_multi,
)
from sbustreamspot_core_spark.session import get_spark

DIM = 64


def main():
    n_vectors = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark(f"ann{cpus}", cpus=cpus, shuffle_partitions=cpus)

    # clustered corpus, pure JVM: center(cluster, j) + 0.2 * noise(id, j),
    # both uniform [-1, 1) from xxhash64
    n_clusters = max(n_vectors // 100, 1)
    vec = F.expr(
        f"transform(sequence(0, {DIM - 1}), j -> "
        f"(pmod(xxhash64((id % {n_clusters}) * {DIM} + j), 2000001)"
        f"   - 1000000) / 1.0e6 "
        f"+ 0.2 * (pmod(xxhash64(id * {DIM} + j + 777), 2000001)"
        f"   - 1000000) / 1.0e6)")
    vectors = (
        spark.range(0, n_vectors, 1, cpus)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .cache())
    vectors.count()
    queries = vectors.filter(f"vec_id % {n_vectors // n_queries} = 0").cache()
    nq = queries.count()

    t0 = time.time()
    exact = {}
    for r in brute_force_topk(vectors, queries, k=10).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    brute_sec = round(time.time() - t0, 2)

    t0 = time.time()
    approx = {}
    n_planes, n_tables = 14, 8
    for r in lsh_topk_multi(vectors, queries, k=10, n_planes=n_planes,
                            n_tables=n_tables).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    lsh_sec = round(time.time() - t0, 2)

    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    recall = round(hits / total, 4)
    print(json.dumps({
        "n_vectors": n_vectors, "n_queries": nq, "dim": DIM,
        "n_planes": n_planes, "n_tables": n_tables,
        "brute_force_sec": brute_sec, "lsh_sec": lsh_sec,
        "speedup": round(brute_sec / max(lsh_sec, 1e-9), 2),
        "recall_at_10": recall,
    }))


if __name__ == "__main__":
    main()
