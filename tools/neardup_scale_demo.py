"""Embedding near-dup at scale: cosine_neardup_pairs_lsh on a 200k-vector
corpus with planted near-parallel duplicates, plus the plane-sizing math
that keeps the bucket self-join out of its degenerate regime.

Addresses the round-3 advisory head-on: the operator's recall was only
pinned at 400 vectors, and an under-sized n_planes (the old default 8 =
256 buckets/table) makes bucket occupancy — and the self-join's pair
fan-out — explode at exactly the corpus sizes the engine targets.  This
demo (a) PREDICTS the candidate volume for several n_planes from bucket
occupancy alone (cheap aggregation, no join), (b) runs the operator
end-to-end at the prediction-chosen size, and (c) measures planted-pair
recall and wall time.

For a SELF-join consumer, size planes by pair budget (expected pairs ~=
n * avg_bucket / 2 * n_tables), i.e. target_bucket ~ 64, not the top-k
default of 1024 — `recommended_n_planes(n, target_bucket=64)`.

Usage: python tools/neardup_scale_demo.py [n_vectors] [n_planted] [cpus]
Prints ONE JSON line.
"""

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sbustreamspot_core_spark.operators.ann import (
    cosine_neardup_pairs_lsh,
    hyperplane_signatures_multi,
    recommended_n_planes,
)
from sbustreamspot_core_spark.session import get_spark

DIM = 64


def main():
    n_vectors = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_planted = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark(f"neardup{cpus}", cpus=cpus, shuffle_partitions=cpus)

    # uniform corpus (near-dups occur only where planted), pure JVM
    vec = F.expr(
        f"transform(sequence(0, {DIM - 1}), j -> "
        f"(pmod(xxhash64(id * {DIM} + j), 2000001) - 1000000) / 1.0e6)")
    base = spark.range(0, n_vectors, 1, cpus).select(
        F.col("id").alias("vec_id"), vec.alias("embedding"))
    planted = base.filter(f"vec_id < {n_planted}").select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.expr("transform(embedding, x -> x * 1.02 + 0.001)")
        .alias("embedding"))
    corpus = base.unionByName(planted).cache()
    n_total = corpus.count()

    # (a) occupancy -> predicted pair volume per candidate n_planes
    predictions = {}
    for p in (8, recommended_n_planes(n_total, target_bucket=64)):
        sig = hyperplane_signatures_multi(corpus, n_planes=p, n_tables=4)
        occ = (sig.groupBy("table", "bucket").agg(F.count("*").alias("n"))
               .agg(F.sum(F.expr("n * (n - 1) / 2")).alias("pairs"),
                    F.max("n").alias("max_bucket")).first())
        predictions[p] = {"predicted_pairs": int(occ["pairs"]),
                          "max_bucket": int(occ["max_bucket"])}
    sized = recommended_n_planes(n_total, target_bucket=64)

    # (b) run the operator end-to-end at the chosen size
    t0 = time.time()
    pairs = cosine_neardup_pairs_lsh(
        corpus, threshold=0.98, n_planes=sized, n_tables=4).cache()
    n_pairs = pairs.count()
    wall = time.time() - t0

    # (c) planted-pair recall: (i, i + 10^7) for i < n_planted
    truth = spark.range(0, n_planted).select(
        F.col("id").alias("id_a"),
        (F.col("id") + 10_000_000).alias("id_b"))
    found = truth.join(pairs, ["id_a", "id_b"], "left_semi").count()

    print(json.dumps({
        "vectors": n_total, "planted": n_planted, "cpus": cpus,
        "plane_predictions": predictions,
        "n_planes_used": sized,
        "neardup_pairs": n_pairs,
        "recall": round(found / n_planted, 4),
        "wall_sec": round(wall, 1),
    }))


if __name__ == "__main__":
    main()
