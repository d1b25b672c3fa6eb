"""Dedup CLI for spark-submit: MinHash-LSH near-duplicate detection over a
document parquet table, with optional exact-Jaccard verification and
connected-component duplicate clustering.

    spark-submit --driver-memory 4g \
        --py-files sbustreamspot_core_spark.zip jobs/run_dedup.py \
        --docs /path/documents.parquet --output /out \
        [--id-col doc_id] [--text-col text] [--mode minhash|exact|simhash] \
        [--num-hashes 64] [--bands 16] [--ngram 5] [--threshold 0.5] \
        [--verify] [--cluster] [--partitions 256]

Outputs parquet:
  <out>/candidates      (id_a, id_b[, jaccard if --verify])
  <out>/clusters        (id, dup_cluster)         with --cluster
  <out>/survivors       (digest, keep_id, dup_count)  mode=exact
and prints ONE JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sbustreamspot_core_spark.config import GraphParams
from sbustreamspot_core_spark.graph.components import connected_components
from sbustreamspot_core_spark.operators.dedup import (
    exact_dedup,
    exact_jaccard_for_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    simhash64,
    simhash_hamming_candidates,
)
from sbustreamspot_core_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser(description="near-duplicate detection on Spark")
    ap.add_argument("--docs", required=True, help="parquet of documents")
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--mode", choices=["minhash", "exact", "simhash"],
                    default="minhash")
    ap.add_argument("--num-hashes", type=int, default=64)
    ap.add_argument("--bands", type=int, default=16)
    ap.add_argument("--ngram", type=int, default=5)
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="exact-Jaccard near-dup threshold (with --verify)")
    ap.add_argument("--verify", action="store_true",
                    help="exact-Jaccard check on the candidate pairs")
    ap.add_argument("--cluster", action="store_true",
                    help="connected-component duplicate clusters")
    ap.add_argument("--hamming", type=int, default=3,
                    help="simhash near-dup Hamming radius")
    ap.add_argument("--partitions", type=int, default=None)
    args = ap.parse_args()

    spark = get_spark("dedup")
    n_part = args.partitions or spark.sparkContext.defaultParallelism
    docs = spark.read.parquet(args.docs)
    summary: dict = {"mode": args.mode, "docs": docs.count()}

    if args.mode == "exact":
        surv = exact_dedup(docs, args.id_col, args.text_col).cache()
        surv.write.mode("overwrite").parquet(f"{args.output}/survivors")
        summary["distinct_texts"] = surv.count()
        summary["duplicate_rows"] = summary["docs"] - summary["distinct_texts"]
        if args.cluster:
            # exact-dup clusters need no CC: the digest IS the cluster,
            # keep_id the canonical representative
            clusters = (
                docs.select(F.md5(F.col(args.text_col)).alias("digest"),
                            F.col(args.id_col).alias("id"))
                .join(surv, "digest")
                .select("id", F.col("keep_id").alias("dup_cluster")))
            clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
            summary["dup_clusters"] = summary["distinct_texts"]
        surv.unpersist()
        print(json.dumps(summary))
        return

    # hot-bucket star reduction: provably a no-op when the whole corpus is
    # smaller than the cap — skip the size-check pass in that case
    cap = 10_000 if summary["docs"] > 10_000 else None
    if args.mode == "simhash":
        sh = simhash64(docs, n=args.ngram, id_col=args.id_col,
                       text_col=args.text_col)
        cands = simhash_hamming_candidates(
            sh, radius=args.hamming, bands=max(4, args.hamming + 1),
            max_bucket_size=cap)
    else:
        sigs = minhash_signatures(docs, num_hashes=args.num_hashes,
                                  n=args.ngram, id_col=args.id_col,
                                  text_col=args.text_col)
        cands = minhash_lsh_candidates(sigs, bands=args.bands,
                                       max_bucket_size=cap)
    if args.verify:
        # exact n-gram Jaccard over the candidate set (works for both
        # minhash and simhash candidates; simhash's hamming column is
        # replaced by the verified jaccard)
        cands = (exact_jaccard_for_pairs(docs, cands.select("id_a", "id_b"),
                                         n=args.ngram, id_col=args.id_col,
                                         text_col=args.text_col)
                 .filter(F.col("jaccard") >= args.threshold))

    cands = cands.cache()
    summary["candidate_pairs"] = cands.count()
    cands.write.mode("overwrite").parquet(f"{args.output}/candidates")

    if args.cluster:
        res = connected_components(
            spark, cands.select(F.col("id_a").alias("src"),
                                F.col("id_b").alias("dst")),
            params=GraphParams(num_partitions=n_part, checkpoint_interval=3))
        clusters = res.components.withColumnRenamed("component", "dup_cluster")
        clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
        summary["dup_clusters"] = clusters.select(
            "dup_cluster").distinct().count()
        summary["cc_supersteps"] = res.supersteps
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
