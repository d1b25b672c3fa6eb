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

minhash/simhash modes collapse EXACT duplicates before LSH (one
representative per text digest): identical texts band identically, so
exact-dup mass is the dominant source of degenerate hot buckets, and since
Jaccard/SimHash are pure functions of text, collapsed docs inherit their
representative's near-dup relations exactly — candidates are emitted
between representatives, and --cluster re-attaches (rep, dup) edges before
connected components.  When the distinct-text corpus still exceeds the
hot-bucket cap, the summary reports star_hot_buckets / star_hot_frac (the
share of banded rows whose bucket was star-reduced) so any pair-level
degradation is visible rather than silent; with --verify, a nonzero hot
fraction DISABLES the cap (summary: star_cap_disabled) because the exact-
Jaccard threshold post-filters pairs — the consumer shape the star
reduction's contract forbids.
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
    minhash_bands,
    minhash_lsh_candidates,
    minhash_signatures,
    simhash64,
    simhash_bands,
    simhash_hamming_candidates,
    star_reduction_stats,
)
from sbustreamspot_core_spark.session import get_spark


def _verify_safe_cap(args, cap, summary: dict):
    """With --verify, candidates are POST-FILTERED on exact Jaccard — the
    one consumer shape the star reduction's pair contract forbids (a hot
    bucket's hub-member pair can fail the threshold while member-member
    pairs would have passed, silently losing recall in the candidates
    output AND any clusters built from it).  When the measured hot-bucket
    mass is nonzero, disable the cap so the pair set is exact; the summary
    records the decision.  Exact duplicates were already collapsed, so a
    residual hot bucket means >cap DISTINCT texts banding identically —
    rare, and correctness beats the bounded-fan-out knob here."""
    if args.verify and summary.get("star_hot_frac", 0) > 0:
        summary["star_cap_disabled"] = True
        return None
    return cap


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

    # Collapse exact duplicates BEFORE near-dup LSH: identical texts band
    # identically, so exact-dup mass is the dominant source of degenerate
    # (hot) LSH buckets — and Jaccard is a pure function of text, so every
    # doc inherits its digest-representative's near-dup relations exactly.
    # LSH/verify then run over DISTINCT texts only (less work, no recall
    # loss), and clustering re-attaches the (rep, dup) edges, making the
    # output pair-EXACT up to text equality instead of cluster-approximate
    # under the hot-bucket star reduction.
    digests = docs.select(F.col(args.id_col).alias("_id"),
                          F.md5(F.col(args.text_col)).alias("_digest"))
    reps = digests.groupBy("_digest").agg(F.min("_id").alias("_rep"))
    exact_edges = (digests.join(reps.hint("shuffle_hash"), "_digest")
                   .filter(F.col("_id") != F.col("_rep"))
                   .select(F.col("_rep").alias("id_a"),
                           F.col("_id").alias("id_b")))
    rep_docs = docs.join(
        reps.select(F.col("_rep").alias(args.id_col)), args.id_col, "left_semi")
    summary["distinct_texts"] = rep_docs.count()
    summary["exact_dup_edges"] = summary["docs"] - summary["distinct_texts"]

    # hot-bucket star reduction: provably a no-op when the distinct-text
    # corpus is smaller than the cap — skip the size-check pass in that
    # case.  When the cap CAN engage, report how much candidate mass it
    # star-reduces (operators/dedup.py:star_reduction_stats semantics) so
    # the pair-level degradation is visible in the summary, never silent.
    cap = 10_000 if summary["distinct_texts"] > 10_000 else None
    cached_inputs = []
    if args.mode == "simhash":
        sh = simhash64(rep_docs, n=args.ngram, id_col=args.id_col,
                       text_col=args.text_col)
        n_bands = max(4, args.hamming + 1)
        if cap is not None:
            # signature construction dominates; cache it so the stats pass
            # and the candidate join share ONE computation
            sh = sh.cache()
            cached_inputs.append(sh)
            stats = star_reduction_stats(
                simhash_bands(sh, args.hamming, n_bands),
                ["band_idx", "band_val"], cap).first()
            summary["star_hot_buckets"] = stats["hot_buckets"]
            summary["star_hot_frac"] = round(stats["hot_frac"] or 0.0, 6)
            cap = _verify_safe_cap(args, cap, summary)
        cands = simhash_hamming_candidates(
            sh, radius=args.hamming, bands=n_bands, max_bucket_size=cap)
    else:
        sigs = minhash_signatures(rep_docs, num_hashes=args.num_hashes,
                                  n=args.ngram, id_col=args.id_col,
                                  text_col=args.text_col)
        if cap is not None:
            sigs = sigs.cache()
            cached_inputs.append(sigs)
            stats = star_reduction_stats(
                minhash_bands(sigs, args.bands),
                ["band_idx", "band_key"], cap).first()
            summary["star_hot_buckets"] = stats["hot_buckets"]
            summary["star_hot_frac"] = round(stats["hot_frac"] or 0.0, 6)
            cap = _verify_safe_cap(args, cap, summary)
        cands = minhash_lsh_candidates(sigs, bands=args.bands,
                                       max_bucket_size=cap)
    if args.verify:
        # exact n-gram Jaccard over the candidate set (works for both
        # minhash and simhash candidates; simhash's hamming column is
        # replaced by the verified jaccard).  Only representative texts
        # participate — every collapsed duplicate inherits its rep's
        # verified relations exactly.
        cands = (exact_jaccard_for_pairs(rep_docs,
                                         cands.select("id_a", "id_b"),
                                         n=args.ngram, id_col=args.id_col,
                                         text_col=args.text_col)
                 .filter(F.col("jaccard") >= args.threshold))

    cands = cands.cache()
    summary["candidate_pairs"] = cands.count()
    for df in cached_inputs:
        df.unpersist()
    cands.write.mode("overwrite").parquet(f"{args.output}/candidates")

    if args.cluster:
        # near-dup relations between representatives + (rep, dup) edges for
        # the collapsed exact duplicates = the same connectivity the
        # uncollapsed pair graph would have produced
        edges = (cands.select("id_a", "id_b")
                 .unionByName(exact_edges))
        res = connected_components(
            spark, edges.select(F.col("id_a").alias("src"),
                                F.col("id_b").alias("dst")),
            params=GraphParams(num_partitions=n_part, checkpoint_interval=3,
                               small_graph_threshold=65536))
        clusters = res.components.withColumnRenamed("component", "dup_cluster")
        clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
        summary["dup_clusters"] = clusters.select(
            "dup_cluster").distinct().count()
        summary["cc_supersteps"] = res.supersteps
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
