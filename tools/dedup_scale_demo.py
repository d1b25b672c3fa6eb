"""Dedup-at-scale demo: planted-variant corpus -> MinHash -> banded LSH ->
exact-Jaccard verification, at an arbitrary corpus size.

Extends the bench's dedup10x evidence (candidates/doc flat from 50k to
100k docs) by another order of magnitude: the claim under test is that the
banded design's candidate volume — and therefore its cost — is LINEAR in
corpus size, the property that carries it to 10^12 documents.

Usage: python tools/dedup_scale_demo.py [n_bases] [cpus] [skip_truth]
(n_bases * 10 = docs; default 100_000 bases = 1M docs.  skip_truth=1:
skip the exact truth-set pass — it DOMINATES cost beyond 1M docs (870 s
of the 1M run) — and estimate precision on a deterministic xxhash64
sample of ~200k candidate pairs instead of all of them; recall is then
reported as null, gated instead by flat cands_per_doc + sampled
precision.)
Prints ONE JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

from sbustreamspot_core_spark.operators.dedup import (
    exact_jaccard_for_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
)
from sbustreamspot_core_spark.session import get_spark
from sbustreamspot_core_spark.sources.docs import (
    generate_variant_docs,
    planted_near_dup_pairs,
)


def main():
    n_bases = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    skip_truth = len(sys.argv) > 3 and sys.argv[3] not in ("0", "")
    parts = max(cpus, n_bases // 2000)   # data-sized partitions
    spark = get_spark(f"dedup_scale_{n_bases}", cpus=cpus,
                      shuffle_partitions=parts)
    t0 = time.time()
    docs = generate_variant_docs(spark, n_bases=n_bases, variants=10,
                                 tokens_per_doc=100, mutate_tokens=10,
                                 num_partitions=parts).cache()
    n_docs = docs.count()
    t_gen = time.time() - t0

    t1 = time.time()
    sigs = minhash_signatures(docs, num_hashes=64, n=5).cache()
    sigs.count()
    t_sig = time.time() - t1

    t2 = time.time()
    cands = minhash_lsh_candidates(sigs, bands=16).cache()  # cap stays ON
    n_cands = cands.count()
    t_cand = time.time() - t2

    t3 = time.time()
    if skip_truth:
        # deterministic pair sample: ~200k of the candidates
        from pyspark.sql import functions as F
        n_mod = max(1, n_cands // 200_000)
        sample = cands.filter(
            F.pmod(F.xxhash64("id_a", "id_b"), F.lit(n_mod)) == 0).cache()
        n_sample = sample.count()
        tp = (exact_jaccard_for_pairs(docs, sample, n=5)
              .filter("jaccard >= 0.5").count())
        prec_denom = n_sample
        sample.unpersist()
    else:
        jac = exact_jaccard_for_pairs(docs, cands, n=5)
        tp = jac.filter("jaccard >= 0.5").count()
        prec_denom = n_cands
    t_ver = time.time() - t3

    if skip_truth:
        n_truth, recall, t_truth = None, None, 0.0
    else:
        t4 = time.time()
        truth = (exact_jaccard_for_pairs(docs, planted_near_dup_pairs(docs),
                                         n=5)
                 .filter("jaccard >= 0.5").select("id_a", "id_b").cache())
        n_truth = truth.count()
        found = truth.join(cands, ["id_a", "id_b"], "left_semi").count()
        recall = round(found / max(n_truth, 1), 4)
        t_truth = time.time() - t4

    print(json.dumps({
        "docs": n_docs, "bases": n_bases, "cpus": cpus, "partitions": parts,
        "candidates": n_cands,
        "cands_per_doc": round(n_cands / n_docs, 4),
        "true_pairs": n_truth,
        "precision": round(tp / max(prec_denom, 1), 4),
        "precision_sampled_pairs": prec_denom if skip_truth else None,
        "recall": recall,
        "gen_sec": round(t_gen, 1), "sig_sec": round(t_sig, 1),
        "cand_sec": round(t_cand, 1), "verify_sec": round(t_ver, 1),
        "truth_sec": round(t_truth, 1),
        "total_sec": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
