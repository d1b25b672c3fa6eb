"""Incremental (append-only) dedup demo: cost must track the NEW batch,
not the corpus.

Scenario mirrored from a production training-data pipeline: a signature
index over the existing corpus is persisted once; each incoming batch is
deduped against it (new-new self-join + new-index bucket equi-join via
``incremental_dedup_batch``) without recomputing corpus signatures.

Evidence produced (ONE JSON line per index size + a summary line):
- t_batch for the SAME fixed-size new batch against growing indexes —
  flat t_batch while the index grows ~3x is the claim under test;
- a full-recompute leg (signatures + banded LSH over index+batch
  together) at the largest corpus for the direct cost comparison;
- planted precision/recall restricted to pairs involving new docs, so
  the fast path is shown to find the same near-dups the batch pipeline
  would.

Corpus split (sources/docs.py planted-variant corpus; variants {0,1,2}
are the planted near-dups): the new batch is variants {1,2} of the first
``new_bases`` bases (fixed size 2*new_bases docs); the index holds every
other doc.  New-new truth pairs: (v1,v2) per base; new-index: (v0,v1),
(v0,v2).

Usage: python tools/incremental_dedup_demo.py [new_bases] [cpus]
       [total_bases_csv]
Defaults: 50_000 new bases (100k-doc batch), cpus 32,
          total bases 50k,80k,125k (index 400k/700k/1.15M docs).
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sbustreamspot_core_spark.operators.dedup import (
    build_dedup_index,
    exact_jaccard_for_pairs,
    incremental_dedup_batch,
    minhash_lsh_candidates,
    minhash_signatures,
)
from sbustreamspot_core_spark.session import get_spark
from sbustreamspot_core_spark.sources.docs import generate_variant_docs

TOKENS = 100
MUTATE = 10


def main():
    new_bases = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sizes = ([int(x) for x in sys.argv[3].split(",")] if len(sys.argv) > 3
             else [50_000, 80_000, 125_000])
    results = []
    for n_bases in sizes:
        parts = max(cpus, n_bases // 2000)
        spark = get_spark(f"incdedup_{n_bases}", cpus=cpus,
                          shuffle_partitions=parts)
        docs = generate_variant_docs(spark, n_bases=n_bases, variants=10,
                                     tokens_per_doc=TOKENS,
                                     mutate_tokens=MUTATE,
                                     num_partitions=parts).cache()
        is_new = (F.col("base_id") < new_bases) & F.col("variant").isin(1, 2)
        index_docs = docs.filter(~is_new)
        new_docs = docs.filter(is_new).cache()
        n_new = new_docs.count()

        workdir = tempfile.mkdtemp(prefix=f"incidx_{n_bases}_")
        index_path = os.path.join(workdir, "bands")
        t0 = time.time()
        build_dedup_index(index_docs, num_hashes=64, n=5, bands=16) \
            .write.parquet(index_path)
        n_index = index_docs.count()
        t_index = time.time() - t0

        t1 = time.time()
        cands = incremental_dedup_batch(spark, index_path, new_docs,
                                        num_hashes=64, n=5, bands=16,
                                        append=False)
        n_cands = cands.count()          # already materialized; cheap
        t_batch = time.time() - t1

        # planted truth restricted to pairs involving >= 1 new doc
        nd = (docs.filter((F.col("base_id") < new_bases)
                          & (F.col("variant") <= 2))
              .select("base_id", "doc_id", "variant"))
        a = nd.select("base_id", F.col("doc_id").alias("id_a"),
                      F.col("variant").alias("va"))
        b = nd.select("base_id", F.col("doc_id").alias("id_b"),
                      F.col("variant").alias("vb"))
        planted = (a.join(b, "base_id").filter("id_a < id_b")
                   .filter((F.col("va") >= 1) | (F.col("vb") >= 1))
                   .select("id_a", "id_b"))
        truth = (exact_jaccard_for_pairs(docs, planted, n=5)
                 .filter("jaccard >= 0.5").select("id_a", "id_b").cache())
        n_truth = truth.count()
        found = truth.join(cands, ["id_a", "id_b"], "left_semi").count()
        tp = (exact_jaccard_for_pairs(docs, cands, n=5)
              .filter("jaccard >= 0.5").count())

        row = {
            "total_docs": n_index + n_new, "index_docs": n_index,
            "new_docs": n_new, "cpus": cpus, "partitions": parts,
            "index_build_sec": round(t_index, 1),
            "batch_sec": round(t_batch, 1),
            "candidates": n_cands,
            "cands_per_new_doc": round(n_cands / max(n_new, 1), 4),
            "new_truth_pairs": n_truth,
            "precision": round(tp / max(n_cands, 1), 4),
            "recall": round(found / max(n_truth, 1), 4),
        }
        if n_bases == max(sizes):
            # full-recompute comparison leg: signatures + banded LSH over
            # the whole corpus, the cost the incremental path avoids
            t2 = time.time()
            sigs = minhash_signatures(docs, num_hashes=64, n=5)
            minhash_lsh_candidates(sigs, bands=16).count()
            row["full_recompute_sec"] = round(time.time() - t2, 1)
        print(json.dumps(row), flush=True)
        results.append(row)
        cands.unpersist()
        truth.unpersist()
        docs.unpersist()
        new_docs.unpersist()
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()
        time.sleep(2)

    batches = [r["batch_sec"] for r in results]
    print(json.dumps({
        "summary": "incremental_dedup",
        "index_sizes": [r["index_docs"] for r in results],
        "batch_secs": batches,
        "batch_flatness": round(max(batches) / max(min(batches), 0.1), 2),
        "full_recompute_sec": results[-1].get("full_recompute_sec"),
        "speedup_vs_full": round(
            results[-1].get("full_recompute_sec", 0)
            / max(results[-1]["batch_sec"], 0.1), 1),
    }))


if __name__ == "__main__":
    main()
