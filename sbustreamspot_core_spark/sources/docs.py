"""Deterministic synthetic document corpus with PLANTED near-duplicates.

Used by the dedup-at-scale demo and its precision/recall pins: every doc is
generated distributedly from pure JVM expressions (md5-expanded tokens over
``spark.range`` — no driver materialization, no RNG state), so the corpus
is reproducible at any size and the ground-truth duplicate structure is
known by construction:

- base ``b`` spawns ``variants`` docs, doc_id = b*variants + v;
- v = 0 is the original: tokens t_i = md5(b,i)[:8], i < tokens_per_doc;
- v in {1, 2} are NEAR-DUPLICATES: the last ``mutate_tokens * v`` tokens
  are replaced with variant-salted tokens (token-Jaccard ~ (T-mv)/(T+mv),
  i.e. ~0.82 / ~0.67 for the defaults — above any 0.5 near-dup threshold);
- v >= 3 are fully fresh token streams (Jaccard ~ 0 vs everything).

Cross-base pairs share no tokens (md5 streams), so the only true near-dup
pairs at threshold 0.5 are the within-base pairs among {v0, v1, v2}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_variant_docs(spark: SparkSession, n_bases: int,
                          variants: int = 10, tokens_per_doc: int = 100,
                          mutate_tokens: int = 10,
                          num_partitions: int = 32) -> DataFrame:
    """(doc_id long, base_id long, variant int, text string) — see module
    docstring for the planted structure."""
    ids = spark.range(0, n_bases * variants, 1, num_partitions).select(
        F.col("id").alias("doc_id"),
        (F.col("id") / variants).cast("long").alias("base_id"),
        F.pmod(F.col("id"), variants).cast("int").alias("variant"),
    )
    t = tokens_per_doc
    m = mutate_tokens
    # token i of doc: fresh stream for far variants (v>=3); tail-mutated for
    # near-dups (v in 1..2); pure base stream for v=0
    token = (
        f"CASE WHEN variant >= 3 THEN "
        f"  substring(md5(concat(base_id, '_f', variant, '_', i)), 1, 8) "
        f"WHEN variant > 0 AND i > {t} - {m} * variant THEN "
        f"  substring(md5(concat(base_id, '_n', variant, '_', i)), 1, 8) "
        f"ELSE substring(md5(concat(base_id, '_', i)), 1, 8) END"
    )
    text = F.expr(
        f"concat_ws(' ', transform(sequence(1, {t}), i -> {token}))")
    return ids.select("doc_id", "base_id", "variant", text.alias("text"))


def planted_near_dup_pairs(docs: DataFrame) -> DataFrame:
    """(id_a < id_b) ground-truth near-dup pairs: within-base pairs among
    variants {0, 1, 2}."""
    nd = docs.filter("variant <= 2").select("base_id",
                                            F.col("doc_id").alias("id"))
    a = nd.select("base_id", F.col("id").alias("id_a"))
    b = nd.select("base_id", F.col("id").alias("id_b"))
    return (a.join(b, "base_id").filter("id_a < id_b")
            .select("id_a", "id_b"))
