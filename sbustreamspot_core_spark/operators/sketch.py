"""StreamHash sketch construction — Arrow-vectorized, two-stage.

Stage 1 hashes each *distinct* chunk string once with all L hash functions
(mapInPandas, numpy batch matmul) — the reference hashes every (chunk, graph)
occurrence (streamhash.cpp:28-34); hashing the distinct vocabulary and joining
is algebraically identical and removes the dominant redundant work at scale
(the chunk vocabulary is tiny relative to the edge count: it is bounded by the
type-alphabet combinatorics, not by |E|).

Stage 2 aggregates per graph: projection = sum(count * chunk_bits) via
applyInPandas (grouped numpy dot), then sketch = sign(projection)
(streamhash.cpp:36-38) and LSH band values (cluster.cpp:23-42).

SimHash (simhash.cpp:16-32, main.cpp:607-646) is provided for parity; it
requires the dense global shingle dictionary (graph.cpp:204-209).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import StreamSpotParams
from ..functions.hashing import hashmulti_batch
from ..functions.sketches import band_values, pack_sketch, sketch_bytes_to_bits
from ..rng import allocate_random_bits, construct_random_vectors

SKETCH_SCHEMA = "gid long, projection array<long>, sketch binary, bands array<long>"


def hash_chunk_vocabulary(chunk_counts: DataFrame, params: StreamSpotParams) -> DataFrame:
    """(chunk, bits binary) — each distinct chunk hashed to L signs of +/-1,
    serialized as L int8 bytes."""
    H = allocate_random_bits(params.L, params.chunk_length, params.seed)

    def hash_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            chunks = pdf["chunk"].tolist()
            bits = hashmulti_batch(chunks, H)  # (n, L) int8 of +/-1
            yield pd.DataFrame({
                "chunk": chunks,
                "bits": [bits[i].tobytes() for i in range(len(chunks))],
            })

    vocab = chunk_counts.select("chunk").distinct()
    return vocab.mapInPandas(hash_batches, schema="chunk string, bits binary")


# per-executor-process memo for inline hashing: chunk -> (L,) int8 signs.
# Safe: pure function of (chunk, H) and H is fixed per job via closure capture.
_HASH_MEMO: dict[str, "np.ndarray"] = {}
_HASH_MEMO_CAP = 1_000_000


def build_sketches(chunk_counts: DataFrame, params: StreamSpotParams,
                   broadcast_vocab: bool = True,
                   mode: str = "inline",
                   extra_group_cols: dict[str, str] | None = None) -> DataFrame:
    """(gid, projection, sketch, bands) from the (gid, chunk, cnt) table.

    mode="inline" (default): one applyInPandas pass; each worker hashes the
    chunks it sees with a per-process memo.  Fewest stages — right when the
    chunk vocabulary is small (type-alphabet bounded) or the input pipeline
    is expensive to recompute.

    mode="join": hash the distinct vocabulary once and broadcast-join
    (streamhash.cpp:28-34 done once per distinct chunk) — right when the
    vocabulary is huge relative to worker memo capacity.

    extra_group_cols: {name: spark_ddl_type} columns that extend the group
    key beyond gid and pass through to the output (e.g. an event-time
    window start for the streaming pipeline) — one distributed pass for
    all windows instead of a driver loop per window.
    """
    L, B, R = params.L, params.B, params.R
    extra = dict(extra_group_cols or {})
    group_keys = [*extra.keys(), "gid"]
    out_schema = "".join(f"{k} {v}, " for k, v in extra.items()) + SKETCH_SCHEMA

    def _passthrough(pdf: pd.DataFrame) -> dict:
        return {k: [pdf[k].iloc[0]] for k in extra}

    if mode == "join":
        vocab = hash_chunk_vocabulary(chunk_counts, params)
        if broadcast_vocab:
            vocab = F.broadcast(vocab)
        joined = chunk_counts.join(vocab, "chunk")

        def per_graph(pdf: pd.DataFrame) -> pd.DataFrame:
            bits = np.frombuffer(b"".join(pdf["bits"]), dtype=np.int8).reshape(len(pdf), L)
            counts = pdf["cnt"].to_numpy(dtype=np.int64)
            projection = counts @ bits.astype(np.int64)          # (L,)
            sketch_bits = (projection >= 0).astype(np.uint8)[None, :]
            return pd.DataFrame({
                **_passthrough(pdf),
                "gid": [int(pdf["gid"].iloc[0])],
                "projection": [projection.tolist()],
                "sketch": [pack_sketch(sketch_bits)[0].tobytes()],
                "bands": [band_values(sketch_bits, B, R)[0].tolist()],
            })

        return joined.groupBy(*group_keys).applyInPandas(
            per_graph, schema=out_schema)

    H = allocate_random_bits(params.L, params.chunk_length, params.seed)

    def per_graph_inline(pdf: pd.DataFrame) -> pd.DataFrame:
        chunks = pdf["chunk"].tolist()
        missing = [c for c in chunks if c not in _HASH_MEMO]
        if missing:
            fresh = hashmulti_batch(missing, H)
            if len(_HASH_MEMO) + len(missing) > _HASH_MEMO_CAP:
                _HASH_MEMO.clear()
            for i, c in enumerate(missing):
                _HASH_MEMO[c] = fresh[i]
        bits = np.stack([_HASH_MEMO[c] for c in chunks])
        counts = pdf["cnt"].to_numpy(dtype=np.int64)
        projection = counts @ bits.astype(np.int64)
        sketch_bits = (projection >= 0).astype(np.uint8)[None, :]
        return pd.DataFrame({
            **_passthrough(pdf),
            "gid": [int(pdf["gid"].iloc[0])],
            "projection": [projection.tolist()],
            "sketch": [pack_sketch(sketch_bits)[0].tobytes()],
            "bands": [band_values(sketch_bits, B, R)[0].tolist()],
        })

    return chunk_counts.groupBy(*group_keys).applyInPandas(
        per_graph_inline, schema=out_schema)


def sketch_bands(sketches: DataFrame, params: StreamSpotParams) -> DataFrame:
    """Exploded LSH band table: (gid, band_idx, band_val) (cluster.cpp:23-42)."""
    return sketches.select(
        "gid", F.posexplode("bands").alias("band_idx", "band_val")
    )


def build_simhash_sketches(chunk_counts: DataFrame, params: StreamSpotParams,
                           max_vocab: int = 100_000) -> DataFrame:
    """SimHash parity path: dense shingle dictionary + random +/-1 vectors.

    Dictionary ids are assigned by sorted chunk order (deterministic across
    partitionings); the reference assigns ids by unordered-set iteration order
    (graph.cpp:204-209), which is equally arbitrary but not portable.

    This path collects the chunk vocabulary to the driver and broadcasts a
    dense (L x |vocab|) matrix — correct ONLY for bounded type-alphabet
    vocabularies (StreamSpot's case).  ``max_vocab`` fails fast when pointed
    at open-text shingles; use ``dedup.simhash64`` (streaming 64-bit SimHash,
    no dictionary) or ``build_sketches`` (StreamHash) there instead.
    """
    L, B, R = params.L, params.B, params.R
    n_vocab = chunk_counts.select("chunk").distinct().count()
    if n_vocab > max_vocab:
        raise ValueError(
            f"build_simhash_sketches: vocabulary {n_vocab} exceeds max_vocab="
            f"{max_vocab}; the dense dictionary path is for bounded "
            "type-alphabet vocabularies only — use dedup.simhash64 or "
            "sketch.build_sketches for open-text shingles")
    vocab = [r["chunk"] for r in chunk_counts.select("chunk").distinct().collect()]
    vocab.sort()
    vocab_idx = {c: i for i, c in enumerate(vocab)}
    rv = construct_random_vectors(L, len(vocab), params.seed)  # (L, |S|) +/-1
    spark = chunk_counts.sparkSession
    b_idx = spark.sparkContext.broadcast(vocab_idx)
    b_rv = spark.sparkContext.broadcast(rv)

    def per_graph(pdf: pd.DataFrame) -> pd.DataFrame:
        idx = b_idx.value
        rvs = b_rv.value
        sv = np.zeros(len(idx), dtype=np.int64)
        for chunk, cnt in zip(pdf["chunk"], pdf["cnt"]):
            sv[idx[chunk]] = cnt
        projection = rvs.astype(np.int64) @ sv               # (L,)
        bits = (projection >= 0).astype(np.uint8)[None, :]
        return pd.DataFrame({
            "gid": [int(pdf["gid"].iloc[0])],
            "projection": [projection.tolist()],
            "sketch": [pack_sketch(bits)[0].tobytes()],
            "bands": [band_values(bits, B, R)[0].tolist()],
        })

    return chunk_counts.groupBy("gid").applyInPandas(per_graph, schema=SKETCH_SCHEMA)


def sketch_similarity_udf(L: int):
    """pandas UDF: StreamHash similarity between two packed-sketch columns
    (streamhash.cpp:17-20): fraction of equal bits."""

    @F.pandas_udf("double")
    def sim(a: pd.Series, b: pd.Series) -> pd.Series:
        bits_a = sketch_bytes_to_bits(a.tolist(), L)
        bits_b = sketch_bytes_to_bits(b.tolist(), L)
        return pd.Series(1.0 - (bits_a != bits_b).sum(axis=1) / float(L))

    return sim
