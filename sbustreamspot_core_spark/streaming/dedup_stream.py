"""Streaming incremental dedup: continuous append-only near-duplicate
detection against a persisted signature index.

Each micro-batch of documents is deduped against every PREVIOUS batch
without recomputing their signatures (operators/dedup.py's incremental
path: new-new banded self-join + new-index bucket equi-join), then its
own bands are appended to the index.  This is the streaming face of the
train-then-stream split the reference runs offline (io.cpp:100-110 loads
the bootstrap state once; main.cpp:322-431 streams against it) applied to
the LLM-pipeline dedup operator set.

Exactly-once under epoch replay, with the same epoch-directory-overwrite
idempotence as ``windowed_pipeline``:

- candidate pairs for epoch N overwrite ``out/epoch=N``;
- the batch's band rows overwrite ``index/epoch=N`` — an epoch OWNS its
  index partition, so a replayed epoch cannot double-append bands;
- when computing epoch N, index partitions ``epoch != N`` are read, so a
  half-replayed epoch never joins against its own rows;
- candidates are deterministic in (index content, batch content), so a
  replay reproduces byte-identical pairs before overwriting them.

Why this shape scales to 100 TB: corpus signatures are computed exactly
once (when their batch arrives); an epoch costs signature build over the
NEW docs plus one columnar scan of the band index for the bucket
equi-join.  At warehouse scale the index partitions would be bucketed by
(band_idx, band_key) so the index side of the join never shuffles; the
per-epoch driver work is O(1) Spark actions, never per-doc.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    banded_self_join_pairs,
    build_dedup_index,
    incremental_lsh_candidates,
    is_path_not_found,
)

PAIRS_SCHEMA = "id_a long, id_b long"
BANDS_SCHEMA = "id long, band_idx int, band_key string"


class StreamingDedupPipeline:
    """foreachBatch pipeline: docs stream (doc_id, text) -> per-epoch
    candidate pairs in ``out_dir/epoch=N`` + a growing band index in
    ``index_dir/epoch=N``."""

    def __init__(self, spark: SparkSession, out_dir: str, index_dir: str,
                 num_hashes: int = 64, n: int = 5, bands: int = 16,
                 max_bucket_size: int | None = None,
                 fault_at_epoch: int | None = None):
        self.spark = spark
        self.out_dir = out_dir
        self.index_dir = index_dir
        self.num_hashes = num_hashes
        self.n = n
        self.bands = bands
        self.max_bucket_size = max_bucket_size
        # test hook: raise AFTER the pairs write but BEFORE the index
        # append (the commit gap unique to this two-sink pipeline)
        self.fault_at_epoch = fault_at_epoch
        self.epochs_processed: list[int] = []

    def _read_index_except(self, epoch_id: int) -> DataFrame | None:
        try:
            idx = (self.spark.read.option("basePath", self.index_dir)
                   .schema(BANDS_SCHEMA + ", epoch long")
                   .parquet(os.path.join(self.index_dir, "epoch=*")))
        except Exception as e:  # noqa: BLE001 — re-raised unless missing
            # only the first-epoch missing-path case means "no index";
            # any other failure must abort the epoch — completing it with
            # a None index would commit an epoch whose cross-epoch pairs
            # are silently missing, permanently breaking the cumulative-
            # equivalence contract (no later epoch re-pairs those docs)
            if not is_path_not_found(e):
                raise
            return None
        return idx.filter(F.col("epoch") != epoch_id).drop("epoch")

    def _process(self, batch_df: DataFrame, epoch_id: int) -> None:
        new_bands = build_dedup_index(
            batch_df.select("doc_id", "text"), num_hashes=self.num_hashes,
            n=self.n, bands=self.bands).cache()
        index = self._read_index_except(epoch_id)
        if index is None:
            cands = banded_self_join_pairs(
                new_bands, ["band_idx", "band_key"],
                max_bucket_size=self.max_bucket_size)
        else:
            cands = incremental_lsh_candidates(
                index, new_bands, max_bucket_size=self.max_bucket_size)
        (cands.write.mode("overwrite")
            .parquet(os.path.join(self.out_dir, f"epoch={epoch_id}")))
        if self.fault_at_epoch is not None and epoch_id == self.fault_at_epoch:
            self.fault_at_epoch = None
            new_bands.unpersist()
            raise RuntimeError(
                f"injected fault after pairs write, epoch {epoch_id}")
        (new_bands.write.mode("overwrite")
            .parquet(os.path.join(self.index_dir, f"epoch={epoch_id}")))
        new_bands.unpersist()
        self.epochs_processed.append(epoch_id)

    def start(self, docs_stream: DataFrame, checkpoint_dir: str):
        """docs_stream: streaming (doc_id long, text string) rows."""
        return (docs_stream.writeStream.foreachBatch(self._process)
                .option("checkpointLocation", checkpoint_dir)
                .trigger(availableNow=True)
                .start())

    def candidate_pairs(self) -> DataFrame:
        """Union of all epochs' pairs — equals ``minhash_lsh_candidates``
        over the full corpus (pair (a,b) is emitted exactly when the later
        side's epoch runs; pytest pins the equivalence)."""
        return (self.spark.read.option("basePath", self.out_dir)
                .schema(PAIRS_SCHEMA + ", epoch long")
                .parquet(os.path.join(self.out_dir, "epoch=*"))
                .drop("epoch"))
