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


class SnapTableDedupStream:
    """foreachBatch dedup with SnapTable sinks: the streaming face of
    ``streaming/table_dedup.py``, so the streaming and scheduled surfaces
    share ONE recovery story (snapshot-cursor; cursor = epoch id in each
    sink's snapshot summary) instead of maintaining two exactly-once
    mechanisms (the epoch-directory overwrite above vs the snapshot
    cursor).

    Exactly-once across both replay sources:

    - Structured Streaming REDELIVERS a batch whose epoch never reached
      the streaming checkpoint.  The cursors make redelivery idempotent:
      a fully committed epoch (both sinks carry it) is skipped outright;
      a half-committed one (index landed, candidates did not — the crash
      gap between the two appends) recommits only the missing pairs,
      recomputed deterministically from the redelivered batch against
      the index minus the batch's own ids (the same source-derived
      recovery as ``table_dedup._recover``, with the batch itself
      redelivered instead of re-read from a source table).
    - Every append is pinned to the metadata version its cursor was read
      from (``base=``), so an overlapping writer raises CommitConflict
      instead of silently double-appending.

    Unlike the epoch-directory pipeline, the sinks are QUERYABLE tables:
    time travel, changelog scans, ``compact()`` (which inherits the
    epoch cursor) and ``vacuum()`` all work mid-stream."""

    def __init__(self, spark: SparkSession, out_table: str, index_table: str,
                 num_hashes: int = 64, n: int = 5, bands: int = 16,
                 max_bucket_size: int | None = None,
                 fault_after_index_commit: int | None = None):
        self.spark = spark
        self.out_table = out_table
        self.index_table = index_table
        self.num_hashes = num_hashes
        self.n = n
        self.bands = bands
        self.max_bucket_size = max_bucket_size
        # test hook: raise AFTER the index append but BEFORE the
        # candidates append (this pipeline's commit gap)
        self.fault_after_index_commit = fault_after_index_commit
        self.epochs_processed: list[int] = []
        self.epochs_skipped: list[int] = []
        self.epochs_recovered: list[int] = []

    def _open(self, path):
        from .table_dedup import _open_or_create
        return _open_or_create(path)

    def _process(self, batch_df: DataFrame, epoch_id: int) -> None:
        from .table_dedup import _cursor
        index = self._open(self.index_table)
        cands = self._open(self.out_table)
        idx_base = index.current_version()
        cand_base = cands.current_version()
        _, idx_epoch = _cursor(index, idx_base, key="epoch")
        _, cand_epoch = _cursor(cands, cand_base, key="epoch")
        if (idx_epoch is not None and idx_epoch >= epoch_id
                and cand_epoch is not None and cand_epoch >= epoch_id):
            # crash landed after both commits but before the streaming
            # checkpoint: the whole epoch is already in the tables
            self.epochs_skipped.append(epoch_id)
            return
        new_bands = build_dedup_index(
            batch_df.select("doc_id", "text"), num_hashes=self.num_hashes,
            n=self.n, bands=self.bands).cache()
        recovering = idx_epoch is not None and idx_epoch >= epoch_id
        pairs = None
        try:
            if idx_epoch is None:
                # empty index: first epoch bootstrap
                pairs = banded_self_join_pairs(
                    new_bands, ["band_idx", "band_key"],
                    max_bucket_size=self.max_bucket_size)
            else:
                prior = index.read(self.spark)
                if recovering:  # index already holds this epoch's bands
                    prior = prior.join(new_bands.select("id").distinct(),
                                       "id", "left_anti")
                pairs = incremental_lsh_candidates(
                    prior, new_bands, max_bucket_size=self.max_bucket_size)
            pairs = pairs.cache()
            n_pairs = pairs.count()          # materialize before commit [1]
            if not recovering:
                index.append(new_bands,
                             summary={"epoch": epoch_id,
                                      "band_rows": new_bands.count()},
                             base=idx_base)
                if (self.fault_after_index_commit is not None
                        and epoch_id == self.fault_after_index_commit):
                    self.fault_after_index_commit = None
                    raise RuntimeError(
                        f"injected fault after index commit, "
                        f"epoch {epoch_id}")
            cands.append(pairs,
                         summary={"epoch": epoch_id, "pairs": n_pairs,
                                  "recovered": recovering},
                         base=cand_base)
        finally:
            # expected exits include CommitConflict and the replayed-epoch
            # crash path — caches must not accumulate across retries
            new_bands.unpersist()
            if pairs is not None:
                pairs.unpersist()
        (self.epochs_recovered if recovering
         else self.epochs_processed).append(epoch_id)

    def start(self, docs_stream: DataFrame, checkpoint_dir: str):
        """docs_stream: streaming (doc_id long, text string) rows."""
        return (docs_stream.writeStream.foreachBatch(self._process)
                .option("checkpointLocation", checkpoint_dir)
                .trigger(availableNow=True)
                .start())

    def candidate_pairs(self) -> DataFrame:
        return self._open(self.out_table).read(self.spark)
