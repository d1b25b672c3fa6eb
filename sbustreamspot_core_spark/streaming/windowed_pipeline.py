"""Streaming-native StreamSpot end-to-end (§2.9, the event-time analog of
main.cpp:322-431's replay loop).

Composition: event-time watermarked windowed chunk counts
(``eventtime.windowed_chunk_counts``) -> per CLOSED window, the full batch
operators — StreamHash sketch construction (streamhash.cpp:59-80 semantics),
LSH banding (cluster.cpp:23-42) and the isolation anomaly flag
(cluster.cpp:44-57) — inside ``foreachBatch``, written exactly-once.

Why this shape scales to 100 TB:
- the watermark bounds aggregation state (count-based W2 eviction would
  need a stream-global total order — see eventtime.py);
- append output mode means ``foreachBatch`` only ever sees FINALIZED
  windows, so each window is sketched exactly once, distributed;
- the sink is idempotent: each epoch overwrites its own ``epoch=N``
  partition directory, so a retried/replayed epoch (kill between sink
  write and commit) cannot duplicate rows;
- the per-epoch driver loop iterates over the few windows that closed in
  that trigger (time-bounded), never over gids or edges.

Kill-and-resume: all progress lives in the streaming checkpoint + the
epoch-partitioned sink; ``tests/test_windowed_pipeline.py`` kills the query
mid-epoch (fault injected between sink write and epoch completion) and
asserts the restart converges to exactly the batch oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import StreamSpotParams
from ..operators.sketch import build_sketches
from .eventtime import windowed_chunk_counts

RESULT_SCHEMA = ("win_start timestamp, gid long, projection array<long>, "
                 "sketch binary, bands array<long>, is_isolated int")


def window_sketch_flags(chunk_counts: DataFrame,
                        params: StreamSpotParams) -> DataFrame:
    """Batch kernel shared by the streaming epoch body and the oracle:
    (win_start, gid, chunk, cnt) -> (win_start, gid, projection, sketch,
    bands, is_isolated), each window independent.

    Windows are processed in one distributed pass: sketches group on
    (win_start, gid); the isolation flag compares bands only within the
    same window (win_start joins into the bucket key).
    """
    from ..operators.lsh import isolated_vs_others

    sk = build_sketches(chunk_counts, params,
                        extra_group_cols={"win_start": "timestamp"})
    bands = sk.select(
        "win_start", "gid",
        F.posexplode("bands").alias("band_idx", "band_val"))
    # isolation per window: the shared operators/lsh rule (cluster.cpp:44-57)
    # scoped by win_start so each window is judged independently
    isolated = isolated_vs_others(bands, extra_key_cols=("win_start",))
    flagged = (
        bands.select("win_start", "gid").distinct()
        .join(isolated.withColumn("iso", F.lit(1)), ["win_start", "gid"],
              "left")
        .select("win_start", "gid",
                F.when(F.col("iso").isNull(), 0).otherwise(1)
                .alias("is_isolated")))
    return sk.join(flagged, ["win_start", "gid"])


class WindowedSketchPipeline:
    """Event-time streaming StreamSpot: watermarked windows -> sketches +
    LSH isolation flags, exactly-once into an epoch-partitioned parquet
    sink."""

    def __init__(self, spark: SparkSession, params: StreamSpotParams,
                 out_dir: str, window: str = "10 minutes",
                 watermark: str = "5 minutes",
                 fault_at_epoch: int | None = None):
        self.spark = spark
        self.params = params
        self.out_dir = out_dir
        self.window = window
        self.watermark = watermark
        # test hook: raise AFTER the sink write of this epoch but BEFORE
        # foreachBatch returns (simulates a crash in the commit gap)
        self.fault_at_epoch = fault_at_epoch
        self.epochs_processed: list[int] = []

    def _process(self, batch_df: DataFrame, epoch_id: int) -> None:
        out = window_sketch_flags(
            batch_df.select("win_start", "gid", "chunk", "cnt"), self.params)
        # idempotent sink: an epoch owns its directory; a replayed epoch
        # overwrites rather than appends
        (out.write.mode("overwrite")
            .parquet(os.path.join(self.out_dir, f"epoch={epoch_id}")))
        if self.fault_at_epoch is not None and epoch_id == self.fault_at_epoch:
            self.fault_at_epoch = None
            raise RuntimeError(
                f"injected fault after sink write, epoch {epoch_id}")
        self.epochs_processed.append(epoch_id)

    def start(self, edges_with_chunks: DataFrame, checkpoint_dir: str):
        """edges_with_chunks: streaming (ts, gid, chunk) rows."""
        wcc = windowed_chunk_counts(edges_with_chunks, window=self.window,
                                    watermark=self.watermark)
        return (wcc.writeStream.foreachBatch(self._process)
                .outputMode("append")
                .option("checkpointLocation", checkpoint_dir)
                .trigger(availableNow=True)
                .start())

    def results(self) -> DataFrame:
        """All emitted windows; exactly one row per (win_start, gid) by the
        epoch-overwrite + append-mode construction."""
        return (self.spark.read.option("basePath", self.out_dir)
                .schema(RESULT_SCHEMA + ", epoch long")
                .parquet(os.path.join(self.out_dir, "epoch=*"))
                .drop("epoch"))
