"""Event-time windowed aggregation with watermark-bounded state (§2.9).

The reference's count-based eviction (W2, main.cpp:315-319) presumes a total
order over the stream — fine single-threaded, impossible to keep cheap on a
distributed stream.  The streaming-native analog keys eviction off event
time: a watermark bounds both the aggregation state Spark retains and the
lateness a row may have before it is deterministically dropped.  This module
provides that path over the engine's edge/page streams (`warc_ts`-style
event-time columns are part of the input hint).

All functions return plain transformed streaming DataFrames — they compose
with `readStream` sources and any sink; tests drive them with an
`availableNow` trigger and compare completed windows against the equivalent
batch aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_edge_counts(edges: DataFrame, ts_col: str = "ts",
                         key_col: str = "gid",
                         window: str = "10 minutes",
                         watermark: str = "20 minutes") -> DataFrame:
    """Per-key edge counts in event-time tumbling windows.

    (win_start, win_end, <key>, n_edges); with a streaming input and append
    output mode a window emits exactly once, when the watermark passes its
    end — bounded state, deterministic late-row policy.
    """
    return (
        edges.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(F.count("*").alias("n_edges"))
        .select(F.col("w.start").alias("win_start"),
                F.col("w.end").alias("win_end"), key_col, "n_edges")
    )


def windowed_chunk_counts(edges_with_chunks: DataFrame, ts_col: str = "ts",
                          window: str = "10 minutes",
                          watermark: str = "20 minutes") -> DataFrame:
    """Event-time windowed (gid, chunk) frequency table — the W2/A3
    composition in streaming form: each closed window is a self-contained
    chunk-count snapshot for the sketch pipeline."""
    return (
        edges_with_chunks.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "gid", "chunk")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("win_start"), "gid", "chunk", "cnt")
    )


def batch_window_oracle(edges: DataFrame, ts_col: str = "ts",
                        key_col: str = "gid",
                        window: str = "10 minutes") -> DataFrame:
    """The batch equivalent of ``windowed_edge_counts`` (no watermark): what
    every window must contain once closed.  Used by tests to verify the
    streaming path end-to-end."""
    return (
        edges.groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(F.count("*").alias("n_edges"))
        .select(F.col("w.start").alias("win_start"),
                F.col("w.end").alias("win_end"), key_col, "n_edges")
    )
