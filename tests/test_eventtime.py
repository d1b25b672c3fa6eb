"""Event-time watermark streaming (§2.9 streaming-native eviction analog):
completed windows from the watermarked streaming aggregation must equal the
batch oracle, and late rows must be dropped deterministically."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sbustreamspot_core_spark.streaming.eventtime import (
    batch_window_oracle,
    windowed_edge_counts,
)


@pytest.fixture()
def stream_dirs():
    src = tempfile.mkdtemp(prefix="ssc_evt_src_")
    ckpt = tempfile.mkdtemp(prefix="ssc_evt_ckpt_")
    yield src, ckpt
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)


def _edges(spark, rows):
    return spark.createDataFrame(
        [(ts, gid) for ts, gid in rows], "ts_s string, gid long"
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "gid")


def test_watermarked_windows_match_batch_oracle(spark, stream_dirs):
    src, ckpt = stream_dirs
    # two in-order files plus one late row beyond the watermark
    on_time = [(f"2024-01-01 00:{m:02d}:00", m % 3) for m in range(0, 50)]
    late = [("2024-01-01 00:01:00", 99)]       # 49+ min late: must be dropped
    _edges(spark, on_time[:30]).coalesce(1).write.parquet(f"{src}/f1")
    _edges(spark, on_time[30:]).coalesce(1).write.parquet(f"{src}/f2")
    _edges(spark, late).coalesce(1).write.parquet(f"{src}/f3")

    stream = (
        spark.readStream.schema("ts timestamp, gid long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        windowed_edge_counts(stream, window="10 minutes",
                             watermark="5 minutes")
        .writeStream.format("memory").queryName("evt_windows")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.win_start, r.gid): r.n_edges
           for r in spark.sql("SELECT * FROM evt_windows").collect()}

    # batch oracle over the ON-TIME rows only, restricted to windows the
    # final watermark (max ts 00:49 - 5 min => 00:44) has closed
    oracle = {
        (r.win_start, r.gid): r.n_edges
        for r in batch_window_oracle(
            _edges(spark, on_time), window="10 minutes").collect()
        if r.win_end <= r.win_end.__class__(2024, 1, 1, 0, 44)
    }
    assert got == oracle
    # the late row's window (00:00-00:10, gid 99) must NOT have been emitted
    assert all(gid != 99 for _, gid in got)


def test_streaming_restart_emits_remaining_windows(spark, stream_dirs):
    """Windows still open at shutdown emit after more data arrives on
    restart — watermark state survives the checkpoint.  (File sink: the
    memory sink does not support checkpoint recovery.)"""
    src, ckpt = stream_dirs
    out = tempfile.mkdtemp(prefix="ssc_evt_out_")
    try:
        rows1 = [(f"2024-01-01 00:{m:02d}:00", 0) for m in range(0, 20)]
        rows2 = [(f"2024-01-01 00:{m:02d}:00", 0) for m in range(20, 40)]
        _edges(spark, rows1).coalesce(1).write.parquet(f"{src}/f1")
        stream_schema = "ts timestamp, gid long"

        def run_once():
            stream = (spark.readStream.schema(stream_schema)
                      .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
            q = (windowed_edge_counts(stream, window="10 minutes",
                                      watermark="5 minutes")
                 .writeStream.format("parquet")
                 .option("path", out)
                 .outputMode("append")
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)
            return {(r.win_start, r.gid): r.n_edges
                    for r in spark.read.parquet(out).collect()}

        first = run_once()
        _edges(spark, rows2).coalesce(1).write.parquet(f"{src}/f2")
        second = run_once()

        full = {(r.win_start, r.gid): r.n_edges
                for r in batch_window_oracle(
                    _edges(spark, rows1 + rows2),
                    window="10 minutes").collect()}
        # every window the final watermark (00:39 - 5 = 00:34) closed must
        # have emitted with full batch counts; run-1 windows carry over
        closed = {k: v for k, v in full.items() if k[0].minute + 10 <= 34}
        assert closed  # sanity: some windows actually closed
        for k, v in closed.items():
            assert second[k] == v
        # run 1 already emitted its closed windows; file sink keeps them once
        assert set(first) <= set(second)
    finally:
        shutil.rmtree(out, ignore_errors=True)
