"""Streaming-native StreamSpot end-to-end (§2.9): event-time watermarked
windows -> sketches + LSH isolation flags in foreachBatch, with exactly-once
emission across an injected mid-epoch crash (fault between the sink write
and epoch commit) and restart."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryException

from sbustreamspot_core_spark.config import StreamSpotParams
from sbustreamspot_core_spark.streaming.windowed_pipeline import (
    WindowedSketchPipeline,
    window_sketch_flags,
)

PARAMS = StreamSpotParams(chunk_length=4, L=200, B=10, R=20)


@pytest.fixture()
def dirs():
    out = {n: tempfile.mkdtemp(prefix=f"ssc_wp_{n}_")
           for n in ("src", "ckpt", "sink")}
    yield out
    for d in out.values():
        shutil.rmtree(d, ignore_errors=True)


def _rows():
    """50 minutes of (ts, gid, chunk) rows.  gids 0 and 1 share identical
    chunk multisets every window (identical sketches -> co-bucketed, not
    isolated); gid 2's content is disjoint (isolated)."""
    rows = []
    for m in range(50):
        ts = f"2024-01-01 00:{m:02d}:00"
        for gid, chunks in ((0, ["aaaa", "bbbb", "cccc"]),
                            (1, ["aaaa", "bbbb", "cccc"]),
                            (2, ["zzzz", "yyyy"])):
            for c in chunks:
                rows.append((ts, gid, c))
                if m % 2 == 0:          # vary counts across windows
                    rows.append((ts, gid, c))
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "ts_s string, gid long, chunk string"
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "gid", "chunk")


def _write_files(spark, rows, src, n_files=4):
    step = -(-len(rows) // n_files)
    for i in range(n_files):
        _df(spark, rows[i * step:(i + 1) * step]).coalesce(1).write.parquet(
            f"{src}/f{i}")


def _oracle(spark, rows):
    """Batch replica restricted to windows the final watermark closed
    (max ts 00:49 - 5 min => windows ending <= 00:44)."""
    cc = (_df(spark, rows)
          .groupBy(F.window("ts", "10 minutes").alias("w"), "gid", "chunk")
          .agg(F.count("*").alias("cnt"))
          .select(F.col("w.start").alias("win_start"),
                  F.col("w.end").alias("win_end"), "gid", "chunk", "cnt")
          .filter("win_end <= timestamp'2024-01-01 00:44:00'")
          .drop("win_end"))
    return {
        (r.win_start, r.gid): (tuple(r.projection), bytes(r.sketch),
                               tuple(r.bands), r.is_isolated)
        for r in window_sketch_flags(cc, PARAMS).collect()
    }


def _run(pipeline, spark, src, ckpt):
    stream = (spark.readStream.schema("ts timestamp, gid long, chunk string")
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))
    q = pipeline.start(stream, ckpt)
    q.awaitTermination(180)


def test_streaming_windows_equal_batch_oracle(spark, dirs):
    rows = _rows()
    _write_files(spark, rows, dirs["src"])
    pipe = WindowedSketchPipeline(spark, PARAMS, dirs["sink"])
    _run(pipe, spark, dirs["src"], dirs["ckpt"])

    got = {(r.win_start, r.gid): (tuple(r.projection), bytes(r.sketch),
                                  tuple(r.bands), r.is_isolated)
           for r in pipe.results().collect()}
    expect = _oracle(spark, rows)
    assert expect  # sanity: windows actually closed
    assert got == expect
    # semantic spot-check: twins 0/1 never isolated, loner 2 always
    for (_, gid), (_, _, _, iso) in got.items():
        assert iso == (1 if gid == 2 else 0)


def test_mid_epoch_crash_then_restart_is_exactly_once(spark, dirs):
    """Kill the query after an epoch's sink write but before its commit;
    the restarted query must re-emit that epoch idempotently and converge
    to exactly the batch oracle — no lost and no duplicated windows."""
    rows = _rows()
    _write_files(spark, rows, dirs["src"])

    pipe1 = WindowedSketchPipeline(spark, PARAMS, dirs["sink"],
                                   fault_at_epoch=2)
    with pytest.raises(StreamingQueryException, match="injected fault"):
        _run(pipe1, spark, dirs["src"], dirs["ckpt"])

    pipe2 = WindowedSketchPipeline(spark, PARAMS, dirs["sink"])
    _run(pipe2, spark, dirs["src"], dirs["ckpt"])

    res = pipe2.results()
    # exactly-once: one row per (win_start, gid) across all epoch dirs
    dups = (res.groupBy("win_start", "gid").count()
            .filter("count > 1").collect())
    assert dups == []
    got = {(r.win_start, r.gid): (tuple(r.projection), bytes(r.sketch),
                                  tuple(r.bands), r.is_isolated)
           for r in res.collect()}
    assert got == _oracle(spark, rows)
