"""Streaming incremental dedup (streaming/dedup_stream.py): per-epoch
candidates against the persisted band index, exactly-once across an
injected crash in the pairs-write/index-append commit gap."""

import shutil
import tempfile

import pytest
from pyspark.sql.streaming import StreamingQueryException

from sbustreamspot_core_spark.operators.dedup import (
    minhash_lsh_candidates,
    minhash_signatures,
)
from sbustreamspot_core_spark.sources.docs import generate_variant_docs
from sbustreamspot_core_spark.streaming.dedup_stream import (
    StreamingDedupPipeline,
)


@pytest.fixture()
def dirs():
    out = {n: tempfile.mkdtemp(prefix=f"ssc_ds_{n}_")
           for n in ("src", "ckpt", "sink", "index")}
    yield out
    for d in out.values():
        shutil.rmtree(d, ignore_errors=True)


def _corpus(spark):
    return generate_variant_docs(spark, n_bases=30, variants=10,
                                 tokens_per_doc=40, mutate_tokens=4,
                                 num_partitions=4).cache()


def _write_batches(docs, src, n_batches=3):
    for k in range(n_batches):
        (docs.filter(f"doc_id % {n_batches} = {k}")
         .select("doc_id", "text").coalesce(1)
         .write.parquet(f"{src}/b{k}"))


def _full_recompute(docs):
    return {(r.id_a, r.id_b) for r in minhash_lsh_candidates(
        minhash_signatures(docs, num_hashes=32), bands=8,
        max_bucket_size=None).collect()}


def _drain(q):
    try:
        q.awaitTermination()
    finally:
        q.stop()


def test_streaming_dedup_equals_full_recompute(spark, dirs):
    docs = _corpus(spark)
    _write_batches(docs, dirs["src"])
    pipe = StreamingDedupPipeline(spark, dirs["sink"], dirs["index"],
                                  num_hashes=32, bands=8)
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(f'{dirs["src"]}/*'))
    _drain(pipe.start(stream, dirs["ckpt"]))
    assert len(pipe.epochs_processed) == 3
    got = [(r.id_a, r.id_b) for r in pipe.candidate_pairs().collect()]
    # batch boundaries invisible AND each pair emitted exactly once (found
    # when its later side's epoch runs)
    assert set(got) == _full_recompute(docs)
    assert len(got) == len(set(got))
    # the index holds every doc's bands
    n_docs = docs.count()
    assert (spark.read.parquet(f'{dirs["index"]}/epoch=*').count()
            == n_docs * 8)
    docs.unpersist()


def test_streaming_dedup_crash_in_commit_gap(spark, dirs):
    """Kill between the pairs write and the index append; the restarted
    query must replay the epoch (overwriting both sinks) and converge to
    exactly the batch oracle with no duplicate pairs."""
    docs = _corpus(spark)
    _write_batches(docs, dirs["src"])
    pipe = StreamingDedupPipeline(spark, dirs["sink"], dirs["index"],
                                  num_hashes=32, bands=8, fault_at_epoch=1)
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(f'{dirs["src"]}/*'))
    with pytest.raises(StreamingQueryException, match="injected fault"):
        q = pipe.start(stream, dirs["ckpt"])
        q.awaitTermination()
    # restart from the same checkpoint: epoch 1 replays, 2 runs fresh
    _drain(pipe.start(stream, dirs["ckpt"]))
    got = [(r.id_a, r.id_b) for r in pipe.candidate_pairs().collect()]
    assert set(got) == _full_recompute(docs)
    assert len(got) == len(set(got))
    docs.unpersist()


def test_snaptable_stream_crash_recovery_and_maintenance(spark, dirs):
    """SnapTable-backed streaming dedup (SnapTableDedupStream): kill in
    the commit gap between the index append and the candidates append;
    the restarted query must RECOVER the half-committed epoch through the
    snapshot cursor (recompute only the missing pairs — no duplicate
    bands, no duplicate or lost pairs), then compact+vacuum mid-stream
    must not reset the epoch cursor for a later epoch."""
    import os

    from pyspark.sql import functions as F

    from sbustreamspot_core_spark.sources.snaptable import SnapTable
    from sbustreamspot_core_spark.streaming.dedup_stream import (
        SnapTableDedupStream,
    )

    docs = _corpus(spark)
    _write_batches(docs, dirs["src"])
    cand_t = os.path.join(dirs["sink"], "cand")
    idx_t = os.path.join(dirs["index"], "idx")
    pipe = SnapTableDedupStream(spark, cand_t, idx_t, num_hashes=32,
                                bands=8, fault_after_index_commit=1)

    def _stream():
        return (spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1).parquet(f'{dirs["src"]}/*'))

    with pytest.raises(StreamingQueryException, match="injected fault"):
        q = pipe.start(_stream(), dirs["ckpt"])
        q.awaitTermination()
    # the crash window: index carries epoch 1, candidates do not
    # restart: epoch 1 recovers via the cursor, epoch 2 runs fresh
    _drain(pipe.start(_stream(), dirs["ckpt"]))
    assert pipe.epochs_recovered == [1]
    got = [(r.id_a, r.id_b) for r in pipe.candidate_pairs().collect()]
    assert set(got) == _full_recompute(docs)
    assert len(got) == len(set(got))
    # no duplicate bands either (recovery must not re-append the batch)
    n_docs = docs.count()
    idx = SnapTable(idx_t).read(spark)
    assert idx.count() == n_docs * 8
    assert idx.groupBy("id", "band_idx").count() \
        .filter("count > 1").count() == 0

    # maintenance mid-stream: the epoch cursor survives compact+vacuum
    t = SnapTable(idx_t)
    assert t.compact(spark, min_files=2) is not None
    t.vacuum(keep_snapshots=1, orphan_grace_s=-1.0)
    # epoch 3: copies of batch-0 docs under new ids -> all its pairs
    # (new-new + new-vs-corpus) must surface post-maintenance
    extra = (docs.filter("doc_id % 3 = 0").limit(20)
             .select((F.col("doc_id") + 100_000).alias("doc_id"), "text"))
    extra.coalesce(1).write.parquet(f'{dirs["src"]}/b3')
    _drain(pipe.start(_stream(), dirs["ckpt"]))
    all_docs = docs.select("doc_id", "text").unionByName(extra)
    got2 = [(r.id_a, r.id_b) for r in pipe.candidate_pairs().collect()]
    assert set(got2) == _full_recompute(all_docs)
    assert len(got2) == len(set(got2))
    docs.unpersist()
