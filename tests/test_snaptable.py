"""SnapTable: snapshot log, atomic commit, time travel, incremental scan,
file pruning, conflict detection, crash orphans, vacuum, rollback."""

import json
import os

import pytest

from sbustreamspot_core_spark.sources.iceberg import read_table, write_table
from sbustreamspot_core_spark.sources.snaptable import (
    CommitConflict,
    SnapTable,
    SnapTableError,
    is_snaptable,
)


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).selectExpr(
        "id", f"'{tag}' AS tag", "CAST(id * 2 AS DOUBLE) AS score")


def _rows(df):
    return {(r.id, r.tag) for r in df.select("id", "tag").collect()}


def test_create_append_read_and_time_travel(spark, tmp_ckpt):
    path = os.path.join(tmp_ckpt, "t1")
    t = SnapTable.create(path)
    assert is_snaptable(path) and t.current_snapshot_id() is None
    with pytest.raises(SnapTableError):
        t.read(spark)                        # empty table has no schema
    t.append(_df(spark, 0, 5, "a"), summary={"batch": "a"})
    t.append(_df(spark, 5, 8, "b"))
    assert _rows(t.read(spark)) == {(i, "a") for i in range(5)} \
        | {(i, "b") for i in range(5, 8)}
    # snapshot 1 still readable after snapshot 2 exists
    assert _rows(t.read(spark, snapshot_id=1)) == \
        {(i, "a") for i in range(5)}
    snaps = t.snapshots()
    assert [s["snapshot_id"] for s in snaps] == [1, 2]
    assert snaps[0]["summary"] == {"batch": "a"}
    assert snaps[1]["parent_id"] == 1
    # manifests carry row counts from the parquet footers
    assert sum(f["rows"] for f in snaps[1]["manifest"]) == 8


def test_overwrite_and_rollback(spark, tmp_ckpt):
    path = os.path.join(tmp_ckpt, "t2")
    t = SnapTable.create(path)
    t.append(_df(spark, 0, 4, "old"))
    t.overwrite(_df(spark, 100, 103, "new"))
    assert _rows(t.read(spark)) == {(i, "new") for i in range(100, 103)}
    assert _rows(t.read(spark, snapshot_id=1)) == \
        {(i, "old") for i in range(4)}       # time travel across overwrite
    t.rollback_to(1)
    assert _rows(t.read(spark)) == {(i, "old") for i in range(4)}
    # appends after rollback build on the rolled-back state
    t.append(_df(spark, 4, 6, "post"))
    assert _rows(t.read(spark)) == {(i, "old") for i in range(4)} \
        | {(i, "post") for i in range(4, 6)}


def test_incremental_scan(spark, tmp_ckpt):
    path = os.path.join(tmp_ckpt, "t3")
    t = SnapTable.create(path)
    t.append(_df(spark, 0, 5, "s1"))
    t.append(_df(spark, 5, 9, "s2"))
    t.append(_df(spark, 9, 12, "s3"))
    inc = t.incremental(spark, from_snapshot_id=1)
    assert _rows(inc) == {(i, "s2") for i in range(5, 9)} \
        | {(i, "s3") for i in range(9, 12)}
    bounded = t.incremental(spark, from_snapshot_id=1, to_snapshot_id=2)
    assert _rows(bounded) == {(i, "s2") for i in range(5, 9)}
    assert t.incremental(spark, from_snapshot_id=3).count() == 0
    t.overwrite(_df(spark, 0, 2, "ow"))
    with pytest.raises(SnapTableError):      # range crosses an overwrite
        t.incremental(spark, from_snapshot_id=1)
    with pytest.raises(SnapTableError):      # not an ancestor
        t.incremental(spark, from_snapshot_id=2, to_snapshot_id=1)


def test_file_pruning_on_footer_stats(spark, tmp_ckpt):
    path = os.path.join(tmp_ckpt, "t4")
    t = SnapTable.create(path)
    for lo in (0, 1000, 2000, 3000):         # disjoint id ranges per commit
        t.append(_df(spark, lo, lo + 100, f"b{lo}").coalesce(1))
    manifest = t._manifest()
    assert len(manifest) == 4
    pruned = SnapTable._prune(manifest, ("id", ">=", 2500))
    assert len(pruned) == 1                  # only the 3000-range file
    # pruning is an optimization, not a semantic: results still exact
    assert _rows(t.read(spark, where=("id", ">=", 2500))) == \
        {(i, "b3000") for i in range(3000, 3100)}
    assert t.read(spark, where=("id", "<", 50)).count() == 50
    eq = SnapTable._prune(manifest, ("id", "=", 1050))
    assert len(eq) == 1


def test_schema_mismatch_and_conflict(spark, tmp_ckpt):
    path = os.path.join(tmp_ckpt, "t5")
    t = SnapTable.create(path)
    t.append(_df(spark, 0, 3, "a"))
    with pytest.raises(SnapTableError, match="schema mismatch"):
        t.append(spark.range(3).selectExpr("id", "id AS other"))
    # optimistic concurrency: a commit whose base version is stale refuses
    base = t.current_version()
    meta = t.metadata(base)
    t.append(_df(spark, 3, 4, "winner"))     # another writer advances
    with pytest.raises(CommitConflict):
        t._commit(base, meta)
    # the loser retries on fresh state and succeeds
    t.append(_df(spark, 4, 5, "retry"))
    assert _rows(t.read(spark)) >= {(3, "winner"), (4, "retry")}


def test_crash_orphans_invisible_and_vacuumed(spark, tmp_ckpt):
    path = os.path.join(tmp_ckpt, "t6")
    t = SnapTable.create(path)
    t.append(_df(spark, 0, 4, "a"))
    # crash between data write and metadata commit: orphan data dir
    orphan_dir = os.path.join(path, "data", "snap-99-deadbeef")
    os.makedirs(orphan_dir)
    _df(spark, 900, 903, "orphan").write.mode("overwrite").parquet(orphan_dir)
    # crash between metadata write and hint update: unreferenced version
    with open(os.path.join(path, "metadata", "v9.metadata.json"), "w") as f:
        json.dump({"bogus": True}, f)
    # readers see none of it
    assert _rows(t.read(spark)) == {(i, "a") for i in range(4)}
    assert t.current_version() < 9
    deleted = t.vacuum()
    assert any("snap-99-deadbeef" in d for d in deleted)
    assert _rows(t.read(spark)) == {(i, "a") for i in range(4)}


def test_vacuum_expires_time_travel(spark, tmp_ckpt):
    path = os.path.join(tmp_ckpt, "t7")
    t = SnapTable.create(path)
    t.append(_df(spark, 0, 3, "a"))
    t.overwrite(_df(spark, 10, 13, "b"))
    deleted = t.vacuum(keep_snapshots=1)
    assert deleted                           # snapshot 1's files are gone
    assert _rows(t.read(spark)) == {(i, "b") for i in range(10, 13)}
    with pytest.raises(SnapTableError):
        t.read(spark, snapshot_id=1)


def test_iceberg_source_routes_to_snaptable(spark, tmp_ckpt):
    path = os.path.join(tmp_ckpt, "t8")
    SnapTable.create(path)
    write_table(_df(spark, 0, 4, "x"), path, mode="append")
    write_table(_df(spark, 4, 6, "y"), path, mode="append")
    assert _rows(read_table(spark, path)) == {(i, "x") for i in range(4)} \
        | {(i, "y") for i in range(4, 6)}
    assert _rows(read_table(spark, path, snapshot_id=1)) == \
        {(i, "x") for i in range(4)}
    # plain parquet dirs keep the old fallback behavior
    plain = os.path.join(tmp_ckpt, "plain")
    write_table(_df(spark, 0, 2, "p"), plain, mode="overwrite")
    assert read_table(spark, plain).count() == 2


def test_pagerank_lineage_committed_to_snaptable(spark, tmp_ckpt):
    """One SnapTable snapshot per checkpointed superstep, delta metrics in
    the snapshot summary, per-partition row counts queryable + time-travel."""
    from sbustreamspot_core_spark.config import GraphParams
    from sbustreamspot_core_spark.graph.pagerank import pagerank

    e = [(i, (i * 3 + 1) % 20) for i in range(20)] + [(i, 0) for i in range(1, 20, 4)]
    df = spark.createDataFrame(sorted(set(e)), "src long, dst long")
    ck = os.path.join(tmp_ckpt, "pr_ck")
    lt = os.path.join(tmp_ckpt, "pr_lineage")
    params = GraphParams(num_partitions=4, checkpoint_interval=2,
                         max_iters=6, tol=0.0)
    pagerank(spark, df, params, checkpoint_dir=ck, resume=False,
             lineage_table=lt)

    t = SnapTable(lt)
    snaps = t.snapshots()
    # 0-indexed supersteps checkpoint at k = 1, 3, 5 with interval=2
    steps = [s["summary"]["superstep"] for s in snaps]
    assert steps == sorted(steps) and steps[-1] == 5 and len(steps) >= 3
    for s in snaps:
        assert "delta" in s["summary"] and "total_rank" in s["summary"]
    # the full lineage log is one queryable table...
    log = t.read(spark)
    assert log.groupBy("superstep").count().count() == len(steps)
    # ...and time travel to the first commit shows only the first superstep
    first = t.read(spark, snapshot_id=snaps[0]["snapshot_id"])
    assert {r.superstep for r in first.select("superstep").collect()} == {steps[0]}
