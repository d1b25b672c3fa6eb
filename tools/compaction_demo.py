"""Small-files compaction demo: scan cost of a many-commit SnapTable
before vs after compact().

The append-only tables this engine feeds (signature indexes, candidate
logs, lineage) accumulate one small data-file set per commit; at
warehouse scale a table behind 10^4 incremental commits pays per-file
open + footer read + task scheduling on every scan.  This demo builds an
index-shaped table with N small appends, times a full scan + a
bucket-probe aggregation at the many-files state, compacts, re-times the
SAME queries on the logically-identical table, and verifies row counts
match.

Usage: python tools/compaction_demo.py [n_commits] [rows_per_commit]
Appends one JSON line to tools/r5_compaction.jsonl.
"""
import json
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")
from sbustreamspot_core_spark.session import get_spark  # noqa: E402
from sbustreamspot_core_spark.sources.snaptable import SnapTable  # noqa: E402


def timed_scan(spark, table: SnapTable) -> tuple[float, int, int]:
    t0 = time.monotonic()
    df = table.read(spark)
    n = df.count()
    # the shape every dedup step runs: bucket-grouped aggregation
    buckets = (df.groupBy("band_idx", "band_val")
                 .agg(F.count("*").alias("c"))
                 .filter("c > 1").count())
    return time.monotonic() - t0, n, buckets


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rows_per = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    out = "/tmp/compaction_demo_table"
    import shutil
    shutil.rmtree(out, ignore_errors=True)

    spark = get_spark("compaction-demo")
    table = SnapTable.create(out)

    t0 = time.monotonic()
    for i in range(n_commits):
        batch = spark.range(i * rows_per, (i + 1) * rows_per, 1, 8).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 16).cast("int").alias("band_idx"),
            F.xxhash64(F.col("id") % 5000).alias("band_val"))
        table.append(batch, summary={"batch": i})
    build_s = time.monotonic() - t0

    files_before = len(table._manifest())
    pre_s, pre_rows, pre_buckets = timed_scan(spark, table)

    t0 = time.monotonic()
    v = table.compact(spark, target_file_mb=512, min_files=8)
    compact_s = time.monotonic() - t0
    files_after = len(table._manifest())

    post_s, post_rows, post_buckets = timed_scan(spark, table)
    assert pre_rows == post_rows == n_commits * rows_per
    assert pre_buckets == post_buckets

    rec = {"n_commits": n_commits, "rows_per_commit": rows_per,
           "rows": pre_rows, "build_s": round(build_s, 2),
           "files_before": files_before, "files_after": files_after,
           "scan_before_s": round(pre_s, 3), "scan_after_s": round(post_s, 3),
           "compact_s": round(compact_s, 2),
           "speedup": round(pre_s / post_s, 2), "metadata_version": v}
    print(json.dumps(rec))
    with open("/root/repo/tools/r5_compaction.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
