"""Partitioned SnapTable writes: measured exact partition pruning.

One append of N_ROWS rows laid out by ``partition_by=["lang"]`` over
N_LANGS values, then the same point query timed two ways: a full-scan
read with a row filter (no pruning information used) vs
``read(where=("lang", "=", v))``, which prunes the manifest to that
partition's files before Spark plans the scan.  At warehouse scale this
is the difference between listing/opening every file of a 100 TB table
and opening the one partition that can match.

Usage: python tools/partition_prune_demo.py [n_rows] [n_langs]
Appends one JSON line to tools/r6_partition_prune.jsonl.
"""
import json
import shutil
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")
from sbustreamspot_core_spark.session import get_spark  # noqa: E402
from sbustreamspot_core_spark.sources.snaptable import SnapTable  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_langs = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    out = "/tmp/partition_prune_demo"
    shutil.rmtree(out, ignore_errors=True)
    spark = get_spark("partition-prune-demo", cpus=8)

    t = SnapTable.create(out)
    df = spark.range(0, n_rows, 1, 8).select(
        "id",
        F.concat(F.lit("l"), F.pmod(F.xxhash64("id"), n_langs))
        .alias("lang"),
        (F.col("id") % 1000).alias("payload"))
    t.append(df, partition_by=["lang"])
    manifest = t._manifest()
    target = "l7"
    pruned = SnapTable._prune(manifest, ("lang", "=", target))

    def timed(fn):
        t0 = time.monotonic()
        n = fn()
        return round(time.monotonic() - t0, 3), n

    # warm both paths once (JVM/codegen), then measure
    t.read(spark).filter(F.col("lang") == target).count()
    t.read(spark, where=("lang", "=", target)).count()
    full_s, n_full = timed(
        lambda: t.read(spark).filter(F.col("lang") == target).count())
    pruned_s, n_pruned = timed(
        lambda: t.read(spark, where=("lang", "=", target)).count())
    assert n_full == n_pruned > 0

    rec = {"rows": n_rows, "langs": n_langs,
           "files_total": len(manifest), "files_pruned": len(pruned),
           "match_rows": n_full,
           "full_scan_s": full_s, "pruned_scan_s": pruned_s,
           "speedup": round(full_s / max(pruned_s, 1e-9), 2)}
    print(json.dumps(rec))
    with open("/root/repo/tools/r6_partition_prune.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
