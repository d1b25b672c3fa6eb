"""Exactly-once SnapTable incremental dedup at scale: fixed-size batches
against a growing persisted index, maintenance interleaved.

Five 100k-doc appends to a source SnapTable, `table_dedup_step` after
each, with 1,000 planted cross-batch duplicates per batch (copies of the
previous batch's docs under new ids).  After batch 3 the index is
compacted and vacuumed — the consumption cursor must survive and the
following steps must stay incremental.  The pin: per-step wall stays
~flat while the index grows 5x (step cost is O(batch), the SnapTable
metadata layer adds no per-commit scan of the corpus), and every step's
candidate count covers its planted dups.

Usage: python tools/table_dedup_scale_demo.py [batch_docs] [n_batches]
Appends one JSON line per step to tools/r5_table_dedup_scale.jsonl.
"""
import json
import shutil
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")
from sbustreamspot_core_spark.session import get_spark          # noqa: E402
from sbustreamspot_core_spark.sources.docs import (             # noqa: E402
    generate_variant_docs)
from sbustreamspot_core_spark.sources.snaptable import SnapTable  # noqa: E402
from sbustreamspot_core_spark.streaming.table_dedup import (    # noqa: E402
    table_dedup_step)

PLANTED = 1_000


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    src, idx, cand = ("/tmp/tds_src", "/tmp/tds_idx", "/tmp/tds_cand")
    for p in (src, idx, cand):
        shutil.rmtree(p, ignore_errors=True)

    spark = get_spark("table-dedup-scale")
    # distinct random-word docs; doc_ids globally unique across batches
    all_docs = generate_variant_docs(
        spark, n_bases=batch * n_batches, variants=1,
        tokens_per_doc=60, mutate_tokens=0).select("doc_id", "text").cache()
    all_docs.count()

    t = SnapTable.create(src)
    out = []
    for i in range(n_batches):
        fresh = all_docs.filter(
            (F.col("doc_id") >= i * batch) & (F.col("doc_id") < (i + 1) * batch))
        if i > 0:           # plant cross-batch dups of the previous batch
            dups = (all_docs
                    .filter((F.col("doc_id") >= i * batch - PLANTED)
                            & (F.col("doc_id") < i * batch))
                    .select((F.col("doc_id") + 10_000_000 * (i + 1))
                            .alias("doc_id"), "text"))
            fresh = fresh.unionByName(dups)
        t.append(fresh)

        t0 = time.monotonic()
        res = table_dedup_step(spark, src, idx, cand, num_hashes=64, n=5,
                               bands=16)
        step_s = time.monotonic() - t0
        n_files = len(SnapTable(idx)._manifest())
        rec = {"batch": i, "status": res["status"], "pairs": res["pairs"],
               "new_docs": res["new_docs"], "step_s": round(step_s, 2),
               "index_docs": (i + 1) * batch + i * PLANTED,
               "index_files": n_files}
        if i == 2:          # mid-stream maintenance
            t0 = time.monotonic()
            SnapTable(idx).compact(spark, min_files=2)
            SnapTable(idx).vacuum(keep_snapshots=1)
            rec["maintenance_s"] = round(time.monotonic() - t0, 2)
            rec["files_after_compact"] = len(SnapTable(idx)._manifest())
        assert res["status"] == "ok"
        assert i == 0 or res["pairs"] >= PLANTED     # planted dups surfaced
        assert res["new_docs"] == batch + (PLANTED if i else 0)
        out.append(rec)
        print(json.dumps(rec))

    with open("/root/repo/tools/r5_table_dedup_scale.jsonl", "a") as f:
        for rec in out:
            f.write(json.dumps(rec) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
