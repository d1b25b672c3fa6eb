"""Exactly-once SnapTable dedup at the many-commit cadence the module
docstring promises: ~1000 small batch steps with periodic maintenance.

The round-5 scale demo proved per-step cost flat over 5 large batches;
this one pins the ORTHOGONAL axis — commit COUNT.  Each step appends two
snapshots (index bands, candidate pairs), so 1000 steps is ~2000 table
commits; under the round-5 inlined-manifest format every commit rewrote
O(snapshots x files) metadata and the cadence would have drowned in JSON
(measured ~2 s/commit by commit 192, superlinear).  With round-6
manifest indirection plus the documented maintenance cadence
(compact + vacuum on the index and candidates tables every
``maint_every`` steps) both the per-step wall and the per-commit
(append) wall must hold flat from the first window to the last.

Every ``maint_every``-th step also re-asserts correctness mid-stream:
planted cross-batch duplicates (copies of the previous batch's tail
under new ids) must surface in that step's pairs — maintenance never
resets the consumption cursor.

Usage: python tools/table_dedup_cadence_demo.py [batch_docs] [n_steps]
                                                [maint_every]
Appends summary JSON lines to tools/r6_table_dedup_cadence.jsonl.
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


def window(vals, lo, hi):
    w = vals[lo:hi]
    return round(sum(w) / max(len(w), 1), 3)


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    maint_every = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    planted = max(10, batch // 10)
    src, idx, cand = ("/tmp/tdc_src", "/tmp/tdc_idx", "/tmp/tdc_cand")
    for p in (src, idx, cand):
        shutil.rmtree(p, ignore_errors=True)

    spark = get_spark("table-dedup-cadence", cpus=8, shuffle_partitions=8)
    all_docs = generate_variant_docs(
        spark, n_bases=batch * n_steps, variants=1,
        tokens_per_doc=40, mutate_tokens=0).select("doc_id", "text").cache()
    all_docs.count()

    # per-commit wall via the append seam (the metadata path under test)
    append_walls: list[float] = []
    orig_append = SnapTable.append

    def timed_append(self, df, summary=None, base=None):
        t0 = time.monotonic()
        v = orig_append(self, df, summary=summary, base=base)
        append_walls.append(time.monotonic() - t0)
        return v

    SnapTable.append = timed_append

    t = SnapTable.create(src)
    step_walls: list[float] = []
    maint_walls: list[float] = []
    pair_checks = 0
    for i in range(n_steps):
        fresh = all_docs.filter(
            (F.col("doc_id") >= i * batch)
            & (F.col("doc_id") < (i + 1) * batch))
        if i > 0:
            dups = (all_docs
                    .filter((F.col("doc_id") >= i * batch - planted)
                            & (F.col("doc_id") < i * batch))
                    .select((F.col("doc_id") + 1_000_000_000 + i)
                            .alias("doc_id"), "text"))
            fresh = fresh.unionByName(dups)
        t.append(fresh)

        t0 = time.monotonic()
        res = table_dedup_step(spark, src, idx, cand, num_hashes=64, n=5,
                               bands=16)
        step_walls.append(time.monotonic() - t0)
        assert res["status"] == "ok", res
        if i > 0:
            assert res["pairs"] >= planted, (i, res)   # cursor never reset
            pair_checks += 1

        if (i + 1) % maint_every == 0:
            t0 = time.monotonic()
            for path in (idx, cand):
                tab = SnapTable(path)
                tab.compact(spark, min_files=32)
                tab.vacuum(keep_snapshots=8, orphan_grace_s=-1.0,
                           keep_metadata_versions=8)
            maint_walls.append(time.monotonic() - t0)
            print(json.dumps({
                "progress": i + 1,
                "step_s_window": window(step_walls, i + 1 - maint_every,
                                        i + 1),
                "maint_s": round(maint_walls[-1], 2),
                "index_files": len(SnapTable(idx)._manifest())}),
                flush=True)

    SnapTable.append = orig_append
    q = n_steps // 8
    n_ap = len(append_walls)
    rec = {
        "batch_docs": batch, "n_steps": n_steps, "maint_every": maint_every,
        "planted_per_step": planted, "pair_checks": pair_checks,
        # exact sink-commit count: every append/compact/vacuum commit
        # advances the table's metadata version by one (append_walls also
        # times the SOURCE table's appends, so it is not a commit count)
        "sink_commits": (SnapTable(idx).current_version()
                         + SnapTable(cand).current_version()),
        "total_s": round(sum(step_walls) + sum(maint_walls), 1),
        "step_s_first_q": window(step_walls, 0, q),
        "step_s_mid_q": window(step_walls, 4 * q, 5 * q),
        "step_s_last_q": window(step_walls, n_steps - q, n_steps),
        "append_s_first_q": window(append_walls, 0, n_ap // 8),
        "append_s_mid_q": window(append_walls, 4 * (n_ap // 8),
                                 5 * (n_ap // 8)),
        "append_s_last_q": window(append_walls, n_ap - n_ap // 8, n_ap),
        "maint_s_mean": window(maint_walls, 0, len(maint_walls)),
        "index_docs": batch * n_steps + planted * (n_steps - 1),
        "cand_pairs_total": SnapTable(cand).read(spark).count(),
    }
    print(json.dumps(rec))
    with open("/root/repo/tools/r6_table_dedup_cadence.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
