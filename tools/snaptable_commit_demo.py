"""Per-commit metadata cost of SnapTable appends: flat or growing?

Round 5's inlined-manifest format rewrote the WHOLE snapshot log —
O(snapshots x files) JSON — on every commit, measured growing past
2 s/commit by 192 appends (384 s total metadata wall; BENCH.md round-5
compaction section).  Round 6 moved to Iceberg-style manifest-file
indirection: a commit writes one O(batch) manifest, one O(manifests)
pointer list, and an O(snapshots) fixed-entry log.  This demo pins the
claim with a measurement: N small appends, each commit's wall split into
the Spark data write (constant, uninteresting) and the metadata portion
(the thing that used to grow), reported as window means across the run
plus per-commit metadata bytes written.

Done-bar from the round-5 verdict: per-commit metadata wall flat across
>= 512 appends.

The residual growth axis is the snapshot LOG itself (an O(snapshots)
fixed-entry rewrite per commit — real Iceberg carries the same shape);
``vacuum_every`` > 0 runs the documented maintenance cadence
(vacuum(keep_snapshots=64, keep_metadata_versions=8) every that many
commits) to show the wall AND bytes hold flat indefinitely under it.

Usage: python tools/snaptable_commit_demo.py [n_commits] [rows_per_commit]
                                             [vacuum_every]
Appends one JSON line to tools/r6_commit_flat.jsonl.
"""
import json
import os
import shutil
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")
from sbustreamspot_core_spark.session import get_spark  # noqa: E402
from sbustreamspot_core_spark.sources.snaptable import SnapTable  # noqa: E402


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _, names in os.walk(path):
        for n in names:
            try:
                total += os.path.getsize(os.path.join(dirpath, n))
            except FileNotFoundError:
                pass
    return total


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rows_per = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    vacuum_every = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    out = "/tmp/snaptable_commit_demo"
    shutil.rmtree(out, ignore_errors=True)

    spark = get_spark("commit-flat-demo", cpus=8)
    table = SnapTable.create(out)

    # split each commit's wall into data-write vs metadata by timing the
    # _write_data call from inside (the rest of _apply IS the metadata
    # path: manifest + manifest-list + snapshot-log write + CAS)
    data_walls: list[float] = []
    orig_write = SnapTable._write_data

    def timed_write(self, df, version):
        t0 = time.monotonic()
        files = orig_write(self, df, version)
        data_walls.append(time.monotonic() - t0)
        return files

    SnapTable._write_data = timed_write

    commit_walls: list[float] = []
    meta_bytes: list[int] = []
    md_dir = os.path.join(out, "metadata")
    prev_md_bytes = _dir_bytes(md_dir)
    try:
        for i in range(n_commits):
            batch = spark.range(i * rows_per, (i + 1) * rows_per, 1, 1) \
                .select(
                    F.col("id").alias("doc_id"),
                    (F.col("id") % 16).cast("int").alias("band_idx"),
                    F.xxhash64(F.col("id") % 5000).alias("band_val"))
            t0 = time.monotonic()
            table.append(batch, summary={"batch": i})
            commit_walls.append(time.monotonic() - t0)
            b = _dir_bytes(md_dir)
            meta_bytes.append(b - prev_md_bytes)
            prev_md_bytes = b
            if vacuum_every and (i + 1) % vacuum_every == 0:
                table.vacuum(keep_snapshots=64, orphan_grace_s=-1.0,
                             keep_metadata_versions=8)
                prev_md_bytes = _dir_bytes(md_dir)
    finally:
        SnapTable._write_data = orig_write

    meta_walls = [c - d for c, d in zip(commit_walls, data_walls)]

    def window(vals, lo, hi):
        w = vals[lo:hi]
        return round(sum(w) / max(len(w), 1), 4)

    q = max(n_commits // 8, 1)
    rec = {
        "n_commits": n_commits, "rows_per_commit": rows_per,
        "vacuum_every": vacuum_every,
        "total_commit_s": round(sum(commit_walls), 2),
        "total_meta_s": round(sum(meta_walls), 2),
        "meta_wall_first_q_s": window(meta_walls, 0, q),
        "meta_wall_mid_q_s": window(meta_walls, 4 * q, 5 * q),
        "meta_wall_last_q_s": window(meta_walls, n_commits - q, n_commits),
        "meta_bytes_first_q": window(meta_bytes, 0, q),
        "meta_bytes_mid_q": window(meta_bytes, 4 * q, 5 * q),
        "meta_bytes_last_q": window(meta_bytes, n_commits - q, n_commits),
        "growth_ratio_wall": round(
            window(meta_walls, n_commits - q, n_commits)
            / max(window(meta_walls, 0, q), 1e-9), 2),
        "rows": table.read(spark).count(),
        "files": len(table._manifest()),
    }
    assert rec["rows"] == n_commits * rows_per
    print(json.dumps(rec))
    with open("/root/repo/tools/r6_commit_flat.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
