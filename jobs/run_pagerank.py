"""Link-graph CLI for spark-submit: PageRank / CC / LPA / triangles over an
edge table (src long, dst long), with checkpoint/resume.

    spark-submit --py-files sbustreamspot_core_spark.zip jobs/run_pagerank.py \
        --edges /path/edges.parquet --algo pagerank --output /out \
        [--checkpoint-dir /ckpt] [--damping 0.85] [--tol 1e-7] \
        [--max-iters 100] [--partitions 256] [--snapshot-id N]

``--edges`` accepts a plain parquet directory, a SnapTable directory, or
(with the runtime jar on the classpath) an Iceberg table — the north
rule's input shape; ``--snapshot-id`` pins a table read for reproducible
re-runs over a moving table.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

from sbustreamspot_core_spark.config import GraphParams
from sbustreamspot_core_spark.graph.components import connected_components
from sbustreamspot_core_spark.graph.labelprop import label_propagation
from sbustreamspot_core_spark.graph.pagerank import pagerank
from sbustreamspot_core_spark.graph.triangles import triangle_count
from sbustreamspot_core_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser(description="link-graph algorithms on Spark")
    ap.add_argument("--edges", required=True,
                    help="(src, dst) table: parquet dir, SnapTable dir, "
                         "or Iceberg table")
    ap.add_argument("--snapshot-id", type=int, default=None,
                    help="pin the edge read to a table snapshot "
                         "(SnapTable/Iceberg inputs)")
    ap.add_argument("--algo", choices=["pagerank", "cc", "lpa", "triangles"],
                    default="pagerank")
    ap.add_argument("--output", default=None, help="parquet output path")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--tol", type=float, default=1e-7)
    ap.add_argument("--max-iters", type=int, default=100)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--lineage-table", default=None,
                    help="SnapTable path: per-superstep lineage + delta "
                         "metrics committed as queryable snapshots "
                         "(pagerank/cc/lpa; requires --checkpoint-dir)")
    args = ap.parse_args()

    spark = get_spark(f"linkgraph-{args.algo}")
    n_part = args.partitions or spark.sparkContext.defaultParallelism
    params = GraphParams(damping=args.damping, tol=args.tol,
                         max_iters=args.max_iters, num_partitions=n_part)
    from sbustreamspot_core_spark.sources.iceberg import read_table
    edges = read_table(spark, args.edges, snapshot_id=args.snapshot_id)

    if args.algo == "triangles":
        print(json.dumps({"triangles": triangle_count(spark, edges, params)}))
        return
    if args.algo == "pagerank":
        res = pagerank(spark, edges, params, args.checkpoint_dir,
                       resume=not args.no_resume,
                       lineage_table=args.lineage_table)
        out, info = res.ranks, {"supersteps": res.supersteps,
                                "converged": res.converged,
                                "metrics": res.metrics[-3:]}
    elif args.algo == "cc":
        res = connected_components(spark, edges, params=params,
                                   checkpoint_dir=args.checkpoint_dir,
                                   resume=not args.no_resume,
                                   lineage_table=args.lineage_table)
        out, info = res.components, {"supersteps": res.supersteps,
                                     "converged": res.converged}
    else:
        res = label_propagation(spark, edges, params=params,
                                checkpoint_dir=args.checkpoint_dir,
                                resume=not args.no_resume,
                                lineage_table=args.lineage_table)
        out, info = res.labels, {"supersteps": res.supersteps,
                                 "converged": res.converged}
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
        info["output"] = args.output
    else:
        info["rows"] = out.count()
    if args.lineage_table:
        from sbustreamspot_core_spark.sources.snaptable import (
            SnapTable, is_snaptable)
        # lineage commits ride the checkpoint cadence: without
        # --checkpoint-dir no snapshot is ever committed
        info["lineage_snapshots"] = (
            len(SnapTable(args.lineage_table).snapshots())
            if is_snaptable(args.lineage_table) else 0)
    print(json.dumps(info))


if __name__ == "__main__":
    main()
