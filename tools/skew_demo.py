"""Skew harness at demo scale: a planted 10M-degree mega-hub in a
64M-edge graph, measured through the three places skew can bite
(graph/skew.py's taxonomy) with event-log task-time evidence.

Phases (each its own JVM so event logs flush; ONE JSON line per leg):

A. PageRank on a 10M-IN-degree hub — the per-superstep
   ``groupBy(dst).sum`` has map-side combine, so the claim is that the
   default plan already absorbs in-degree skew: steady superstep time
   plus the max/p50 task-duration ratio from the event log are the
   evidence (a straggler would show max >> p50).

B. Adjacency build on a 10M-OUT-degree hub — ``collect_list`` has NO
   map-side combine, so this is where the harness must earn its keep:
   (1) naive ``groupBy(src).collect_list`` (one task buffers all 10M
   targets), (2) ``skew.salted_collect`` (salted two-phase; the final
   per-key flatten still lands in one task), (3) the engine's CSR-blocked
   ``pagerank.build_links`` (heavy sources hashed into ~block-size rows
   BEFORE aggregation — no task ever holds the hub).

C. State join against the hub key — ``edges JOIN ranks ON src`` with all
   10M hub rows hashing to one reducer: plain shuffle join with AQE skew
   handling off vs on vs ``skew.split_by_degree`` (light shuffle join +
   heavy-side broadcast union).

Usage: python tools/skew_demo.py [n_edges] [hub_edges] [cpus] [partitions]
       [phases]
Defaults 64M / 10M / 32 / 64 / abc ("a"=pagerank, "b"=adjacency,
"c"=join; pass e.g. "c" to rerun just the join phase at a larger hub —
the hot-key straggler only comes to dominate wall-clock once
hub_rows / per-task-throughput exceeds the rest of the job).
"""

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sbustreamspot_core_spark.config import GraphParams
from sbustreamspot_core_spark.graph import skew
from sbustreamspot_core_spark.graph.pagerank import build_links, pagerank
from sbustreamspot_core_spark.session import get_spark

HUB = 0


def task_stats(log_dir: str) -> dict:
    """p50/p99/max task duration (ms) across the app from the event log."""
    durs = []
    for path in glob.glob(os.path.join(log_dir, "**", "*"), recursive=True):
        if not os.path.isfile(path) or "appstatus" in os.path.basename(path):
            continue
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerTaskEnd":
                    info = ev.get("Task Info") or {}
                    d = info.get("Finish Time", 0) - info.get("Launch Time", 0)
                    if d > 0:
                        durs.append(d)
    if not durs:
        return {}
    durs.sort()
    n = len(durs)
    return {"tasks": n, "task_p50_ms": durs[n // 2],
            "task_p99_ms": durs[min(n - 1, n * 99 // 100)],
            "task_max_ms": durs[-1],
            "task_max_over_p50": round(durs[-1] / max(durs[n // 2], 1), 1)}


def hub_edges_df(spark, n_edges, hub_edges, n_nodes, parts, direction):
    """Deterministic 64M-edge table: ``hub_edges`` rows touch the hub
    (as dst for 'in', src for 'out'), the rest are uniform hash edges."""
    r = spark.range(0, n_edges, 1, parts)
    uni_src = F.pmod(F.xxhash64(F.col("id")), n_nodes) + 1
    uni_dst = F.pmod(F.xxhash64(F.col("id") * 31 + 7), n_nodes) + 1
    is_hub = F.col("id") < hub_edges
    if direction == "in":
        src, dst = uni_src, F.when(is_hub, F.lit(HUB)).otherwise(uni_dst)
    else:
        src, dst = F.when(is_hub, F.lit(HUB)).otherwise(uni_src), uni_dst
    return (r.select(src.alias("src"), dst.alias("dst"))
            .filter("src != dst"))


def run_leg(name, n_edges, hub_edges, cpus, parts, fn, extra_conf=None):
    log_dir = tempfile.mkdtemp(prefix=f"skewlog_{name}_")
    conf = {"spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": log_dir, **(extra_conf or {})}
    spark = get_spark(f"skew_{name}", cpus=cpus, shuffle_partitions=parts,
                      extra_conf=conf)
    try:
        out = fn(spark)
    except Exception as e:          # an OOM/straggler blow-up IS a finding
        out = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
    finally:
        spark.stop()
        time.sleep(2)
    print(json.dumps({"leg": name, "edges": n_edges,
                      "hub_edges": hub_edges, **out,
                      **task_stats(log_dir)}), flush=True)


def main():
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000_000
    hub_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    parts = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    phases = sys.argv[5] if len(sys.argv) > 5 else "abc"
    n_nodes = max(n_edges // 10, 1000)

    # ---- A: PageRank, 10M-in-degree hub, default plan
    def leg_a(spark):
        g = hub_edges_df(spark, n_edges, hub_edges, n_nodes, parts,
                         "in").cache()
        real = g.count()
        t0 = time.time()
        res = pagerank(spark, g, GraphParams(
            num_partitions=parts, max_iters=4, tol=0.0,
            checkpoint_interval=4, edges_distinct=True))
        res.ranks.count()
        steps = [m["step_sec"] for m in res.metrics]
        tail = sorted(steps[1:] or steps)
        hub_rank = res.ranks.filter(F.col("id") == HUB).first()["rank"]
        return {"real_edges": real, "total_sec": round(time.time() - t0, 2),
                "steady_step_sec": round(tail[len(tail) // 2], 3),
                "hub_rank": round(hub_rank, 6)}
    if "a" in phases:
        run_leg("pagerank_inhub_default", n_edges, hub_edges, cpus, parts,
                leg_a)

    # ---- B: adjacency build, 10M-out-degree hub
    def make_b(which):
        def leg_b(spark):
            g = hub_edges_df(spark, n_edges, hub_edges, n_nodes, parts,
                             "out").cache()
            real = g.count()
            t0 = time.time()
            if which == "naive":
                out = g.groupBy("src").agg(
                    F.collect_list("dst").alias("targets"))
                n_rows = out.select(F.count("*")).first()[0]
            elif which == "salted":
                out = skew.salted_collect(g, ["src"], "dst")
                n_rows = out.select(F.count("*")).first()[0]
            else:
                out = build_links(g, GraphParams(num_partitions=parts,
                                                 edges_distinct=True))
                n_rows = out.select(F.count("*")).first()[0]
            return {"real_edges": real, "adj_rows": n_rows,
                    "build_sec": round(time.time() - t0, 2)}
        return leg_b
    if "b" in phases:
        for which in ("naive", "salted", "csr_blocked"):
            run_leg(f"adjacency_outhub_{which}", n_edges, hub_edges, cpus,
                    parts, make_b(which))

    # ---- C: state join on the hub key
    def make_c(which):
        def leg_c(spark):
            g = hub_edges_df(spark, n_edges, hub_edges, n_nodes, parts,
                             "out").cache()
            real = g.count()
            ranks = (spark.range(0, n_nodes + 1, 1, parts)
                     .select(F.col("id").alias("src"),
                             (F.lit(1.0) / n_nodes).alias("rank")).cache())
            ranks.count()
            degs = None
            if which == "split_reuse":
                # the engine's own degree table (pagerank init builds this
                # anyway for contributions): cached OUTSIDE the timer —
                # the leg measures the split's marginal cost when the
                # scan is amortized, vs split_broadcast which pays it
                degs = skew.degree_table(g, "out").cache()
                degs.count()
            t0 = time.time()
            if which in ("split_broadcast", "split_reuse"):
                thr = GraphParams().heavy_degree_threshold
                light, heavy = skew.split_by_degree(g, thr, key="src",
                                                    degrees=degs)
                heavy_states = ranks.join(
                    F.broadcast(skew.heavy_vertices(g, thr, "out",
                                                    degrees=degs)
                                .select(F.col("id").alias("src"))), "src")
                joined = (light.join(ranks.hint("shuffle_hash"), "src")
                          .unionByName(
                              heavy.join(F.broadcast(heavy_states), "src")))
            else:
                # no join hint: let the (AQE or static) planner handle the
                # hot key however it would by default
                joined = g.join(ranks, "src")
            total = joined.select(F.sum("rank")).first()[0]
            return {"real_edges": real, "join_sec": round(time.time() - t0, 2),
                    "rank_mass": round(total, 2)}
        return leg_c
    if "c" in phases:
        run_leg("join_outhub_plain_noaqe", n_edges, hub_edges, cpus, parts,
                make_c("plain"), {"spark.sql.adaptive.enabled": "false"})
        run_leg("join_outhub_plain_aqe", n_edges, hub_edges, cpus, parts,
                make_c("plain"))
        run_leg("join_outhub_split_broadcast", n_edges, hub_edges, cpus,
                parts, make_c("split_broadcast"))
        run_leg("join_outhub_split_reuse", n_edges, hub_edges, cpus,
                parts, make_c("split_reuse"))


if __name__ == "__main__":
    main()
