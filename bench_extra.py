"""Round-7 optimization harness (guide §1): per-query isolation + plan capture.

NOT the driver bench — bench.py is frozen.  This file exists so optimization
measurements are reproducible and load-stamped:

- each phase is timed separately with `os.getloadavg()` recorded per sample
  (the round-6 verdict's adjudication gap: min-vs-median disputes need load
  evidence inside the artifact);
- DataFrame-returning phases are forced through the noop sink
  (`format("noop")`) so the computation is timed, not the sink (guide §1.4);
- `--explain` dumps `.explain("formatted")` per phase into plans/r07/.

Usage:
    python bench_extra.py                      # run all phases, 3 samples
    python bench_extra.py --phases pagerank,triangles --samples 5
    python bench_extra.py --explain            # also write plans/r07/*.txt
    python bench_extra.py --suffix after       # plans named <phase>_after.txt

Env contract matches bench.py: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
Prints one JSON line per (phase, sample) and a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sbustreamspot_core_spark.config import GraphParams, StreamSpotParams
from sbustreamspot_core_spark.graph.components import connected_components
from sbustreamspot_core_spark.graph.pagerank import pagerank
from sbustreamspot_core_spark.graph.triangles import triangle_count
from sbustreamspot_core_spark.operators.ann import brute_force_topk
from sbustreamspot_core_spark.operators.dedup import (
    exact_jaccard_for_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
)
from sbustreamspot_core_spark.operators.lsh import candidate_pairs
from sbustreamspot_core_spark.operators.shingles import (
    build_adjacency,
    build_chunk_counts,
    build_shingles,
)
from sbustreamspot_core_spark.operators.sketch import build_sketches, sketch_bands
from sbustreamspot_core_spark.session import get_spark
from sbustreamspot_core_spark.sources.docs import (
    generate_variant_docs,
    planted_near_dup_pairs,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EDGES = int(os.environ.get("BENCH_EDGES", "2000000"))
N_NODES = max(N_EDGES // 10, 1000)
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")


def gen_graph(spark):
    r = spark.range(0, N_EDGES, 1, CPUS)
    src = F.pmod(F.xxhash64(F.col("id")), N_NODES)
    dst = F.when(F.pmod(F.xxhash64(F.col("id") + 1), 16) == 0, F.lit(0)) \
        .otherwise(F.pmod(F.xxhash64(F.col("id") * 31 + 7), N_NODES))
    return r.select(src.alias("src"), dst.alias("dst")).filter("src != dst")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", default="all")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--suffix", default="before",
                    help="plans/r07/<phase>_<suffix>.txt")
    args = ap.parse_args()

    spark = get_spark("bench_extra", cpus=CPUS, shuffle_partitions=CPUS)
    sc = spark.sparkContext

    graph = gen_graph(spark).cache()
    graph.count()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ss_edges = ev.select(
        F.col("user_id").alias("gid"),
        F.col("user_id").alias("src_id"),
        F.lit("u").alias("src_type"),
        F.col("event_id").alias("dst_id"),
        F.substring("event_type", 1, 1).alias("dst_type"),
        F.lit("t").alias("e_type"),
        F.col("event_id").alias("seq"),
    )
    ss_params = StreamSpotParams(chunk_length=10, L=1000, B=50, R=20)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

    # ---- phase definitions ---------------------------------------------
    # Each phase fn returns an optional DataFrame for --explain capture.

    def ph_pagerank():
        params = GraphParams(num_partitions=CPUS, max_iters=5,
                             tol=0.0, checkpoint_interval=3)
        res = pagerank(spark, graph, params)
        res.ranks.count()
        return res.ranks

    def ph_cc():
        params = GraphParams(num_partitions=CPUS, max_iters=30,
                             checkpoint_interval=5)
        res = connected_components(spark, graph, params=params)
        res.components.count()
        return res.components

    def ph_triangles():
        triangle_count(spark, graph, GraphParams(num_partitions=CPUS))
        from sbustreamspot_core_spark.graph.triangles import (
            _edge_common_out_neighbors,
        )
        return (_edge_common_out_neighbors(graph)
                .agg(F.coalesce(F.sum(F.size("w")), F.lit(0)).cast("long")))

    def ph_sketches():
        cc_df = build_chunk_counts(
            build_shingles(build_adjacency(ss_edges)), ss_params.chunk_length)
        sk = build_sketches(cc_df, ss_params).cache()
        sk.count()
        bands = sketch_bands(sk, ss_params)
        candidate_pairs(bands).count()
        sk.unpersist()
        return None

    def ph_minhash_sigs():
        noop(minhash_signatures(docs, num_hashes=64, n=5))
        return minhash_signatures(docs, num_hashes=64, n=5)

    def ph_minhash_lsh():
        sigs = minhash_signatures(docs, num_hashes=64, n=5).cache()
        sigs.count()
        minhash_lsh_candidates(sigs, bands=16, max_bucket_size=None).count()
        out = minhash_lsh_candidates(sigs, bands=16, max_bucket_size=None)
        sigs.unpersist()
        return out

    def ph_ann():
        df = brute_force_topk(emb, emb.filter("vec_id < 8"), k=10)
        df.count()
        return df

    def ph_lineitem():
        df = (li.filter(F.col("l_shipdate") < "1998-01-01")
              .groupBy("l_returnflag", "l_linestatus")
              .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
                   .alias("q"),
                   F.count("*").alias("n")))
        df.collect()
        return df

    def ph_web():
        from sbustreamspot_core_spark.pipeline import host_anomaly_pipeline
        from sbustreamspot_core_spark.sources.pages import generate_pages
        pages = generate_pages(spark, n_hosts=400, pages_per_host=50,
                               num_partitions=CPUS).cache()
        pages.count()
        out = host_anomaly_pipeline(
            spark, pages, StreamSpotParams(chunk_length=8, L=1000, B=50, R=20),
            GraphParams(num_partitions=8, max_iters=30, checkpoint_interval=3,
                        small_graph_threshold=65536))
        out["sketches"].count()
        out["anomalies"].count()
        out["lsh_clusters"].select("lsh_cluster").distinct().count()
        from sbustreamspot_core_spark.operators.lsh import isolated_vs_others
        iso_plan = isolated_vs_others(out["bands"])
        out["edges"].unpersist()
        out["sketches"].unpersist()
        out["bands"].unpersist()
        pages.unpersist()
        return iso_plan

    # dedup10x sub-phases (bench.py times these as ONE 120-160 s block; the
    # optimization needs to know where inside it the time goes)
    d_state = {}

    def ph_d10_gen():
        vdocs = generate_variant_docs(spark, n_bases=5000, variants=10,
                                      tokens_per_doc=100, mutate_tokens=10,
                                      num_partitions=CPUS).cache()
        vdocs.count()
        d_state["vdocs"] = vdocs
        return None

    def ph_d10_sigs():
        sigs = minhash_signatures(d_state["vdocs"], num_hashes=64, n=5).cache()
        sigs.count()
        d_state["sigs"] = sigs
        return None

    def ph_d10_cands():
        cands = minhash_lsh_candidates(d_state["sigs"], bands=16).cache()
        cands.count()
        d_state["cands"] = cands
        return None

    def ph_d10_jaccard():
        jac = exact_jaccard_for_pairs(d_state["vdocs"], d_state["cands"],
                                      n=5).cache()
        jac.filter("jaccard >= 0.5").count()
        d_state["jac"] = jac
        return exact_jaccard_for_pairs(d_state["vdocs"], d_state["cands"], n=5)

    def ph_d10_truth():
        planted = planted_near_dup_pairs(d_state["vdocs"])
        truth = exact_jaccard_for_pairs(d_state["vdocs"], planted, n=5) \
            .filter("jaccard >= 0.5").select("id_a", "id_b").cache()
        truth.count()
        truth.join(d_state["cands"], ["id_a", "id_b"], "left_semi").count()
        for k in ("vdocs", "sigs", "cands", "jac"):
            if k in d_state:
                d_state.pop(k).unpersist()
        return None

    all_phases = [
        ("pagerank", ph_pagerank),
        ("connected_components", ph_cc),
        ("triangle_count", ph_triangles),
        ("streamspot_sketch_lsh", ph_sketches),
        ("minhash_sigs", ph_minhash_sigs),
        ("minhash_lsh", ph_minhash_lsh),
        ("ann_topk", ph_ann),
        ("lineitem_agg", ph_lineitem),
        ("web_pipeline", ph_web),
        ("dedup10x_gen", ph_d10_gen),
        ("dedup10x_sigs", ph_d10_sigs),
        ("dedup10x_cands", ph_d10_cands),
        ("dedup10x_jaccard", ph_d10_jaccard),
        ("dedup10x_truth", ph_d10_truth),
    ]
    want = (None if args.phases == "all"
            else set(args.phases.split(",")))
    dedup_chain = [n for n, _ in all_phases if n.startswith("dedup10x_")]
    if want and any(p in want for p in dedup_chain):
        # sub-phases share cached state: selecting any pulls the whole chain
        want.update(dedup_chain)
    phases = [(n, f) for n, f in all_phases if want is None or n in want]

    results: dict[str, list] = {}
    for s in range(args.samples):
        for name, fn in phases:
            sc.setJobDescription(f"r7:{name}:s{s}")
            la0 = os.getloadavg()
            t0 = time.time()
            df = fn()
            dt = round(time.time() - t0, 3)
            rec = {"phase": name, "sample": s, "sec": dt,
                   "loadavg": [round(x, 2) for x in la0]}
            results.setdefault(name, []).append(rec)
            print(json.dumps(rec), flush=True)
            if args.explain and s == 0 and df is not None:
                os.makedirs(PLAN_DIR, exist_ok=True)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
                with open(os.path.join(
                        PLAN_DIR, f"{name}_{args.suffix}.txt"), "w") as f:
                    f.write(plan)
            sc.setJobDescription(None)

    summary = {
        "metric": "r7_phase_min_sec",
        "phases": {n: min(r["sec"] for r in rs) for n, rs in results.items()},
        "medians": {n: sorted(r["sec"] for r in rs)[len(rs) // 2]
                    for n, rs in results.items()},
        "samples": args.samples,
        "cpus": CPUS,
        "sf_dir": SF_DIR,
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
