"""Web-pipeline-at-scale demo: the full north-star flow at 10x the bench
page count.

Usage: python tools/web_demo.py [n_hosts] [pages_per_host] [cpus]
(defaults 4000 x 50 = 200k pages vs the bench's 400 x 50 = 20k)

Stages timed separately:
  1. generate Common-Crawl-style pages (distributed mapInPandas)
  2. byte-identical text extraction over every page (Arrow UDF)
  3. href -> link-edge extraction + host-subgraph edge build
  4. StreamHash sketches per host + LSH clusters + isolation anomalies
  5. PageRank over the full page-level link graph

Prints ONE JSON line with pages/sec and edges/sec per stage.
"""

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sbustreamspot_core_spark.config import GraphParams, StreamSpotParams
from sbustreamspot_core_spark.graph.pagerank import pagerank
from sbustreamspot_core_spark.pipeline import (
    encode_url_ids,
    extract_link_edges,
    host_anomaly_pipeline,
    with_extracted_text,
)
from sbustreamspot_core_spark.session import get_spark
from sbustreamspot_core_spark.sources.pages import generate_pages


def main():
    n_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    per_host = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark(f"web{cpus}", cpus=cpus, shuffle_partitions=cpus)
    out = {}

    t0 = time.time()
    pages = generate_pages(spark, n_hosts=n_hosts, pages_per_host=per_host,
                           num_partitions=cpus).cache()
    n_pages = pages.count()
    out["n_pages"] = n_pages
    out["gen_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    n_text = with_extracted_text(pages).select(
        F.sum(F.length("text"))).collect()[0][0]
    dt = time.time() - t0
    out["text_extract_sec"] = round(dt, 2)
    out["text_extract_pages_per_sec"] = round(n_pages / dt, 1)
    out["text_bytes"] = int(n_text)

    t0 = time.time()
    links = extract_link_edges(pages).cache()
    n_links = links.count()
    dt = time.time() - t0
    out["n_link_edges"] = n_links
    out["href_extract_sec"] = round(dt, 2)
    out["href_edges_per_sec"] = round(n_links / dt, 1)

    t0 = time.time()
    res = host_anomaly_pipeline(
        spark, pages, StreamSpotParams(chunk_length=8, L=1000, B=50, R=20),
        GraphParams(num_partitions=cpus, max_iters=30))
    out["n_host_sketches"] = res["sketches"].count()
    out["n_anomalous_hosts"] = res["anomalies"].count()
    out["n_lsh_clusters"] = res["lsh_clusters"].select(
        "lsh_cluster").distinct().count()
    out["sketch_pipeline_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    # materialize: pagerank init scans its input several times, and the
    # href-extraction UDF plan must not be re-derived on each scan
    ids = encode_url_ids(links).select("src", "dst").cache()
    ids.count()
    pr = pagerank(spark, ids.select("src", "dst"),
                  GraphParams(num_partitions=cpus, max_iters=10, tol=1e-6,
                              checkpoint_interval=4))
    top = pr.ranks.orderBy(F.desc("rank")).limit(1).collect()[0]
    dt = time.time() - t0
    out["pagerank_sec"] = round(dt, 2)
    out["pagerank_supersteps"] = pr.supersteps
    out["pagerank_edges_per_sec"] = round(n_links * pr.supersteps / dt, 1)
    out["top_rank"] = round(top.rank, 6)   # the planted mega-hub dominates

    out["total_sec"] = round(sum(
        out[k] for k in ("gen_sec", "text_extract_sec", "href_extract_sec",
                         "sketch_pipeline_sec", "pagerank_sec")), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
