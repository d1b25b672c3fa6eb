"""Scaling probe for the StreamHash sketch kernel (CPU-dense path).

Usage: python tools/scaling_sketch_probe.py <cpus> <n_edges> [n_graphs]
Generates a deterministic StreamSpot-format edge table, builds shingles ->
chunk counts -> L=1000 StreamHash sketches + LSH bands, and reports kernel
wall time and edges/sec.  The hashing/projection work is Arrow-batched numpy
in Python workers, whose count scales with local[N].
"""

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sbustreamspot_core_spark.config import StreamSpotParams
from sbustreamspot_core_spark.operators.shingles import (
    build_adjacency,
    build_chunk_counts,
    build_shingles,
)
from sbustreamspot_core_spark.operators.sketch import build_sketches
from sbustreamspot_core_spark.session import get_spark


def main():
    cpus = int(sys.argv[1])
    n_edges = int(sys.argv[2])
    n_graphs = int(sys.argv[3]) if len(sys.argv) > 3 else max(n_edges // 200, 64)
    spark = get_spark(f"sk{cpus}", cpus=cpus, shuffle_partitions=cpus)
    r = spark.range(0, n_edges, 1, cpus)
    # node/edge types from a 20-letter alphabet -> rich chunk vocabulary
    letter = lambda seed: F.chr(F.lit(97) + (F.pmod(F.xxhash64(F.col("id") + seed), 20)))
    edges = r.select(
        (F.col("id") % n_graphs).alias("gid"),
        (F.pmod(F.xxhash64("id"), 1000).alias("src_id")),
        letter(1).alias("src_type"),
        (F.pmod(F.xxhash64(F.col("id") * 13 + 5), 1000).alias("dst_id")),
        letter(2).alias("dst_type"),
        letter(3).alias("e_type"),
        (F.col("id") / n_graphs).cast("long").alias("seq"),
    ).cache()
    edges.count()
    params = StreamSpotParams(chunk_length=8, L=1000, B=50, R=20)
    # warm the Python workers / Arrow path
    build_chunk_counts(build_shingles(build_adjacency(
        edges.filter("gid < 4"))), params.chunk_length).count()
    times = []
    for _ in range(5):
        t0 = time.time()
        cc = build_chunk_counts(build_shingles(build_adjacency(edges)),
                                params.chunk_length)
        n = build_sketches(cc, params).count()
        times.append(round(time.time() - t0, 2))
    best = min(times)
    print(json.dumps({
        "cpus": cpus, "edges": n_edges, "graphs": n,
        "kernel_sec": best, "runs": times,
        "edges_per_sec": round(n_edges / best, 1),
    }))


if __name__ == "__main__":
    main()
