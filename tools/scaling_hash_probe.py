"""Scaling probe for the raw StreamHash hashing kernel (X3): one stage, no
shuffle — mapInPandas numpy matmul over generated chunk strings.

Usage: python tools/scaling_hash_probe.py <cpus> <n_chunks>
"""

import json
import sys
import time

sys.path.insert(0, ".")

import pandas as pd
from pyspark.sql import functions as F

from sbustreamspot_core_spark.functions.hashing import hashmulti_batch
from sbustreamspot_core_spark.rng import allocate_random_bits
from sbustreamspot_core_spark.session import get_spark

L, C = 1000, 8


def main():
    cpus = int(sys.argv[1])
    n = int(sys.argv[2])
    spark = get_spark(f"h{cpus}", cpus=cpus, shuffle_partitions=cpus)
    H = allocate_random_bits(L, C, 23)

    chunk_col = F.concat(*[
        F.chr(F.lit(97) + (F.pmod(F.xxhash64(F.col("id") + i), 26)))
        for i in range(C)
    ])
    chunks = spark.range(0, n, 1, cpus).select(chunk_col.alias("chunk")).cache()
    chunks.count()

    def hash_batches(it):
        for pdf in it:
            bits = hashmulti_batch(pdf["chunk"].tolist(), H)
            yield pd.DataFrame({"s": [int(bits.sum())]})

    # warmup (spawns python workers)
    chunks.limit(1000).mapInPandas(hash_batches, "s long").count()
    times = []
    for _ in range(5):
        t0 = time.time()
        chunks.mapInPandas(hash_batches, "s long").agg(F.sum("s")).collect()
        times.append(round(time.time() - t0, 2))
    best = min(times)
    print(json.dumps({
        "cpus": cpus, "chunks": n, "kernel_sec": best, "runs": times,
        "hashes_per_sec": round(n * L / best, 1),
        "chunks_per_sec": round(n / best, 1),
    }))


if __name__ == "__main__":
    main()
