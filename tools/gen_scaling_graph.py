"""Generate the scaling-probe edge table ONCE to parquet so every
core-count leg reads the identical (provably distinct) input.

Usage: python tools/gen_scaling_graph.py <n_edges> <out_parquet> [partitions]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sbustreamspot_core_spark.session import get_spark


def main():
    n_edges = int(sys.argv[1])
    out = sys.argv[2]
    partitions = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    n_nodes = max(n_edges // 10, 1000)
    spark = get_spark("gen_scaling_graph", cpus=32,
                      shuffle_partitions=partitions)
    r = spark.range(0, n_edges, 1, 32)
    src = F.pmod(F.xxhash64(F.col("id")), n_nodes)
    dst = (F.when(F.pmod(F.xxhash64(F.col("id") + 1), 16) == 0, F.lit(0))
           .otherwise(F.pmod(F.xxhash64(F.col("id") * 31 + 7), n_nodes)))
    g = (r.select(src.alias("src"), dst.alias("dst"))
         .filter("src != dst").distinct()
         .repartition(partitions))
    g.write.mode("overwrite").parquet(out)
    n = spark.read.parquet(out).count()
    print(f"wrote {out}: {n} distinct edges, {partitions} partitions")


if __name__ == "__main__":
    main()
