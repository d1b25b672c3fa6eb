"""StreamSpot edge-stream source and routing filters.

Reference: io.cpp:24-132 (mmap TSV scan, scenario filter, train/test routing).
Spark-side, the hand-rolled parser becomes a schema'd CSV scan; filters are
Catalyst predicates that push down to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DATASET_SCENARIOS

# graph.h:22-28 field layout; seq added by the engine (arrival order, needed
# because the reference relies on in-memory insertion order, graph.cpp:111).
EDGE_SCHEMA = T.StructType([
    T.StructField("src_id", T.LongType(), False),
    T.StructField("src_type", T.StringType(), False),
    T.StructField("dst_id", T.LongType(), False),
    T.StructField("dst_type", T.StringType(), False),
    T.StructField("e_type", T.StringType(), False),
    T.StructField("gid", T.LongType(), False),
])


def read_streamspot_edges(spark: SparkSession, path: str) -> DataFrame:
    """Read the reference's 6-field TSV edge format (io.cpp:57-96) and add a
    per-gid arrival-order ``seq`` column (file order within each graph)."""
    raw = (
        spark.read.schema(EDGE_SCHEMA)
        .option("sep", "\t")
        .csv(path)
        .withColumn("file_seq", F.monotonically_increasing_id())
    )
    # monotonically_increasing_id is ordering-stable within a single-file scan
    # split; for multi-file inputs the per-file offsets preserve file order.
    w_seq = F.row_number().over(Window.partitionBy("gid").orderBy("file_seq")) - 1
    return raw.withColumn("seq", w_seq.cast("long")).drop("file_seq")


def scenario_filter(edges: DataFrame, dataset: str = "all") -> DataFrame:
    """Keep edges whose scenario (= gid / 100, io.cpp:97) is selected for the
    dataset preset (main.cpp:128-146)."""
    scenarios = DATASET_SCENARIOS[dataset]
    return edges.filter((F.col("gid") / 100).cast("int").isin(*scenarios))


def train_test_split(edges: DataFrame, train_gids) -> tuple[DataFrame, DataFrame]:
    """Route edges to train iff gid in the bootstrap set (io.cpp:100-110)."""
    gids = list(train_gids)
    is_train = F.col("gid").isin(*gids) if gids else F.lit(False)
    return edges.filter(is_train), edges.filter(~is_train)
