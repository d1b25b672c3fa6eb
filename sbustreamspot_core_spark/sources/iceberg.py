"""Iceberg-style table source with parquet fallback.

The north rule's input is an Iceberg table of web pages.  This sandbox image
has no Iceberg runtime jars, so the loader tries the Iceberg DataSource and
falls back to a parquet directory with identical schema semantics; on a real
cluster with ``spark.sql.catalog.*`` configured the Iceberg path is taken
and snapshot/time-travel options pass through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, path_or_table: str,
               snapshot_id: int | None = None) -> DataFrame:
    """Read an Iceberg table (by catalog name or path); parquet fallback."""
    try:
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(path_or_table)
    except Exception:
        if snapshot_id is not None:
            raise ValueError(
                "snapshot reads need the Iceberg runtime on the classpath")
        return spark.read.parquet(path_or_table)


def write_table(df: DataFrame, path_or_table: str, mode: str = "append") -> None:
    """Write to an Iceberg table; parquet fallback (same layout contract the
    superstep checkpoints rely on: atomic directory commit + _SUCCESS)."""
    try:
        df.write.format("iceberg").mode(mode).save(path_or_table)
    except Exception:
        df.write.mode(mode).parquet(path_or_table)
