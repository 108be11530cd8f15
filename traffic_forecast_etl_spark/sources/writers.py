"""Partitioned table writers (SCALE.md 'Layout' row).

At 100 TB every time-series table is date-partitioned so that
time-ranged scans prune at the directory level before any IO. These
helpers pin that layout policy (and the test proves pruning happens:
the physical plan's partition count drops).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    mode: str = "overwrite",
    extra_partition_cols: Sequence[str] | None = None,
) -> None:
    """Write parquet partitioned by the date of ``ts_col`` (directory
    per day: dt=YYYY-MM-DD). Dynamic partition overwrite replaces only
    the partitions present in ``df`` — the idempotent-rewrite shape
    merge_upsert uses at scale."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    out = df.withColumn("dt", F.col(ts_col).cast("date").cast("string"))
    cols = ["dt", *(extra_partition_cols or [])]
    out.write.mode(mode).partitionBy(*cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned table; filters on ``dt`` prune partitions
    before file listing IO (PartitionFilters in the scan node)."""
    return spark.read.parquet(path)
