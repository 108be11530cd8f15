"""Idempotent sinks (SURVEY §2.1 S8-S10, §4 'not free' row).

The reference gets idempotence from Postgres `ON CONFLICT DO
NOTHING`, one row-at-a-time INSERT per forecast row
(dags/utils.py:206-215, 267-276). Spark has no upsert on plain
parquet and no enforced UNIQUE — the engine provides the set-based
equivalents:

  - ``insert_if_absent``: stage → anti-join against current sink keys
    → append only the new keys. Re-running the same batch is a no-op
    (the ON CONFLICT contract), and the write is one distributed
    append, not N commits.
  - ``merge_upsert``: delete-and-replace emulation of MERGE for
    engines without Delta/Iceberg (rewrite of the touched partition
    set): existing rows not matching the batch keys + the batch →
    overwrite. With a partitioned layout + dynamic partition
    overwrite, only touched date partitions rewrite.

Both take the sink as a *path* (parquet dir) — at 100 TB these would
be Delta/Iceberg tables and ``MERGE INTO`` (jars not shipped in this
environment; the API surface is the same).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def _sink_exists(spark: SparkSession, path: str) -> bool:
    # local-fs check is fine for this environment; on HDFS/S3 use the
    # Hadoop FileSystem API via spark._jvm (same semantics).
    return os.path.exists(path)


def insert_if_absent(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    keys: Sequence[str],
    partition_by: Sequence[str] | None = None,
) -> int:
    """Append rows of ``batch`` whose ``keys`` are not yet in the sink
    (exactly `INSERT ... ON CONFLICT DO NOTHING`). Returns the number
    of rows appended. Duplicate keys *within* the batch are collapsed
    to the first occurrence, like the reference's per-row conflict
    checks would."""
    deduped = batch.dropDuplicates(list(keys))
    if _sink_exists(spark, path):
        existing = spark.read.parquet(path).select(*keys)
        fresh = deduped.join(existing, on=list(keys), how="left_anti")
    else:
        fresh = deduped
    # count once, write the same (cached) frame — avoids recomputing
    # the anti-join twice
    fresh = fresh.cache()
    n = fresh.count()
    if n:
        writer = fresh.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
    fresh.unpersist()
    return n


def merge_upsert(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    keys: Sequence[str],
) -> None:
    """MERGE (upsert) emulation on a parquet sink: keep existing rows
    whose key is absent from the batch, union the batch, rewrite.
    Last-writer-wins per key within the batch is made deterministic by
    dropDuplicates on keys."""
    deduped = batch.dropDuplicates(list(keys))
    if _sink_exists(spark, path):
        existing = spark.read.parquet(path)
        kept = existing.join(deduped.select(*keys), on=list(keys), how="left_anti")
        out = kept.unionByName(deduped)
    else:
        out = deduped
    # stage to a sibling path first: Spark cannot lazily read and
    # overwrite the same parquet path in one job
    tmp = f"{path}__staging"
    out.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(path)
    # best-effort staging cleanup
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a hash-BUCKETED (and optionally sort-ordered)
    catalog table.

    This is the shuffle-elimination layout for repeated fact-fact
    joins and aggregations (SCALE.md §Joins): two tables bucketed by
    the same key into the same bucket count join with NO Exchange on
    either side — at 100 TB that's the difference between a network-
    bound job and a local merge. ``sort_cols`` additionally skips the
    per-task sort of a sort-merge join. The write itself costs one
    shuffle (hash-partition into buckets) — paid once, amortized over
    every later join/agg on that key.

    Bucketing metadata lives in the session catalog (``saveAsTable``;
    plain ``.parquet(path)`` writes cannot carry it). ``path`` makes
    it an external table (files owned by the caller).
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)
