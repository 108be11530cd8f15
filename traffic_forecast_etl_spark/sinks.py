"""Idempotent sinks (SURVEY §2.1 S8-S10, §4 'not free' row).

The reference gets idempotence from Postgres `ON CONFLICT DO
NOTHING`, one row-at-a-time INSERT per forecast row
(dags/utils.py:206-215, 267-276). Spark has no upsert on plain
parquet and no enforced UNIQUE — the engine provides the set-based
equivalents:

  - ``insert_if_absent``: stage → anti-join against the sink keys
    RESTRICTED to the batch's key range (pushed filter / partition
    pruning — the scan is O(batch window), not O(sink lifetime)) →
    append only the new keys. Re-running the same batch is a no-op
    (the ON CONFLICT contract), and the write is one distributed
    append, not N commits.
  - ``merge_upsert``: MERGE emulation for engines without
    Delta/Iceberg. With ``partition_by``, only the partitions the
    batch touches are read and rewritten (dynamic partition
    overwrite); unpartitioned sinks rewrite through a uniquely-named
    staging dir swapped by rename.

Both take the sink as a *path* (parquet dir) — at 100 TB these would
be Delta/Iceberg tables and ``MERGE INTO`` (jars not shipped in this
environment; the API surface is the same).
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _sink_exists(spark: SparkSession, path: str) -> bool:
    # local-fs check is fine for this environment; on HDFS/S3 use the
    # Hadoop FileSystem API via spark._jvm (same semantics).
    return os.path.exists(path)


def fresh_rows(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    keys: Sequence[str],
    range_key: str | None = None,
) -> DataFrame:
    """The rows of ``batch`` (key-deduped) whose ``keys`` are absent
    from the sink at ``path`` — the plan ``insert_if_absent`` appends.
    Exposed so the pruning contract is testable: the existing-side
    scan must carry a pushed/partition filter on the batch's
    ``range_key`` range (see insert_if_absent docstring for why that
    restriction is sound)."""
    deduped = batch.dropDuplicates(list(keys))
    if not _sink_exists(spark, path):
        return deduped
    rk = range_key or keys[0]
    lo, hi = deduped.agg(F.min(rk), F.max(rk)).first()
    # project the range key too when it is not a key column (e.g. a
    # time-ranged scan of a hash-keyed sink); the extra column rides
    # on the anti-join's build side and never reaches the output
    existing = spark.read.parquet(path).select(*dict.fromkeys([*keys, rk]))
    if lo is not None:
        existing = existing.filter(F.col(rk).between(F.lit(lo), F.lit(hi)))
    return deduped.join(existing, on=list(keys), how="left_anti")


def insert_if_absent(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    keys: Sequence[str],
    partition_by: Sequence[str] | None = None,
    range_key: str | None = None,
) -> int:
    """Append rows of ``batch`` whose ``keys`` are not yet in the sink
    (exactly `INSERT ... ON CONFLICT DO NOTHING`). Returns the number
    of rows appended. Duplicate keys *within* the batch are collapsed
    to the first occurrence, like the reference's per-row conflict
    checks would.

    The existing-side scan is restricted to the batch's
    ``[min, max]`` range of ``range_key`` (default: ``keys[0]``)
    before the anti-join — it stops the anti-join from rereading the
    sink's entire accumulated history every batch. The predicate
    reaches the parquet scan as a pushed min/max filter; with a
    layout partitioned on (a function of) the range key it becomes
    partition pruning. A steady 12-h ingest (reference
    dags/traffic_dag.py cadence) therefore scans O(batch window), not
    O(sink lifetime).

    Soundness: when ``range_key`` is a key column, a sink row equal
    to a batch row on ALL keys necessarily falls inside the batch's
    range of it. A non-key ``range_key`` (e.g. the timestamp a
    surrogate hash key derives from — the traffic sink's shape, where
    a range on the hash itself prunes nothing) is sound iff its value
    is functionally determined by the keys; that contract is the
    caller's to uphold and is documented at the call site.
    """
    fresh = fresh_rows(spark, batch, path, keys, range_key)
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
    partition_by: Sequence[str] | None = None,
) -> None:
    """MERGE (upsert) emulation on a parquet sink: keep existing rows
    whose key is absent from the batch, union the batch, rewrite.
    Last-writer-wins per key within the batch is made deterministic by
    dropDuplicates on keys.

    With ``partition_by`` the rewrite is PARTITION-SCOPED: only the
    partitions the batch touches are read (pruned scan) and rewritten
    (dynamic partition overwrite) — untouched history is never moved.
    A 12-h batch against a years-deep sink rewrites two date
    partitions, not the sink. CONTRACT: partition values must be
    functionally determined by ``keys`` (the date-derived-from-key
    layout this engine writes). If a key could change partitions
    between batches, its old row in the untouched partition would
    survive the merge — that shape needs the unpartitioned path or a
    transactional MERGE. Without ``partition_by`` the whole sink
    rewrites (unavoidable for an unpartitioned parquet dir) through a
    unique staging dir swapped in by rename.

    Not transactional, single-writer: unique staging means merges
    never collide on a shared staging dir and a complete copy exists
    until the swap, but the rename swap itself is not safe against a
    CONCURRENT merge or reader of the same sink (a reader can observe
    the gap between the two renames), and a crash between renames
    leaves the sink under the ``__old`` name. The real 100 TB answer
    is Delta/Iceberg `MERGE INTO` — jars absent here, same call
    shape.
    """
    deduped = batch.dropDuplicates(list(keys))
    exists = _sink_exists(spark, path)

    if partition_by and exists:
        if not deduped.limit(1).count():
            return  # empty batch: MERGE of nothing is a no-op
        # restrict the existing-side read to the touched partitions
        touched = deduped.select(*partition_by).distinct().collect()
        pred = None
        for row in touched:
            clause = None
            for c in partition_by:
                eq = F.col(c).eqNullSafe(F.lit(row[c]))
                clause = eq if clause is None else (clause & eq)
            pred = clause if pred is None else (pred | clause)
        existing = spark.read.parquet(path).filter(pred)
        kept = existing.join(deduped.select(*keys), on=list(keys), how="left_anti")
        # localCheckpoint breaks the plan's lineage to `path` so Spark
        # allows overwriting a path the job was derived from; it also
        # materializes only the touched partitions (small per batch)
        out = kept.unionByName(deduped).localCheckpoint(eager=True)
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by)
            .parquet(path)
        )
        return

    if exists:
        existing = spark.read.parquet(path)
        kept = existing.join(deduped.select(*keys), on=list(keys), how="left_anti")
        out = kept.unionByName(deduped)
    else:
        out = deduped
    # unique staging dir (concurrent merges can't collide), then a
    # rename swap: the previous complete copy survives until the new
    # one is in place
    token = uuid.uuid4().hex
    tmp = f"{path}__staging_{token}"
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    old = f"{path}__old_{token}"
    if exists:
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


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


def clean_orphaned_staging(path: str, older_than_seconds: float = 3600.0) -> list[str]:
    """Janitor for the non-transactional sink protocol: a crash
    between merge_upsert's / compact_partition's rename pair leaves
    `__staging_*` / `__old_*` / `__compact_*` / `__precompact_*`
    siblings (and expire_date_partitions' in-table `__expired_*`
    dirs) holding dead bytes forever. Remove those older than
    ``older_than_seconds`` (mtime); age-gating keeps a CONCURRENT
    in-flight merge's fresh staging dir safe — pick the gate above
    the longest plausible write. Returns removed paths.

    The Delta/Iceberg form of this janitor is VACUUM; same contract
    (age-gated, safe against in-flight writers within the gate).
    """
    import time

    markers = ("__staging_", "__old_", "__compact_", "__precompact_", "__expired_")
    now = time.time()
    removed: list[str] = []
    parent = os.path.dirname(os.path.abspath(path)) or "."
    base = os.path.basename(os.path.abspath(path))
    cands = [
        os.path.join(parent, d)
        for d in (os.listdir(parent) if os.path.isdir(parent) else [])
        if d.startswith(base + "__")
    ]
    if os.path.isdir(path):
        cands.extend(
            os.path.join(path, d)
            for d in os.listdir(path)
            if d.startswith("__expired_")
        )
    for full in cands:
        name = os.path.basename(full)
        if not any(m in name for m in markers) or not os.path.isdir(full):
            continue
        if now - os.path.getmtime(full) < older_than_seconds:
            continue
        shutil.rmtree(full, ignore_errors=True)
        # only report dirs that are actually gone — a failed delete
        # (permissions, concurrent access) must not read as removed
        if not os.path.exists(full):
            removed.append(full)
    return removed
