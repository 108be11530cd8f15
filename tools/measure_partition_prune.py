"""Measure hidden-partitioning merge/scan pruning vs range stats on
a RANDOM-key layout (the shape min/max stats cannot prune): bucket
partitioning bounds rewrites to the keys' buckets; the unpartitioned
twin rewrites every file. Structural columns (files rewritten /
admitted) are the ones that scale; local wall is job-overhead-bound.

Run: python tools/measure_partition_prune.py
"""
from __future__ import annotations

import shutil
import time

from pyspark.sql import functions as F

from traffic_forecast_etl_spark.session import get_spark
from traffic_forecast_etl_spark import tablefmt as TF

spark = get_spark(app_name="part-measure", shuffle_partitions=32)


def build(path: str, n_rows: int, spec):
    shutil.rmtree(path, ignore_errors=True)
    # random (hash-scrambled) key order: every file's [min, max]
    # spans the whole key domain, so range stats admit everything
    df = (
        spark.range(n_rows)
        .select(
            F.xxhash64(F.col("id")).alias("user_key"),
            F.col("id").alias("event_id"),
            (F.rand(7) * 100).alias("v"),
        )
    )
    TF.snapshot_write(
        spark, df, path, partition_spec=spec, stats_cols=["user_key"]
    )
    return df


def files_of(path):
    return {e["path"] for e in TF.manifest_files(path, TF.read_manifest(path))}


def merge_cost(path, batch):
    before = files_of(path)
    t0 = time.time()
    TF.snapshot_merge(spark, batch, path, keys=["user_key"])
    wall = time.time() - t0
    after = files_of(path)
    return wall, len(before - after), len(before)


for n_rows, buckets in ((500_000, 64),):
    base = build("/tmp/pm_flat", n_rows, None)
    part = build("/tmp/pm_part", n_rows, [("bucket", "user_key", buckets)])
    # 20 keys spread uniformly across the domain (every n/20-th id):
    # mid-domain values that overlap EVERY random-layout file's
    # [min, max] — the shape range stats cannot prune
    batch = (
        base.filter(F.pmod(F.col("event_id"), F.lit(n_rows // 20)) == 0)
        .withColumn("v", F.lit(0.0))
        .localCheckpoint()
    )
    # point-lookup scan planning on a mid-domain key (before merging)
    ks = sorted(r[0] for r in batch.select("user_key").collect())
    k = ks[len(ks) // 2]
    nf0 = len(files_of("/tmp/pm_flat"))
    np0 = len(files_of("/tmp/pm_part"))
    _, adm_f = TF.snapshot_scan_files("/tmp/pm_flat", "user_key", k, k)
    _, adm_p = TF.snapshot_scan_files("/tmp/pm_part", "user_key", k, k)
    print(
        f"point-lookup admits: flat {len(adm_f)}/{nf0}, "
        f"bucketed {len(adm_p)}/{np0}"
    )
    wf, rf, nf = merge_cost("/tmp/pm_flat", batch)
    wp, rp, np_ = merge_cost("/tmp/pm_part", batch)
    print(
        f"rows={n_rows} buckets={buckets}: flat rewrote {rf}/{nf} files "
        f"({wf:.2f}s); bucketed rewrote {rp}/{np_} files ({wp:.2f}s)"
    )

shutil.rmtree("/tmp/pm_flat", ignore_errors=True)
shutil.rmtree("/tmp/pm_part", ignore_errors=True)
