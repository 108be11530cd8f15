"""SparkSession factory.

The reference runs eagerly in one pandas process (SURVEY §3 E1); our
engine is lazy/distributed, so the session is where scale policy
lives: AQE on (runtime re-planning, partition coalescing, skew-join
splitting), shuffle partitions sized to the cluster (cores locally,
thousands on a real cluster), Arrow for every Python<->JVM hop, and a
pinned UTC session timezone so timestamp semantics are deterministic
and match the DuckDB correctness oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    # Adaptive execution: runtime shuffle-partition coalescing, skew-join
    # splitting, and dynamic join-strategy switching. At 100 TB this is
    # what turns a mis-sized static plan into a workable one.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # AQE's coalescing floor is BYTES-based (default 1m), but this
    # engine's hot stages are CPU-dense over slim rows — sketch
    # agreement, LSH bucket self-joins, candidate verification at
    # ~100 CPU-ops per 24-byte row — and a 1 MB floor can serialize
    # them onto a handful of cores exactly when upstream filtering
    # worked. r10 shipped 256k from a 6-key A/B; the r11 re-
    # adjudication (26 keys, 3 interleaved campaigns, 256k/512k/1m,
    # after the r11 operator rewrites) found 256k over-splits nearly
    # everything on the current plans — d2 4.37→2.80, t16 1.64→0.73,
    # g1 3.29→1.97, c9 3.31→2.13 going 256k→1m — with d11 the ONE
    # key preferring 256k (2.67 vs 4.02 at 1m). 512k takes d11's win
    # at half the cost (3.18) while matching 1m within noise
    # everywhere else: grand A/B totals 43.8 / 33.4 / 33.9 s for
    # 256k / 512k / 1m. At production totals the floor almost never
    # binds (parallelismFirst targets total/parallelism first);
    # override via extra_conf for byte-bound clusters.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "512k",
    # Arrow for createDataFrame/toPandas and pandas_udf batches.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp semantics (parquet timestamps are UTC
    # instants; DuckDB reads them naive-UTC — keep Spark in UTC too).
    "spark.sql.session.timeZone": "UTC",
    # Pushdown is on by default; pinned here as load-bearing policy.
    "spark.sql.parquet.filterPushdown": "true",
    # Whole-stage codegen silently disables for plans with >100 fields
    # (spark.sql.codegen.maxFields default). The shipped minhash
    # default (64 min-aggregate columns) fits under 100; this ceiling
    # exists so callers RAISING dedup.minhash_lsh_pairs est_hashes (up
    # to 600/8 packed words) keep codegen on — interpreted evaluation
    # measured ~13x slower on the signature pass. Janino splits the
    # generated methods, so a higher ceiling costs nothing elsewhere.
    "spark.sql.codegen.maxFields": "600",
    # Some sources write INT64 TIMESTAMP(NANOS) parquet (pandas
    # datetime64[ns]); Spark has no nanos timestamp — read as long and
    # let the table loader convert to microsecond TimestampType
    # (sources/tables.py TABLE_FIXUPS).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # The reference's quirky cleanup semantics (truncating casts,
    # lenient date parsing) need non-ANSI behavior in a few ops; we
    # keep ANSI ON (Spark 4 default) and use try_* / explicit trunc
    # instead, so bad data surfaces instead of silently corrupting.
}


def cpu_count() -> int:
    n = os.environ.get("SPARK_GRAFT_CPUS")
    if n:
        return int(n)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "traffic-forecast-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the singleton SparkSession.

    ``shuffle_partitions`` defaults to the local core count — the
    right size for local[N]; on a real cluster pass ~2-3× total cores
    (or rely on AQE coalescing from a higher initial value).
    """
    cores = cpu_count()
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cores}]"
    )
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cores)
    # local mode: driver is the only JVM — give it the machine.
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
    conf.setdefault("spark.ui.enabled", "false")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
