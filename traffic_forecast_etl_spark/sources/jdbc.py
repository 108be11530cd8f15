"""JDBC source/sink surface (SURVEY §2.1 S8-S11).

The reference talks to PostgreSQL through psycopg2 with string-built
SQL and per-row autocommit INSERTs (dags/utils.py:199-283). The
engine speaks JDBC through Spark's bound, batched, partitioned
reader/writer — no SQL string formatting, no row loops.

No database (or JDBC driver jar) ships in this environment, so
everything here builds *options* and defers connectivity; the sink
falls back to the parquet-backed idempotent sinks (sinks.py) which
implement the same ON-CONFLICT semantics.
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class JdbcConfig:
    """Connection settings (the database.ini surface, S11 —
    dags/database.ini:1-10, parsed at dags/utils.py:33-51)."""

    url: str
    user: str
    password: str
    driver: str = "org.postgresql.Driver"

    @classmethod
    def from_ini(cls, path: str, section: str = "postgresql") -> "JdbcConfig":
        cp = configparser.ConfigParser()
        cp.read(path)
        s = cp[section]
        host, port, db = s.get("host", "localhost"), s.get("port", "5432"), s["database"]
        return cls(
            url=f"jdbc:postgresql://{host}:{port}/{db}",
            user=s["user"],
            password=s["password"],
        )

    def options(self) -> dict[str, str]:
        return {
            "url": self.url,
            "user": self.user,
            "password": self.password,
            "driver": self.driver,
        }


def read_jdbc(
    spark: SparkSession,
    cfg: JdbcConfig,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """Partitioned JDBC scan: with a numeric ``partition_column`` and
    bounds, Spark issues ``num_partitions`` range-sliced queries in
    parallel instead of one serial cursor — the only way a JDBC read
    scales."""
    reader = spark.read.format("jdbc").options(**cfg.options()).option("dbtable", table)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    return reader.load()


def write_jdbc_append(df: DataFrame, cfg: JdbcConfig, table: str, batch_size: int = 10_000) -> None:
    """Batched, bound append (replaces the reference's per-row INSERT
    loop). Idempotence is achieved by staging through an anti-join
    first (sinks.insert_if_absent pattern) or a DB-side unique index +
    a staging table + INSERT ... SELECT ... ON CONFLICT."""
    (
        df.write.format("jdbc")
        .options(**cfg.options())
        .option("dbtable", table)
        .option("batchsize", batch_size)
        .mode("append")
        .save()
    )
