"""Skew-safe operators and partitioned writers."""

from __future__ import annotations

from pyspark.sql import functions as F

from traffic_forecast_etl_spark.operators.skew import salted_aggregate, salted_join
from traffic_forecast_etl_spark.sources.tables import load_table
from traffic_forecast_etl_spark.sources.writers import (
    read_partitioned,
    write_date_partitioned,
)


def test_salted_aggregate_matches_plain(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    plain = {
        r.l_returnflag: (round(r.s, 6), r.c, round(r.a, 6))
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("s"),
            F.count("l_quantity").alias("c"),
            F.avg("l_quantity").alias("a"),
        )
        .collect()
    }
    salted = {
        r.l_returnflag: (round(r.sum_l_quantity, 6), r.count_l_quantity, round(r.avg_l_quantity, 6))
        for r in salted_aggregate(
            li, ["l_returnflag"], {"l_quantity": "sum"}, n_salts=8
        )
        .join(
            salted_aggregate(li, ["l_returnflag"], {"l_quantity": "count"}, n_salts=8),
            "l_returnflag",
        )
        .join(
            salted_aggregate(li, ["l_returnflag"], {"l_quantity": "avg"}, n_salts=8),
            "l_returnflag",
        )
        .collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s")
    ).collect()[0]
    salted = salted_join(li, o, ["l_orderkey"], n_salts=8).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s")
    ).collect()[0]
    assert (plain.n, plain.s) == (salted.n, salted.s)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    ev = load_table(spark, "events", sf_dir)
    path = str(tmp_path / "events_by_day")
    write_date_partitioned(ev, path, "ts")
    back = read_partitioned(spark, path)
    assert back.count() == ev.count()
    pruned = back.filter(F.col("dt") == "2024-01-05")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filter must reach the scan (directory-level pruning)
    assert "PartitionFilters: [isnotnull(dt" in plan, plan[:500]
    n_all_days = ev.select(F.col("ts").cast("date")).distinct().count()
    assert pruned.count() == ev.filter(F.col("ts").cast("date") == "2024-01-05").count()
    assert n_all_days > 1


def test_dynamic_partition_overwrite_touches_only_written_days(spark, sf_dir, tmp_path):
    ev = load_table(spark, "events", sf_dir)
    path = str(tmp_path / "dyn")
    write_date_partitioned(ev, path, "ts")
    first = read_partitioned(spark, path)
    before_jan5 = first.filter(F.col("dt") == "2024-01-05").count()
    before_other = first.filter(F.col("dt") != "2024-01-05").count()
    assert before_jan5 > 1 and before_other > 0
    # overwrite ONLY Jan 5 with a single row
    one = ev.filter(F.col("ts").cast("date") == "2024-01-05").limit(1)
    write_date_partitioned(one, path, "ts", mode="overwrite")
    after = read_partitioned(spark, path)
    assert after.filter(F.col("dt") == "2024-01-05").count() == 1  # replaced
    assert after.filter(F.col("dt") != "2024-01-05").count() == before_other  # untouched
