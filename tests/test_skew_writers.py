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


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key with the same bucket count
    join with NO Exchange on either side (SCALE.md's bucketing claim
    as an assertion), and the result matches the plain join."""
    from traffic_forecast_etl_spark.sinks import write_bucketed

    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_b", ["l_orderkey"], num_buckets=8,
                   sort_cols=["l_orderkey"], path=str(tmp_path / "li_b"))
    write_bucketed(o, "o_b", ["o_orderkey"], num_buckets=8,
                   sort_cols=["o_orderkey"], path=str(tmp_path / "o_b"))
    try:
        li_b, o_b = spark.table("li_b"), spark.table("o_b")
        joined = li_b.join(
            o_b.hint("merge"), li_b.l_orderkey == o_b.o_orderkey
        ).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"),
                                    F.max("o_totalprice").alias("p"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join must be exchange-free, and the groupBy on the SAME
        # bucket key rides the bucketing too -> no Exchange anywhere

        assert "Exchange" not in plan, plan[:2000]
        expected = (
            li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"), F.max("o_totalprice").alias("p"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, expected.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_range_clustered_files_have_disjoint_ranges(spark, tmp_path):
    """The data-skipping contract: after write_range_clustered, each
    parquet file's [min, max] for the cluster column must not overlap
    any other file's — that is exactly what lets footer-stats pruning
    skip files on range predicates at scale."""
    import pyarrow.parquet as pq

    from traffic_forecast_etl_spark.sources.writers import write_range_clustered

    path = str(tmp_path / "clustered")
    df = spark.range(0, 10000).withColumnRenamed("id", "k").withColumn(
        "v", F.col("k") % 97
    )
    # shuffle the input so clustering has real work to do
    write_range_clustered(df.orderBy(F.col("v")), path, ["k"], n_files=6)

    ranges = []
    import glob as _glob
    for f in _glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "k"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file ranges ({lo1},{hi1}) vs ({lo2},{hi2})"


def _file_col_ranges(path, colname):
    """Per-file [min, max] of a column from parquet footers."""
    import glob as _glob

    import pyarrow.parquet as pq

    out = []
    for f in sorted(_glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                if col.path_in_schema == colname:
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
    # noqa
        if mins:
            out.append((min(mins), max(maxs)))
    return out


def test_zorder_prunes_on_every_cluster_dim(spark, tmp_path):
    """The multi-dim data-skipping contract: after write_zorder on
    (x, y), a narrow range predicate on EITHER column admits only a
    fraction of the files by footer stats — whereas single-column
    range clustering on x leaves y's per-file ranges spanning
    everything (the gap z-ordering exists to close)."""
    from traffic_forecast_etl_spark.sources.writers import (
        write_range_clustered,
        write_zorder,
    )

    # independent 100x100 grid, shuffled input
    df = (
        spark.range(0, 10000)
        .withColumn("x", F.col("id") % 100)
        .withColumn("y", F.col("id") / 100)
        .withColumn("y", F.floor("y"))
        .orderBy(F.xxhash64("id"))
        .drop("id")
    )
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    write_zorder(df, zpath, ["x", "y"], n_files=16)
    write_range_clustered(df, rpath, ["x"], n_files=16)

    def admitting(ranges, lo, hi):
        return sum(1 for mn, mx in ranges if not (mx < lo or mn > hi))

    zx, zy = _file_col_ranges(zpath, "x"), _file_col_ranges(zpath, "y")
    n = len(zx)
    assert n >= 8
    # a 6-wide predicate on either dim admits at most half the files
    assert admitting(zx, 40, 45) <= n // 2, zx
    assert admitting(zy, 40, 45) <= n // 2, zy
    # contrast: range clustering on x prunes x perfectly but admits
    # EVERY file for the same y predicate
    ry = _file_col_ranges(rpath, "y")
    assert admitting(ry, 40, 45) == len(ry)
    # layout is invisible to readers: same rows, no helper column
    got = spark.read.parquet(zpath)
    assert got.columns == ["x", "y"]
    assert got.count() == 10000
    assert got.groupBy().agg(F.sum("x"), F.sum("y")).first() == df.groupBy().agg(
        F.sum("x"), F.sum("y")
    ).first()


def test_zorder_linear_strategy_and_validation(spark, tmp_path):
    from traffic_forecast_etl_spark.sources.writers import write_zorder

    df = spark.range(0, 1000).select(
        (F.col("id") % 10).alias("x"), (F.col("id") % 7).alias("y")
    )
    path = str(tmp_path / "zl")
    write_zorder(df, path, ["x", "y"], n_files=4, strategy="linear")
    assert spark.read.parquet(path).count() == 1000
    import pytest as _pytest

    with _pytest.raises(ValueError):
        write_zorder(df, path, ["x"], n_files=4)
    with _pytest.raises(ValueError):
        write_zorder(df, path, ["x", "y"], bits=32)
    with _pytest.raises(ValueError):
        write_zorder(df, path, ["x", "y"], strategy="bogus")
