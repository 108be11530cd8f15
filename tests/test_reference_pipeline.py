"""Golden-output tests on the reference's own 2015 data (SURVEY §5.2)
— guards the quirky semantics: hour-24 fold, truncating casts,
weekday encoding, global min-max normalization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from traffic_forecast_etl_spark.plans.training import (
    FEATURE_COLS,
    build_training_table,
    clean_weather,
    WEATHER_SCHEMA,
)
from traffic_forecast_etl_spark.sources.csv import read_csv_auto

WEATHER_CSV = "/root/reference/data/weatherdata2015.csv"
TRAFFIC_CSV = "/root/reference/data/TrafficCounts2015.csv"


@pytest.fixture(scope="module")
def full_data(spark):
    return build_training_table(spark, WEATHER_CSV, TRAFFIC_CSV).cache()


def test_golden_row_count(full_data):
    # notebook cell 8: 8,596 rows survive the inner join
    assert full_data.count() == 8596


def test_golden_schema(full_data):
    dtypes = dict(full_data.dtypes)
    assert dtypes["Month"] == "int"
    assert dtypes["Day"] == "int"
    assert dtypes["Hour"] == "int"
    assert dtypes["DayofWeek"] == "int"
    assert dtypes["isHoliday"] == "boolean"
    assert dtypes["Wind Speed"] == "int"
    assert dtypes["Temperature"] == "int"
    assert dtypes["Precipitation"] == "boolean"
    assert dtypes["Count"] == "double"
    assert full_data.columns == FEATURE_COLS + ["Count"]


def test_target_normalized(full_data):
    row = full_data.agg(
        F.min("Count").alias("lo"), F.max("Count").alias("hi")
    ).first()
    assert row.lo == 0.0 and row.hi == 1.0


def test_weekday_is_monday_zero(full_data, spark):
    # 2015-01-01 was a Thursday → pandas weekday() == 3
    jan1 = full_data.filter(
        (F.col("Month") == 1) & (F.col("Day") == 1)
    ).select("DayofWeek").distinct().collect()
    assert [r.DayofWeek for r in jan1] == [3]


def test_holiday_flag(full_data):
    # Jan 1 is Nieuwjaarsdag; Jan 2 is not a holiday
    jan1 = full_data.filter((F.col("Month") == 1) & (F.col("Day") == 1))
    jan2 = full_data.filter((F.col("Month") == 1) & (F.col("Day") == 2))
    assert jan1.filter(~F.col("isHoliday")).count() == 0
    assert jan2.filter(F.col("isHoliday")).count() == 0
    # King's Day 2015 (Apr 27) flagged too
    kd = full_data.filter((F.col("Month") == 4) & (F.col("Day") == 27))
    assert kd.count() > 0 and kd.filter(~F.col("isHoliday")).count() == 0


def test_golden_value_checksum(full_data):
    """Order-insensitive checksum over every cell of the 8,596-row
    cleaned table (SURVEY §5.2 'hash of the 9-column cleaned table').
    Pins the exact cleaning semantics end to end: a change to the
    hour-24 fold, a cast, the weekday encoding, the holiday calendar,
    or normalization moves this number."""
    from pyspark.sql import functions as F

    row_str = full_data.select(
        F.concat_ws(
            "|",
            "Month",
            "Day",
            "Hour",
            "DayofWeek",
            F.col("isHoliday").cast("string"),
            F.col("Wind Speed").cast("string"),
            "Temperature",
            F.col("Precipitation").cast("string"),
            F.round("Count", 9).cast("string"),
        ).alias("s")
    )
    chk = row_str.agg(
        F.sum(F.pmod(F.xxhash64("s"), F.lit(2**32))).alias("c")
    ).collect()[0].c
    assert chk == 18477432546025


def test_hour24_fold_same_day_quirk(spark):
    """KNMI hour 24 of day D maps to hour 0 of the SAME day (the
    reference's replace(24,0) without date increment — SURVEY §2.11);
    strict_midnight=True rolls the date instead."""
    raw = read_csv_auto(spark, WEATHER_CSV, schema=WEATHER_SCHEMA)
    folded = clean_weather(raw)
    jan1 = folded.filter(F.col("Date") == F.lit("2015-01-01").cast("date"))
    hours = sorted(r.Hour for r in jan1.select("Hour").collect())
    # 24 rows for Jan 1: original hours 1..24 → 0..23 on the same day
    assert len(hours) == 24 and hours == list(range(24))
    strict = clean_weather(raw, strict_midnight=True)
    jan1_strict = strict.filter(F.col("Date") == F.lit("2015-01-01").cast("date"))
    assert jan1_strict.count() == 23  # midnight row moved to Jan 2


def test_temperature_truncates_toward_zero(spark):
    """(T*0.1).astype(int): −55 deci-°C → −5 °C (toward zero), not −6
    (floor) — pandas/Spark parity on negative temperatures."""
    raw = spark.createDataFrame(
        [(260, 20150101, 1, 10, -55, -1, 0), (260, 20150101, 2, 10, 333, 0, 1)],
        WEATHER_SCHEMA,
    )
    out = {r.Hour: r.Temperature for r in clean_weather(raw).collect()}
    assert out == {1: -5, 2: 33}
