"""Operational-plane tests (SURVEY §5.4/§5.5): canned AccuWeather
payload with both temperature units, FK resolution, and the
run-twice idempotence contract (ON CONFLICT DO NOTHING parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from traffic_forecast_etl_spark import ml
from traffic_forecast_etl_spark.plans.forecast import (
    normalize_forecast,
    run_forecast_plane,
)
from traffic_forecast_etl_spark.plans.training import build_training_table
from traffic_forecast_etl_spark.sources.json_payload import (
    first_matching_location,
    read_json_payload,
)

PAYLOAD = [
    {
        "DateTime": "2015-06-01T13:00:00+02:00",
        "Temperature": {"Value": 71.0, "Unit": "F"},
        "Wind": {"Speed": {"Value": 12.3}},
        "HasPrecipitation": False,
    },
    {
        "DateTime": "2015-06-01T14:00:00+02:00",
        "Temperature": {"Value": 22.0, "Unit": "C"},
        "Wind": {"Speed": {"Value": 8.0}},
        "HasPrecipitation": True,
    },
]


def test_unit_branches(spark):
    """F-unit converts with truncation (int((71-32)*5/9) == 21);
    C-unit passes through (dags/utils.py:185-189 parity)."""
    out = {
        r.datetime.hour: r.temperature
        for r in normalize_forecast(read_json_payload(spark, PAYLOAD)).collect()
    }
    # 13:00+02:00 == 11:00 UTC
    assert out == {11: 21, 12: 22}


def test_payload_flatten_schema(spark):
    df = read_json_payload(spark, PAYLOAD)
    assert df.count() == 2
    assert set(df.columns) == {
        "datetime_raw",
        "temperature_value",
        "temperature_unit",
        "wind_speed",
        "has_precipitation",
    }


def test_location_lookup_intended_semantics():
    """First element whose EnglishName matches — NOT blindly element 0
    (the reference's misplaced break, SURVEY §2.11)."""
    payload = [
        {"EnglishName": "Utrecht2", "Key": "wrong"},
        {"EnglishName": "Utrecht", "Key": "right"},
    ]
    assert first_matching_location(None, payload, "Utrecht") == "right"
    assert first_matching_location(None, payload, "Nowhere") is None


def test_intensity_rounds_like_postgres(spark):
    """The reference inserts prediction*10 as a numeric literal into a
    Postgres INTEGER column, which ROUNDS: 0.47 → 5. A bare int cast
    truncates to 4 — pin the parity choice (ADVICE r01)."""
    from traffic_forecast_etl_spark.functions.units import rescale_intensity

    df = spark.createDataFrame([(0.47,), (0.44,), (0.05,)], "prediction double")
    out = df.select(
        F.round(rescale_intensity("prediction")).cast("int").alias("i")
    ).collect()
    assert [r.i for r in out] == [5, 4, 1]


@pytest.mark.slow
def test_forecast_plane_idempotent(spark, tmp_path):
    """Run the full plane twice with the same payload: second run
    appends 0 rows to both sinks; intensities are 0-10 scaled ints."""
    train = build_training_table(
        spark,
        "/root/reference/data/weatherdata2015.csv",
        "/root/reference/data/TrafficCounts2015.csv",
    )
    model = ml.fit(train.limit(2000), "dt")  # small/fast model — plumbing test
    wpath, tpath = str(tmp_path / "weather"), str(tmp_path / "traffic")

    n_w1, n_t1 = run_forecast_plane(spark, PAYLOAD, model, wpath, tpath)
    assert (n_w1, n_t1) == (2, 2)
    n_w2, n_t2 = run_forecast_plane(spark, PAYLOAD, model, wpath, tpath)
    assert (n_w2, n_t2) == (0, 0)

    weather = spark.read.parquet(wpath)
    traffic = spark.read.parquet(tpath)
    assert weather.count() == 2 and traffic.count() == 2
    # FK resolution: every traffic row carries a weather date_id
    assert traffic.filter(F.col("date_id").isNull()).count() == 0
    vals = [r.intensity for r in traffic.collect()]
    assert all(0 <= v <= 10 for v in vals)
