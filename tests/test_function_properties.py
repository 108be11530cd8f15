"""Property-based parity tests (hypothesis) for the scalar functions
whose semantics silently diverge between engines (SURVEY §7 'hard
parts'): truncating casts, hour-24 fold, multi-format date parsing,
decimal-comma parsing, min-max normalization.

Each property materializes ONE Spark job over a generated batch (not
one job per example) and compares against plain-Python/pandas
reference semantics.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from traffic_forecast_etl_spark.functions.dates import fold_hour_24, parse_date_multi
from traffic_forecast_etl_spark.functions.strings import decimal_comma_to_double
from traffic_forecast_etl_spark.functions.units import (
    decicelsius_to_celsius,
    fahrenheit_to_celsius,
    minmax_normalize_expr,
)

SETTINGS = settings(max_examples=10, deadline=None)


@SETTINGS
@given(st.lists(st.integers(min_value=-100, max_value=400), min_size=1, max_size=50))
def test_decicelsius_truncates_toward_zero(spark, values):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i int, t int")
    got = {r.i: r.c for r in df.select("i", decicelsius_to_celsius("t").alias("c")).collect()}
    for i, v in enumerate(values):
        assert got[i] == int(v * 0.1), (v, got[i])  # python int() truncates toward zero


@SETTINGS
@given(st.lists(st.floats(min_value=-200, max_value=400, allow_nan=False), min_size=1, max_size=50))
def test_fahrenheit_truncates(spark, values):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i int, f double")
    got = {r.i: r.c for r in df.select("i", fahrenheit_to_celsius(F.col("f")).alias("c")).collect()}
    for i, v in enumerate(values):
        assert got[i] == int((v - 32) * 5 / 9)


@SETTINGS
@given(st.lists(st.integers(min_value=0, max_value=24), min_size=1, max_size=50))
def test_hour24_fold(spark, hours):
    df = spark.createDataFrame([(i, h) for i, h in enumerate(hours)], "i int, h int")
    got = {r.i: r.o for r in df.select("i", fold_hour_24("h").alias("o")).collect()}
    for i, h in enumerate(hours):
        assert got[i] == (0 if h == 24 else h)


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.dates(min_value=dt.date(1900, 1, 1), max_value=dt.date(2100, 1, 1)),
            st.sampled_from(["%Y-%m-%d", "%d-%m-%Y"]),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_multiformat_date_parse(spark, items):
    rows = [(i, d.strftime(fmt)) for i, (d, fmt) in enumerate(items)]
    df = spark.createDataFrame(rows, "i int, s string")
    got = {r.i: r.d for r in df.select("i", parse_date_multi("s").alias("d")).collect()}
    for i, (d, fmt) in enumerate(items):
        if fmt == "%d-%m-%Y" and d.day <= 12:
            # genuinely ambiguous string: first format wins by design
            parsed = dt.datetime.strptime(items[i][0].strftime(fmt), "%d-%m-%Y").date()
            assert got[i] in (parsed, dt.date(d.year, d.day, d.month))
        else:
            assert got[i] == d, (d, fmt, got[i])


def test_multiformat_garbage_is_null(spark):
    df = spark.createDataFrame([(1, "not-a-date"), (2, "2015-13-45"), (3, None)], "i int, s string")
    got = {r.i: r.d for r in df.select("i", parse_date_multi("s").alias("d")).collect()}
    assert got == {1: None, 2: None, 3: None}


@SETTINGS
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=50
    ).map(lambda v: [round(x, 4) for x in v])
)
def test_decimal_comma_roundtrip(spark, values):
    rows = [(i, str(v).replace(".", ",")) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "i int, s string")
    got = {r.i: r.v for r in df.select("i", decimal_comma_to_double("s").alias("v")).collect()}
    for i, v in enumerate(values):
        assert abs(got[i] - v) < 1e-9


@SETTINGS
@given(
    st.lists(st.floats(min_value=-1e5, max_value=1e5, allow_nan=False), min_size=2, max_size=60)
    .filter(lambda v: max(v) > min(v))
)
def test_minmax_normalize_bounds_and_order(spark, values):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i int, x double")
    out = {r.i: r.n for r in minmax_normalize_expr(df, "x", "n").collect()}
    lo, hi = min(values), max(values)
    for i, v in enumerate(values):
        expected = (v - lo) / (hi - lo)
        assert abs(out[i] - expected) < 1e-12
    assert min(out.values()) == 0.0 and max(out.values()) == 1.0


@SETTINGS
@given(
    st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Zs")),
            max_size=80,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_text_scoring_invariants(spark, texts):
    """Entropy is bounded by ln(alphabet size); repetition fraction
    lives in [0,1] with distinct ≤ total — on arbitrary unicode
    letter/digit/space soup."""
    import math

    from traffic_forecast_etl_spark.operators.text import (
        char_entropy,
        repetition_stats,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    ent = {r["doc_id"]: r for r in char_entropy(df, "text", "doc_id").collect()}
    rep = {
        r["doc_id"]: r for r in repetition_stats(df, "text", "doc_id").collect()
    }
    for i in range(len(texts)):
        e = ent[i]
        assert e["n_distinct_chars"] <= max(e["n_chars"], 1)
        assert -1e-9 <= e["char_entropy"] <= math.log(max(e["n_distinct_chars"], 1)) + 1e-6
        r = rep[i]
        assert 0 <= r["n_distinct_grams"] <= r["n_grams"]
        assert -1e-9 <= r["dup_gram_frac"] <= 1.0


@SETTINGS
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=50, unique=True))
def test_hash_bucket_range_and_salt_sensitivity(spark, keys):
    from traffic_forecast_etl_spark.operators.sampling import hash_bucket

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = df.select(
        hash_bucket("k").alias("b"), hash_bucket("k", salt="s").alias("bs")
    ).collect()
    assert all(0 <= r["b"] < 1_000_000 and 0 <= r["bs"] < 1_000_000 for r in got)
    if len(keys) >= 20:
        # salting must actually move buckets for at least some keys
        assert any(r["b"] != r["bs"] for r in got)
