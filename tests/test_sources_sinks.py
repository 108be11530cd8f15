"""Source/sink tests: delimiter probing + mixed-dialect detector
files (SURVEY S2-S3, E3 fixtures), idempotent sinks (S8), merge
upsert."""

from __future__ import annotations

from pyspark.sql import functions as F

from traffic_forecast_etl_spark.plans.detector_prep import prepare_detector_series
from traffic_forecast_etl_spark.sinks import insert_if_absent, merge_upsert
from traffic_forecast_etl_spark.sources.csv import probe_delimiter, read_csv_auto

DIALECT_A = """Detector,Datum,Uur,Waarde,Long,Lat
1.2,2015-01-01,0,10.0,5.14,52.09
1.2,2015-01-01,0,20.0,5.14,52.09
1.2,2015-01-01,1,30.0,5.14,52.09
9.9,2015-01-01,1,99.0,5.14,52.09
"""

DIALECT_B = """Detector;Datum;Uur;Waarde;Long;Lat
1.2;02-01-2015;5;40.0;5,14429;52,0955
1.2;02-01-2015;5;60.0;5,14429;52,0955
9.9;02-01-2015;6;99.0;5,14429;52,0955
"""


def _write_fixture_files(tmp_path):
    a = tmp_path / "ind_a.csv"
    b = tmp_path / "ind_b.csv"
    a.write_text(DIALECT_A)
    b.write_text(DIALECT_B)
    return str(tmp_path / "ind*")


def test_probe_delimiter(tmp_path):
    pattern = _write_fixture_files(tmp_path)
    assert probe_delimiter(str(tmp_path / "ind_a.csv")) == ","
    assert probe_delimiter(str(tmp_path / "ind_b.csv")) == ";"


def test_detector_prep_mixed_dialects(spark, tmp_path):
    """The E3 pipeline over one ','-file and one ';'-file: filter to
    detector 1.2, per-(date,hour) mean, both date formats parsed,
    decimal-comma coordinates normalized."""
    pattern = _write_fixture_files(tmp_path)
    out = prepare_detector_series(spark, pattern, 1.2)
    rows = {(str(r.Date), r.Hour): r for r in out.collect()}
    assert set(rows) == {("2015-01-01", 0), ("2015-01-01", 1), ("2015-01-02", 5)}
    assert rows[("2015-01-01", 0)].Waarde == 15.0  # mean(10, 20)
    assert rows[("2015-01-02", 5)].Waarde == 50.0  # mean(40, 60)
    assert abs(rows[("2015-01-02", 5)].longitude - 5.14429) < 1e-9  # "5,14429"


def test_read_csv_auto_corrupt_records(spark, tmp_path):
    """PERMISSIVE mode: malformed rows land in _corrupt_record, the
    scan never throws (the engine's replacement for the reference's
    try/except re-read loop)."""
    f = tmp_path / "bad.csv"
    f.write_text("Detector,Datum,Uur,Waarde,Long,Lat\n1.2,2015-01-01,0,10.0,5.1,52.0\nnot,a,valid,row,at,all\n")
    from traffic_forecast_etl_spark.plans.detector_prep import DETECTOR_SCHEMA

    # caching is required before filtering on _corrupt_record alone
    # (documented Spark restriction on raw-file corrupt-column queries)
    df = read_csv_auto(spark, str(f), schema=DETECTOR_SCHEMA).cache()
    assert df.count() == 2
    assert df.filter(F.col("_corrupt_record").isNotNull()).count() == 1
    df.unpersist()


def test_insert_if_absent_idempotent(spark, tmp_path):
    path = str(tmp_path / "sink")
    batch = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    assert insert_if_absent(spark, batch, path, ["id"]) == 2
    assert insert_if_absent(spark, batch, path, ["id"]) == 0  # re-run: no-op
    batch2 = spark.createDataFrame([(2, "b2"), (3, "c")], "id int, v string")
    assert insert_if_absent(spark, batch2, path, ["id"]) == 1  # only id=3
    out = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert out == {1: "a", 2: "b", 3: "c"}  # id=2 kept ORIGINAL value


def test_merge_upsert_last_writer_wins(spark, tmp_path):
    path = str(tmp_path / "merge_sink")
    merge_upsert(spark, spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string"), path, ["id"])
    merge_upsert(spark, spark.createDataFrame([(2, "B"), (3, "c")], "id int, v string"), path, ["id"])
    out = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert out == {1: "a", 2: "B", 3: "c"}  # id=2 UPDATED


def test_streaming_dedup_sink(spark, tmp_path):
    """Streaming plane: watermarked dedup + foreachBatch idempotent
    append over the events stream — re-running the stream appends
    nothing new."""
    from traffic_forecast_etl_spark.streaming.micro_batch import (
        read_events_stream,
        streaming_dedup_sink,
    )

    sink = str(tmp_path / "events_sink")
    ckpt1, ckpt2 = str(tmp_path / "ck1"), str(tmp_path / "ck2")
    src = "/root/testdata/sf0.001/events.parquet"
    q = streaming_dedup_sink(
        read_events_stream(spark, src), sink, ["event_id"], checkpoint=ckpt1
    )
    q.awaitTermination()
    n1 = spark.read.parquet(sink).count()
    assert n1 == 1000
    # fresh query (new checkpoint) over the same source: sink unchanged
    q2 = streaming_dedup_sink(
        read_events_stream(spark, src), sink, ["event_id"], checkpoint=ckpt2
    )
    q2.awaitTermination()
    assert spark.read.parquet(sink).count() == n1
