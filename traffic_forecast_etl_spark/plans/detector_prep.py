"""E3 — raw detector-file preparation (SURVEY §3 E3,
data/extract_from_raw_data.py:12-47), Spark-first.

The reference loops file-by-file with a try/except delimiter
fallback, per-file groupby, and an in-memory append. Here:

  - files are grouped by *probed* delimiter (driver-side, first 8 KB
    of each file — constant cost per file, no Spark jobs), then each
    dialect group becomes ONE distributed glob scan;
  - the union of dialect groups is a lazy unionByName;
  - filter → per-(date,hour) mean → multi-format date parse → sort
    happen once, on the union, instead of once per file — one
    aggregation shuffle total, where the reference did one pandas
    groupby per file.
"""

from __future__ import annotations

import glob as _glob
from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.dates import parse_date_multi
from ..functions.strings import decimal_comma_to_double
from ..operators.relational import union_all
from ..sources.csv import probe_delimiter

DETECTOR_SCHEMA = T.StructType(
    [
        T.StructField("Detector", T.DoubleType()),
        T.StructField("Datum", T.StringType()),
        T.StructField("Uur", T.IntegerType()),
        T.StructField("Waarde", T.DoubleType()),
        T.StructField("Long", T.StringType()),
        T.StructField("Lat", T.StringType()),
    ]
)


def read_detector_files(
    spark: SparkSession, pattern: str, schema: T.StructType = DETECTOR_SCHEMA
) -> DataFrame:
    """Glob → group files by probed delimiter → one scan per dialect →
    union. Decimal-comma coordinate columns are normalized to double
    here so downstream code sees one schema."""
    files = sorted(_glob.glob(pattern))
    if not files:
        raise FileNotFoundError(pattern)
    by_delim: dict[str, list[str]] = defaultdict(list)
    for f in files:
        by_delim[probe_delimiter(f)].append(f)
    parts = []
    for delim, group in sorted(by_delim.items()):
        df = (
            spark.read.option("header", True)
            .option("sep", delim)
            .option("mode", "PERMISSIVE")
            .schema(schema)
            .csv(group)
        )
        parts.append(df)
    out = union_all(*parts)
    return out.withColumn("Long", decimal_comma_to_double("Long")).withColumn(
        "Lat", decimal_comma_to_double("Lat")
    )


def prepare_detector_series(
    spark: SparkSession, pattern: str, detector_id: float = 1.2
) -> DataFrame:
    """The reference pipeline: keep one detector, average readings per
    (date, hour), parse dates in either yyyy-MM-dd or dd-MM-yyyy,
    attach the (single) detector coordinates as constants, sort.

    Output: (Date, Hour, Waarde, longitude, latitude) — the shape
    traffic-counts prep produced (extract_from_raw_data.py:44-47).
    """
    raw = read_detector_files(spark, pattern)
    one = raw.filter(F.col("Detector") == detector_id)
    agg = one.groupBy("Datum", "Uur").agg(
        F.avg("Waarde").alias("Waarde"),
        # coordinates are constant per detector; first() under an
        # explicit (any) tie-break replaces the reference's
        # order-dependent row-0 extraction (SURVEY P6)
        F.min("Long").alias("longitude"),
        F.min("Lat").alias("latitude"),
    )
    return (
        agg.withColumn("Date", parse_date_multi("Datum"))
        .select(
            "Date",
            F.col("Uur").alias("Hour"),
            "Waarde",
            "longitude",
            "latitude",
        )
        .orderBy("Date", "Hour")
    )
