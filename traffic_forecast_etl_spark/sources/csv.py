"""CSV sources (SURVEY §2.1 S1-S3).

The reference reads heterogeneous detector CSVs one file at a time in
a Python loop, retrying with ``sep=';'`` on parse failure
(reference: data/extract_from_raw_data.py:17-28). Spark-first
re-expression:

- one glob scan (``spark.read.csv('dir/ind*')``) instead of a loop —
  the scan is distributed across executors, and at 100 TB this is a
  partitioned multi-file read, not N driver-side appends;
- the delimiter is *probed once* on a small driver-side sample (a few
  KB of one file), then the whole glob is read with the winning
  delimiter + an explicit schema in PERMISSIVE mode with a
  ``_corrupt_record`` column, so malformed rows surface as data, not
  exceptions.
"""

from __future__ import annotations

import glob as _glob

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CANDIDATE_DELIMITERS = (",", ";", "\t", "|")


def probe_delimiter(path: str, candidates: tuple[str, ...] = CANDIDATE_DELIMITERS) -> str:
    """Pick the delimiter whose column count is highest and consistent
    across the first few lines of the first matching file.

    Driver-side, bounded IO (first 8 KB of one file) — never a Spark
    job, so probing cost is constant regardless of dataset size.
    """
    files = sorted(_glob.glob(path)) if any(c in path for c in "*?[") else [path]
    if not files:
        raise FileNotFoundError(path)
    with open(files[0], "rb") as fh:
        head = fh.read(8192).decode("utf-8", errors="replace")
    lines = [ln for ln in head.splitlines()[:10] if ln.strip()]
    best, best_cols = candidates[0], 1
    for d in candidates:
        counts = {ln.count(d) for ln in lines}
        if len(counts) == 1:  # consistent across lines
            cols = counts.pop() + 1
            if cols > best_cols:
                best, best_cols = d, cols
    return best


def read_csv_auto(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    sep: str | None = None,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Glob-aware CSV reader with delimiter probe + PERMISSIVE mode.

    With an explicit ``schema`` (always, in production — inference at
    100 TB means an extra full pass over the data), malformed rows
    land in ``corrupt_col`` instead of failing the job.
    """
    sep = sep or probe_delimiter(path)
    reader = (
        spark.read.option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    if schema is not None:
        if corrupt_col not in schema.fieldNames():
            schema = T.StructType(
                list(schema.fields) + [T.StructField(corrupt_col, T.StringType(), True)]
            )
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)
