"""traffic_forecast_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference ETL+ML traffic-forecasting pipeline
(akash711/Traffic-Forecast-ETL), designed Spark-first:

- DataFrame/SQL declarative plans; Catalyst/Tungsten pick physical
  strategy (predicate pushdown, column pruning, broadcast joins, AQE).
- No row-at-a-time Python in the hot path: native ``pyspark.sql
  .functions`` everywhere, Arrow-batched ``pandas_udf`` /
  ``mapInPandas`` only where built-ins cannot express semantics.
- Partition-aware at 100 TB: date-partitioned layouts, broadcast for
  small dims, map-side partial aggregation, AQE skew handling.

Layout:
    session.py        SparkSession factory (tuned confs)
    sources/          readers: CSV (delimiter probe), JSON payload,
                      parquet, JDBC options
    operators/        relational ops, joins (incl. as-of/range),
                      aggregates, dedup (exact/MinHash/SimHash),
                      similarity search, text analysis, multimodal
    functions/        scalar function library (dates, units, strings)
    plans/            end-to-end pipelines + the query catalog used by
                      the driver contract (__spark_entry__.py)
    streaming/        Structured Streaming wrappers of the
                      operational plane
    sinks.py          idempotent MERGE-style sinks
    ml.py             MLlib pipelines (RF/DT/GBT), temporal split,
                      metrics
"""

__version__ = "0.1.0"
