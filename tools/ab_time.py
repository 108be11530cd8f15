"""Quick A/B timer: bench-methodology timing (warm pass + min-of-3,
settle between runs) for a list of keys, with optional extra Spark
conf — for isolating one change before it lands in session.py.

Usage: python tools/ab_time.py key1,key2 [k=v k=v ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: F401,E402

from traffic_forecast_etl_spark.plans.catalog import QUERIES  # noqa: E402
from traffic_forecast_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    keys = sys.argv[1].split(",")
    extra = dict(a.split("=", 1) for a in sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab", extra_conf=extra or None)
    from bench import _settle, _timed

    QUERIES["a3_profile"](spark, sf_dir).collect()
    from pyspark.sql import functions as F, types as T

    @F.pandas_udf(T.LongType())
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(1000).repartition(32).select(_warm("id")).collect()
    for name in keys:
        QUERIES[name](spark, sf_dir).collect()
        spark.catalog.clearCache()
    out = {}
    for name in keys:
        best, spread = _timed(spark, QUERIES[name], sf_dir)
        out[name] = round(best, 3)
        print(json.dumps({"key": name, "min_sec": round(best, 3), "spread": round(spread, 2)}), flush=True)
    print(json.dumps({"total": round(sum(out.values()), 3), "extra": extra}))


if __name__ == "__main__":
    main()
