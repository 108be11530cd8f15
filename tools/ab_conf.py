"""Interleaved A/B of runtime SQL confs on the same session: for each
key, alternate variants across N campaigns and report per-variant min —
cancels machine-epoch noise that back-to-back sessions cannot.

Usage: python tools/ab_conf.py key1,key2 conf_key vA,vB[,vC] [campaigns]
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
    conf_key = sys.argv[2]
    variants = sys.argv[3].split(",")
    campaigns = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("abconf")
    from bench import _settle

    QUERIES["a3_profile"](spark, sf_dir).collect()
    from pyspark.sql import functions as F, types as T

    @F.pandas_udf(T.LongType())
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(1000).repartition(32).select(_warm("id")).collect()
    best: dict[tuple[str, str], float] = {}
    for name in keys:
        QUERIES[name](spark, sf_dir).collect()
        spark.catalog.clearCache()
    for c in range(campaigns):
        for name in keys:
            for v in variants:
                spark.conf.set(conf_key, v)
                t0 = time.time()
                QUERIES[name](spark, sf_dir).collect()
                dt = time.time() - t0
                _settle(spark)
                kk = (name, v)
                best[kk] = min(best.get(kk, 9e9), dt)
        print(f"campaign {c} done", flush=True)
    for name in keys:
        line = {v: round(best[(name, v)], 3) for v in variants}
        print(json.dumps({"key": name, "min_by_variant": line}))


if __name__ == "__main__":
    main()
