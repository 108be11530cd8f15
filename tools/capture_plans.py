"""Capture .explain("formatted") for headline queries into plans/<round>/
(round from $PLANS_ROUND, default r11).

Usage: python tools/capture_plans.py before|after [key1,key2,...]

Writes plans/r10/<key>_<tag>.txt and prints a one-line plan-shape
summary per key (Exchange count, join nodes, python-eval nodes) so
shape regressions are visible at a glance.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from traffic_forecast_etl_spark.plans.catalog import QUERIES  # noqa: E402
from traffic_forecast_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    keys = sys.argv[2].split(",") if len(sys.argv) > 2 else HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("PLANS_ROUND", "r11"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    for name in keys:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        counts = {
            "Exchange": len(re.findall(r"\bExchange\b", plan)),
            "SMJ": len(re.findall(r"SortMergeJoin", plan)),
            "BHJ": len(re.findall(r"BroadcastHashJoin", plan)),
            "SHJ": len(re.findall(r"ShuffledHashJoin", plan)),
            "BatchEvalPython": len(re.findall(r"BatchEvalPython", plan)),
            "ArrowEval": len(re.findall(r"ArrowEvalPython", plan)),
            "MapInArrow": len(re.findall(r"MapInArrow|MapInPandas|FlatMapGroupsInPandas", plan)),
            "Sort": len(re.findall(r"\bSort\b", plan)),
            "Window": len(re.findall(r"\bWindow\b", plan)),
        }
        print(name, counts, flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
