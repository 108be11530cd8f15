"""Measure the deletion-vector read-path overhead (r9).

Question: what does the executor-side DV positional filter
(sources/delta_log.py::_dv_filtered_scan — mapInPandas over
`_metadata.row_index` with per-task decoded RoaringBitmapArrays) cost
relative to a clean parquet scan of the same data?

Method: write the sf events table as a Delta table, time a full
aggregate scan (a) before any delete (pure parquet path), (b) after a
~1% DV delete (every file carries a descriptor -> the whole scan runs
through the Arrow filter), (c) time-traveled to version 0 after the
delete (must match (a) — the clean path is preserved). min-of-N
wall, JVM warmed.

Usage: python tools/measure_dv_overhead.py [sf_dir] [runs]
Prints one JSON line; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from traffic_forecast_etl_spark.session import get_spark  # noqa: E402
from traffic_forecast_etl_spark.sources import delta_log as DL  # noqa: E402
from traffic_forecast_etl_spark.sources.tables import load_table  # noqa: E402


def _timed(fn, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("dv-overhead")
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", "user_id", "value"
    )
    n = ev.count()
    tmp = tempfile.mkdtemp(prefix="dv_overhead_")
    try:
        path = f"{tmp}/t"
        DL.write_delta_append(spark, ev, path)

        def scan(version=None):
            return (
                DL.read_delta(spark, path, version=version)
                .groupBy("event_type")
                .count()
                .collect()
            )

        scan()  # warm codegen + python workers
        clean = _timed(scan, runs)

        v = DL.delete_from_delta(spark, path, "event_id % 100 = 7")  # ~1%
        adds = DL.delta_snapshot_files(spark, path)
        dv_files = sum(1 for a in adds if a.get("deletionVector"))
        deleted = sum(
            a["deletionVector"]["cardinality"]
            for a in adds
            if a.get("deletionVector")
        )
        scan()  # warm the DV plan
        with_dv = _timed(scan, runs)
        time_travel = _timed(lambda: scan(version=0), runs)

        print(
            json.dumps(
                {
                    "metric": "dv_read_overhead",
                    "sf_dir": sf_dir,
                    "rows": n,
                    "files_total": len(adds),
                    "files_with_dv": dv_files,
                    "rows_deleted": deleted,
                    "clean_scan_sec": clean,
                    "dv_scan_sec": with_dv,
                    "overhead_x": round(with_dv / clean, 2),
                    "time_travel_v0_sec": time_travel,
                    "delete_version": v,
                    "runs": runs,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
