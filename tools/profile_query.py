"""Per-stage profile of one catalog query — the headless stand-in for
the Spark UI's stage table (guide §1.1/§7.1).

Usage: SPARK_GRAFT_SF_DIR=... python tools/profile_query.py <key> [<key2> ...]

Runs each query once untimed (codegen/JIT warm), then once timed with
the event log on, and prints per-stage: wall span, task count, sum of
task run time, max task time (skew), GC, shuffle read/write bytes,
input bytes, and python-eval time — plus the job list so
driver-synchronous round counts (kmeans iterations, CC rounds) are
visible.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: F401,E402  (pandas_udf type hints)

from traffic_forecast_etl_spark.plans.catalog import QUERIES  # noqa: E402
from traffic_forecast_etl_spark.session import get_spark  # noqa: E402


def profile(keys: list[str]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = tempfile.mkdtemp(prefix="spark_events_")
    spark = get_spark(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    sc = spark.sparkContext
    app_id = sc.applicationId
    # session + python-worker warmup (mirrors bench.py); derived scale
    # dirs (.scaledata/sf1) carry only documents/embeddings — fall
    # back to a documents-based warmup there
    try:
        QUERIES["a3_profile"](spark, sf_dir).collect()
    except Exception:
        QUERIES["t1_token_stats"](spark, sf_dir).collect()
    for key in keys:
        QUERIES[key](spark, sf_dir).collect()  # untimed warm pass
        spark.catalog.clearCache()
        sc._jvm.System.gc()
        spark.range(1000).count()
        marker = f"__profile__{key}"
        sc.setJobDescription(marker)
        t0 = time.time()
        QUERIES[key](spark, sf_dir).collect()
        wall = time.time() - t0
        sc.setJobDescription(None)
        spark.catalog.clearCache()
        # flush event log
        sc._jsc.sc().listenerBus().waitUntilEmpty()
        report(os.path.join(evdir, app_id + ".inprogress"), marker, key, wall)


def report(evfile: str, marker: str, key: str, wall: float) -> None:
    jobs = {}  # jobId -> dict
    stage_job = {}  # stageId -> jobId
    stages = {}  # stageId -> submit/complete info
    tasks = defaultdict(lambda: dict(n=0, run=0.0, gc=0.0, mx=0.0, py=0.0,
                                     sr=0, sw=0, inp=0, fetch=0.0))
    with open(evfile) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = ev.get("Properties", {}).get("spark.job.description", "")
                if desc == marker:
                    jid = ev["Job ID"]
                    jobs[jid] = dict(t0=ev["Submission Time"], t1=None)
                    for sinfo in ev.get("Stage Infos", []):
                        stage_job[sinfo["Stage ID"]] = jid
            elif e == "SparkListenerJobEnd" and ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                if si["Stage ID"] in stage_job:
                    stages[si["Stage ID"]] = dict(name=si["Stage Name"], t0=None, t1=None)
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                if si["Stage ID"] in stage_job:
                    stages.setdefault(si["Stage ID"], dict(name=si["Stage Name"]))
                    stages[si["Stage ID"]]["t0"] = si.get("Submission Time")
                    stages[si["Stage ID"]]["t1"] = si.get("Completion Time")
                    # RDD scope names trace back to SQL plan nodes —
                    # far more readable than the action call site
                    scopes = []
                    for r in si.get("RDD Info", []):
                        sc_ = r.get("Scope")
                        if sc_:
                            try:
                                nm = json.loads(sc_).get("name", "")
                            except json.JSONDecodeError:
                                nm = ""
                            if nm and nm not in scopes:
                                scopes.append(nm)
                    stages[si["Stage ID"]]["name"] = " <- ".join(scopes[:6]) or si["Stage Name"]
            elif e == "SparkListenerTaskEnd" and ev.get("Stage ID") in stage_job:
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                t = tasks[sid]
                t["n"] += 1
                rt = tm.get("Executor Run Time", 0)
                t["run"] += rt
                t["mx"] = max(t["mx"], rt)
                t["gc"] += tm.get("JVM GC Time", 0)
                sr = tm.get("Shuffle Read Metrics", {})
                t["sr"] += sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)
                t["fetch"] += sr.get("Fetch Wait Time", 0)
                t["sw"] += tm.get("Shuffle Write Metrics", {}).get("Shuffle Bytes Written", 0)
                t["inp"] += tm.get("Input Metrics", {}).get("Bytes Read", 0)

    njobs = len(jobs)
    job_spans = sorted((j["t0"], j.get("t1") or j["t0"]) for j in jobs.values())
    busy = 0
    if job_spans:
        cur0, cur1 = job_spans[0]
        for a, b in job_spans[1:]:
            if a > cur1:
                busy += cur1 - cur0
                cur0, cur1 = a, b
            else:
                cur1 = max(cur1, b)
        busy += cur1 - cur0
    print(f"\n=== {key}: wall {wall:.2f}s, jobs {njobs}, "
          f"job-span union {busy/1000.0:.2f}s, gaps {wall - busy/1000.0:.2f}s ===")
    rows = []
    for sid, st in stages.items():
        t = tasks[sid]
        span = ((st.get("t1") or 0) - (st.get("t0") or 0)) / 1000.0
        rows.append((span, sid, st["name"].split("\n")[0][:140], t))
    rows.sort(reverse=True)
    print(f"{'span_s':>7} {'sid':>5} {'n':>4} {'sum_run':>8} {'max_t':>6} "
          f"{'gc':>5} {'fetch':>6} {'in_MB':>7} {'sr_MB':>7} {'sw_MB':>7}  name")
    for span, sid, name, t in rows[:18]:
        print(f"{span:7.2f} {sid:5d} {t['n']:4d} {t['run']/1000:8.2f} "
              f"{t['mx']/1000:6.2f} {t['gc']/1000:5.2f} {t['fetch']/1000:6.2f} "
              f"{t['inp']/1e6:7.2f} {t['sr']/1e6:7.2f} {t['sw']/1e6:7.2f}  {name}")
    nshow = len(rows) - 18
    if nshow > 0:
        rest = sum(r[0] for r in rows[18:])
        print(f"  ... {nshow} more stages, {rest:.2f}s span total")
    # job timeline: where the driver gaps sit (gap = idle time between
    # this job's start and the previous job's end — Catalyst/AQE
    # replanning, py4j, driver compute)
    print(f"{'jid':>5} {'start_s':>8} {'span_s':>7} {'gap_before_s':>13}  first-stage")
    prev_end = None
    t_base = min(j["t0"] for j in jobs.values()) if jobs else 0
    for jid in sorted(jobs):
        j = jobs[jid]
        t0, t1 = j["t0"], j.get("t1") or j["t0"]
        gap = (t0 - prev_end) / 1000.0 if prev_end is not None else 0.0
        sids = [s for s, jj in stage_job.items() if jj == jid]
        nm = stages.get(min(sids), {}).get("name", "?").split("\n")[0][:70] if sids else "?"
        print(f"{jid:5d} {(t0-t_base)/1000:8.2f} {(t1-t0)/1000:7.2f} {gap:13.2f}  {nm}")
        prev_end = max(prev_end or t1, t1)


if __name__ == "__main__":
    profile(sys.argv[1:])
