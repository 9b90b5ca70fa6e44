"""Extra profiling harness (guide §1): per-query cold/warm pass times,
Spark job counts, and .explain("formatted") capture. NOT the driver
bench — bench.py stays frozen; this file exists so optimization
evidence (noop-sink isolation, plan shapes, pass-by-pass splits) can be
cited in OPTIMIZATION_r06.md without touching the measured harness.

Usage:
  python bench_extra.py [query ...]            # profile named queries
  python bench_extra.py --plans [query ...]    # also write plans/r06/<q>_<tag>.txt
  SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS honored as in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import LARGE_RESULT  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLAN_TAG = os.environ.get("SPARK_GRAFT_PLAN_TAG", "before")
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
EVLOG_DIR = "/tmp/spark_graft_evlog"


def session(cores: int, event_log: bool = False):
    from logparser_llm_spark.session import build_session

    extra = {}
    if event_log:
        os.makedirs(EVLOG_DIR, exist_ok=True)
        extra = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVLOG_DIR,
            "spark.eventLog.compress": "false",
        }
    return build_session("bench_extra", cores=cores, extra_conf=extra)


def attribute(names: list[str]) -> None:
    """Deep mode: one query per fresh session with event logging; parse
    the event log to split wall time into job execution vs driver gaps
    (planning/AQE/collect), per pass."""
    from logparser_llm_spark.plans.queries import QUERIES

    for name in names:
        spark = session(CPUS, event_log=True)
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        app_id = spark.sparkContext.applicationId
        fn = QUERIES[name][0]

        def exec_once():
            df = fn(spark, SF_DIR)
            if name in LARGE_RESULT:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()

        marks = []
        for _ in range(3):
            t0 = time.time()
            exec_once()
            marks.append((t0, time.time()))
        spark.stop()
        # parse event log
        jobs = []
        stages = {}
        import glob
        cand = glob.glob(os.path.join(EVLOG_DIR, "*" + app_id + "*"))
        paths = []
        for c in cand:
            paths.extend(sorted(glob.glob(os.path.join(c, "events*"))) if os.path.isdir(c) else [c])
        lines = []
        for p in paths:
            with open(p) as f:
                lines.extend(f)
        for line in lines:
            if True:
                ev = json.loads(line)
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jobs.append({"id": ev["Job ID"], "t0": ev["Submission Time"] / 1000.0,
                                 "desc": (ev.get("Properties") or {}).get("spark.job.description", "")[:60]})
                elif e == "SparkListenerJobEnd":
                    for j in jobs:
                        if j["id"] == ev["Job ID"]:
                            j["t1"] = ev["Completion Time"] / 1000.0
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    stages[si["Stage ID"]] = {
                        "id": si["Stage ID"],
                        "name": si["Stage Name"][:60],
                        "tasks": si["Number of Tasks"],
                        "t0": si.get("Submission Time", 0) / 1000.0,
                        "sec": (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000.0,
                    }
        for pi, (t0, t1) in enumerate(marks):
            inpass = [j for j in jobs if "t1" in j and j["t0"] >= t0 and j["t1"] <= t1 + 0.5]
            job_time = sum(j["t1"] - j["t0"] for j in inpass)
            print(json.dumps({
                "query": name, "pass": pi, "wall": round(t1 - t0, 3),
                "n_jobs": len(inpass), "job_time": round(job_time, 3),
                "driver_gap": round((t1 - t0) - job_time, 3),
                "jobs": [
                    {"sec": round(j["t1"] - j["t0"], 3), "desc": j["desc"]}
                    for j in sorted(inpass, key=lambda j: j["t1"] - j["t0"], reverse=True)[:8]
                ],
                "stages": [
                    {"id": s["id"], "sec": round(s["sec"], 3), "tasks": s["tasks"],
                     "name": s["name"]}
                    for s in sorted(
                        (s for s in stages.values() if t0 <= s["t0"] <= t1),
                        key=lambda s: s["sec"], reverse=True)[:8]
                ],
            }), flush=True)


def profile(names: list[str], write_plans: bool) -> None:
    from logparser_llm_spark.plans.queries import QUERIES

    spark = session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    rows = []
    for name in names:
        fn = QUERIES[name][0]

        def exec_once():
            df = fn(spark, SF_DIR)
            if name in LARGE_RESULT:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()

        passes = []
        sc.setJobGroup(f"prof:{name}", name)
        jobs_before = len(tracker.getJobIdsForGroup(f"prof:{name}"))
        for i in range(3):
            t0 = time.perf_counter()
            exec_once()
            passes.append(round(time.perf_counter() - t0, 3))
            if i == 0:
                cold_jobs = len(tracker.getJobIdsForGroup(f"prof:{name}")) - jobs_before
        total_jobs = len(tracker.getJobIdsForGroup(f"prof:{name}")) - jobs_before
        warm_jobs = (total_jobs - cold_jobs) // 2
        sc.setJobGroup("", "")
        if write_plans:
            os.makedirs(PLAN_DIR, exist_ok=True)
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(PLAN_DIR, f"{name}_{PLAN_TAG}.txt"), "w") as f:
                f.write(plan)
        spark.catalog.clearCache()
        row = {
            "query": name,
            "cold": passes[0],
            "warm": min(passes[1:]),
            "passes": passes,
            "cold_jobs": cold_jobs,
            "warm_jobs": warm_jobs,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    spark.stop()
    print(json.dumps({"summary": {r["query"]: r["warm"] for r in rows}}))


def plans_only(names: list[str]) -> None:
    """Capture .explain("formatted") without executing (plan evidence
    for plans/r06/, no timed runs)."""
    from logparser_llm_spark.plans.queries import QUERIES

    spark = session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(PLAN_DIR, exist_ok=True)
    for name in names:
        df = QUERIES[name][0](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(PLAN_DIR, f"{name}_{PLAN_TAG}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok", flush=True)
    spark.stop()


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--attr" in sys.argv[1:]:
        attribute(args)
    elif "--plans-only" in sys.argv[1:]:
        plans_only(args)
    else:
        profile(args, write_plans="--plans" in sys.argv[1:])
