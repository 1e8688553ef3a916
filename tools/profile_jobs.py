"""Job-level profiler for registry queries — attributes a query's wall
clock to its Spark JOBS (the unit serial pipelines like
clean_corpus_report / connected_components pay per round), which the
node-level analyze() surface cannot see across actions.

Runs each named query once with the Spark UI's REST API enabled, tags
it with a job group, then reads /api/v1/applications/<id>/jobs and
prints, per query: total wall, per-job duration + description + stage
shapes, and the DRIVER GAP (wall - sum of job wall) — the planning /
codegen / py4j time between jobs that job metrics never show.

Usage:
    python tools/profile_jobs.py [--sf-dir DIR] query [query ...]

This is a diagnostic tool (round-11 optimization measurement); it is
not part of the bench contract.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def get_spark_with_ui(cpus: int) -> SparkSession:
    # mirror pixie_spark.session.get_spark but with the UI (REST API) on
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(cpus))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pixie_spark_profile")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.pixie_spark.materialize", "localCheckpoint")
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def rest(spark: SparkSession, path: str):
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}{path}") as r:
        return json.load(r)


def profile(spark: SparkSession, name: str, sf_dir: str, fn) -> dict:
    sc = spark.sparkContext
    group = f"profile_{name}_{time.time_ns()}"
    sc.setJobGroup(group, name)
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    sc.setJobGroup(None, None)
    jobs = [j for j in rest(spark, "/jobs") if j.get("jobGroup") == group]
    jobs.sort(key=lambda j: j["jobId"])
    stages = {s["stageId"]: s for s in rest(spark, "/stages?status=complete")}
    out_jobs = []
    job_wall = 0.0
    for j in jobs:
        sub = j.get("submissionTime")
        comp = j.get("completionTime")
        dur = None
        if sub and comp:
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            dur = (
                datetime.strptime(comp, fmt) - datetime.strptime(sub, fmt)
            ).total_seconds()
            job_wall += dur
        st = []
        for sid in sorted(j.get("stageIds", [])):
            s = stages.get(sid)
            if not s:
                continue
            st.append(
                {
                    "stage": sid,
                    "tasks": s.get("numCompleteTasks"),
                    "cpu_sec": round(s.get("executorRunTime", 0) / 1000.0, 2),
                    "in_mb": round(s.get("inputBytes", 0) / 2**20, 1),
                    "sh_r_mb": round(s.get("shuffleReadBytes", 0) / 2**20, 1),
                    "sh_w_mb": round(s.get("shuffleWriteBytes", 0) / 2**20, 1),
                    "name": (s.get("name") or "")[:60],
                }
            )
        out_jobs.append(
            {
                "jobId": j["jobId"],
                "sec": round(dur, 3) if dur is not None else None,
                "desc": (j.get("description") or j.get("name", ""))[:110],
                "stages": j.get("numCompletedStages"),
                "tasks": j.get("numCompletedTasks"),
                "stage_detail": st,
            }
        )
    return {
        "query": name,
        "wall_sec": round(wall, 3),
        "n_jobs": len(jobs),
        "jobs_sec_sum": round(job_wall, 3),
        "driver_gap_sec": round(wall - job_wall, 3),
        "jobs": out_jobs,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--repeat", type=int, default=1, help="profile each query this many times (shows warm-vs-cold)")
    ap.add_argument("--overrides", action="store_true", help="use bench.py BENCH_OVERRIDES production configs where defined")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark_with_ui(args.cpus)
    from pixie_spark.queries import QUERIES

    fns = {}
    if args.overrides:
        import importlib

        bench = importlib.import_module("bench")
        fns.update(bench.BENCH_OVERRIDES)
    for name in args.queries:
        fn = fns.get(name) or QUERIES[name].fn
        for i in range(args.repeat):
            rec = profile(spark, name, args.sf_dir, fn)
            rec["run"] = i
            print(json.dumps(rec))
            sys.stdout.flush()


if __name__ == "__main__":
    main()
