"""Cold-query phase profiler — attributes a registry query's SINGLE-SHOT
(cold) wall clock to: Python DataFrame build, Catalyst phases
(analysis/optimization/physical planning as reported by the
QueryExecution tracker), and execution (first run = codegen compile +
compute; optional warm repeats isolate the compile cost).

The bench's extras are single-shot, so this cold profile IS the number
the extras record — tools/profile_jobs.py attributes the executed jobs,
this tool attributes everything BEFORE and BETWEEN them.

Usage:
    python tools/profile_cold.py [--sf-dir DIR] [--warm N] query [query ...]

Diagnostic tool (round-11 optimization measurement); not part of the
bench contract.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def phases_ms(df) -> dict[str, float]:
    """Catalyst phase timings for this frame's QueryExecution, in ms."""
    qe = df._jdf.queryExecution()
    # force analysis/optimization/planning without executing
    qe.executedPlan()
    out = {}
    it = qe.tracker().phases().iterator()
    while it.hasNext():
        kv = it.next()
        summ = kv._2()
        out[str(kv._1())] = float(summ.endTimeMs() - summ.startTimeMs())
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--warm", type=int, default=2, help="warm repeats after the cold run")
    args = ap.parse_args()
    os.environ["SPARK_GRAFT_SF_DIR"] = args.sf_dir

    from pixie_spark.session import get_spark
    from pixie_spark.queries import QUERIES

    spark = get_spark()
    spark.sparkContext.setLogLevel("WARN")

    for name in args.queries:
        q = QUERIES[name]
        spark.sparkContext.setJobDescription(f"cold_profile:{name}")
        t0 = time.time()
        df = q.fn(spark, args.sf_dir)
        t_build = time.time() - t0

        t0 = time.time()
        ph = phases_ms(df)
        t_plan = time.time() - t0

        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t_cold_exec = time.time() - t0

        warms = []
        for _ in range(args.warm):
            t0 = time.time()
            q.fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            warms.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)

        print(f"\n=== {name} ===")
        print(f"  build (py):        {t_build:7.2f} s")
        print(f"  plan wall:         {t_plan:7.2f} s  (tracker phases ms: {ph})")
        print(f"  first exec:        {t_cold_exec:7.2f} s  (codegen compile + compute + any sub-actions)")
        for i, w in enumerate(warms):
            print(f"  warm exec {i}:       {w:7.2f} s  (re-plan + cached codegen + compute)")
        tot = t_build + t_plan + t_cold_exec
        print(f"  cold total:        {tot:7.2f} s")


if __name__ == "__main__":
    main()
