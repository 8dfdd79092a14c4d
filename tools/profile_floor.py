"""Decompose the per-job fixed floor (guide §1.1 empirical loop).

A headline query's exec_s at sf0.1 is ~85-95% fixed cost (FLOOR_DECOMP
floor_fraction ≈ 1). This probe splits the trivial-job wall into its
layers so config work (guide §1.2 step 3) targets the right one:

* ``rdd_job_s``   — pure scheduler: ``sc.runJob`` on a prebuilt
  1-partition RDD (no SQL, no py4j beyond the call).
* ``plan_only_s`` — Catalyst analysis+optimization+physical planning of
  ``range(1)`` via ``queryExecution().executedPlan()`` (no job).
* ``noop_write_s``— the full ``df.write.format("noop")`` action on a
  PREBUILT df: planning + SQLExecution bookkeeping (eager plan-string
  render + listener events) + job + commit.
* ``noop_write_32part_s`` — same but 32 tasks, isolates per-task cost.

Usage: python tools/profile_floor.py [--conf k=v ...]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def med(fn, runs=15):
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main() -> None:
    extra = {}
    for a in sys.argv[1:]:
        if "=" in a:
            k, v = a.split("=", 1)
            extra[k.lstrip("-").replace("conf:", "")] = v
    from pandas_spark import get_spark

    spark = get_spark("profile_floor", **extra)
    sc = spark.sparkContext
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from bench import _box_calibration_ms

    # warm everything once
    rdd = sc.parallelize([0], 1)
    sc.runJob(rdd, lambda it: [sum(1 for _ in it)])
    df1 = spark.range(1)
    df32 = spark.range(0, 32, 1, 32)
    for d in (df1, df32):
        d.write.format("noop").mode("overwrite").save()

    out = {
        "box_calib_ms": _box_calibration_ms(),
        "rdd_job_s": round(
            med(lambda: sc.runJob(rdd, lambda it: [sum(1 for _ in it)])), 4
        ),
        "plan_only_s": round(
            med(lambda: spark.range(1)._jdf.queryExecution().executedPlan()), 4
        ),
        "noop_write_s": round(
            med(lambda: df1.write.format("noop").mode("overwrite").save()), 4
        ),
        "noop_write_32part_s": round(
            med(lambda: df32.write.format("noop").mode("overwrite").save()), 4
        ),
    }
    for k, v in out.items():
        print(f"{k:22s} {v}")


if __name__ == "__main__":
    main()
