"""Per-query EXEC decomposition: wall vs in-job time vs driver gap.

For each headline query (prebuilt DataFrame, so build chatter is out of
the timed region) the noop materialization's wall splits into:

* ``job_s``    — sum over launched jobs of (completion - submission),
  from the AppStatusStore: scheduler + task run time.
* ``driver_s`` — wall - job_s: Catalyst physical planning, the eager
  ``explainString`` render in SQLExecution.withNewExecutionId, listener
  event construction, py4j, commit — all driver-side single-thread work
  the guide's §7.3 playbook attributes to "nothing is running".
* ``tasks``    — tasks launched (per-task launch cost ≈ job_s/tasks
  once compute is trivial at sf0.1).

Usage: python tools/profile_exec.py [query ...] [--conf k=v ...]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "q1_groupby_agg", "join_inner", "join_left", "join_multi_star",
    "merge_asof_backward", "topk_orders", "dedup_keep_first",
    "window_cumsum", "rolling_time_mean", "resample_1h", "string_ops",
    "value_counts", "query_dialect", "pivot_sum", "melt_unpivot",
    "groupby_skew_kurt", "ewm_mean",
]


def main() -> None:
    extra = {}
    names = []
    for a in sys.argv[1:]:
        if "=" in a:
            k, v = a.split("=", 1)
            extra[k.lstrip("-")] = v
        else:
            names.append(a)
    names = names or HEADLINE

    from pandas_spark import get_spark
    from pandas_spark import suite
    from bench import _box_calibration_ms

    spark = get_spark("profile_exec", **extra)
    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    qs = suite.queries()

    for n in names:  # warm
        qs[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    print(f"calib={_box_calibration_ms()}")
    print(f"{'query':24s} {'wall':>7s} {'job_s':>7s} {'driver':>7s} {'jobs':>4s} {'tasks':>5s}")
    tot = [0.0, 0.0, 0.0]
    store = jsc.statusStore()
    for n in names:
        df = qs[n](spark, SF_DIR)
        walls, jobss, taskss, njobs = [], [], [], []
        for _ in range(5):
            j0 = jsc.dagScheduler().nextJobId()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            j1 = jsc.dagScheduler().nextJobId()
            job_ms, ntasks = 0, 0
            for jid in range(j0, j1):
                try:
                    j = store.job(jid)
                    sub = j.submissionTime().get().getTime()
                    comp = j.completionTime().get().getTime()
                    job_ms += comp - sub
                    ntasks += j.numTasks()
                except Exception:
                    pass
            walls.append(wall)
            jobss.append(job_ms / 1000.0)
            taskss.append(ntasks)
            njobs.append(j1 - j0)
        w = statistics.median(walls)
        js = statistics.median(jobss)
        print(
            f"{n:24s} {w:7.3f} {js:7.3f} {w - js:7.3f} "
            f"{int(statistics.median(njobs)):4d} {int(statistics.median(taskss)):5d}"
        )
        tot[0] += w
        tot[1] += js
        tot[2] += w - js
    print(f"{'TOTAL':24s} {tot[0]:7.3f} {tot[1]:7.3f} {tot[2]:7.3f}")


if __name__ == "__main__":
    main()
