"""Per-query job/stage/task profile of the headline set at sf0.1.

For each headline query: run once untimed (warmup), then run again and
report wall seconds plus how many Spark jobs / stages / tasks the single
materialization triggered (statusTracker before/after deltas). A query
whose wall is dominated by job COUNT (3+ jobs for a sub-second result)
is floor-bound on scheduling, not data — the round-8 target list.

Usage: python tools/profile_floor.py [query ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "q1_groupby_agg", "join_inner", "join_left", "join_multi_star",
    "merge_asof_backward", "topk_orders", "dedup_keep_first",
    "window_cumsum", "rolling_time_mean", "resample_1h", "string_ops",
    "value_counts", "query_dialect", "pivot_sum", "melt_unpivot",
    "groupby_skew_kurt", "ewm_mean",
]


def main() -> None:
    from pandas_spark import get_spark
    from pandas_spark import suite

    spark = get_spark("profile_floor")
    sc = spark.sparkContext
    qs = suite.queries()
    names = sys.argv[1:] or HEADLINE

    # warm everything once at target sf
    for n in names:
        qs[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    tracker = sc.statusTracker()
    out = {}
    for n in names:
        j0 = sc._jsc.sc().dagScheduler().nextJobId()
        t0 = time.perf_counter()
        qs[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        j1 = sc._jsc.sc().dagScheduler().nextJobId()
        njobs = (j1 - j0) if j0 is not None else -1
        # stage/task counts from the job ids in the delta window
        nstages = ntasks = 0
        if j0 is not None:
            for jid in range(j0, j1):
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None:
                        nstages += 1
                        ntasks += si.numTasks
        out[n] = {"wall_s": round(wall, 3), "jobs": njobs,
                  "stages": nstages, "tasks": ntasks}
        print(json.dumps({n: out[n]}), flush=True)
    print(json.dumps({"profile": out, "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
