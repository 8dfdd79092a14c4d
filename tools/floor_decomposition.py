"""Per-query FLOOR decomposition of the headline set (round-10 verdict
#1c done-criterion: "≤2.0 or a per-query floor decomposition proving
the residual is irreducible scheduling").

For every headline query, in ONE process at ONE box moment:

* ``build_s``   — wall to construct the DataFrame through the engine
  API (py4j round trips + Catalyst's EAGER analysis of every
  intermediate Dataset — classic pyspark analyzes on each transform).
* ``exec_s``    — wall of the noop materialization (physical planning
  + codegen/cache lookup + job scheduling + task compute).
* ``jobs``      — Spark jobs the materialization launched.
* ``pandas_s``  — the pandas reference body (tools/pandas_ref_queries)
  timed in the same run, same moment.

The floor claim this artifact supports: ``build_s`` plus the per-job
scheduling cost (measured separately as ~40-60 ms/job on this box via
a trivial 1-partition job) is time pandas does not pay at sf0.1 but a
real cluster client pays ONCE per query regardless of data size — it
is the fixed intercept, not the slope. The slope (exec minus
scheduling) is what scales with data, and the 10×/100× decades in
CROSSOVER.json grade that directly.

Usage: python tools/floor_decomposition.py [query ...]
       (writes FLOOR_DECOMP.json at the repo root and prints a table)
"""

from __future__ import annotations

import json
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


def _median(fn, runs=3):
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts), out


def main() -> None:
    from pandas_spark import get_spark
    from pandas_spark import suite
    from pandas_ref_queries import build as build_pandas
    from bench import _box_calibration_ms

    spark = get_spark("floor_decomp")
    sc = spark.sparkContext
    qs = suite.queries()
    names = sys.argv[1:] or HEADLINE

    # per-job scheduling cost probe: a trivial 1-partition job, median
    # of 9 — the lower bound any extra job pays regardless of data
    spark.range(1).write.format("noop").mode("overwrite").save()
    sched = []
    for _ in range(9):
        t0 = time.perf_counter()
        spark.range(1).write.format("noop").mode("overwrite").save()
        sched.append(time.perf_counter() - t0)
    sched_s = round(statistics.median(sched), 4)

    for n in names:  # warm: codegen caches, arrow pool, broadcast machinery
        qs[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    pfns = build_pandas(SF_DIR)
    rows = {}
    for n in names:
        build_s, df = _median(lambda: qs[n](spark, SF_DIR))
        j0 = sc._jsc.sc().dagScheduler().nextJobId()
        exec_s, _ = _median(
            lambda: qs[n](spark, SF_DIR)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        exec_s = max(0.0, exec_s - build_s)  # the exec runs rebuild too
        j1 = sc._jsc.sc().dagScheduler().nextJobId()
        jobs = max(1, (j1 - j0) // 3)  # 3 timed materializations
        pandas_s = None
        if n in pfns:
            pfns[n]()
            pandas_s, _ = _median(pfns[n])
            pandas_s = round(pandas_s, 4)
        floor = round(build_s + jobs * sched_s, 4)
        rows[n] = {
            "build_s": round(build_s, 4),
            "exec_s": round(exec_s, 4),
            "jobs": jobs,
            "pandas_s": pandas_s,
            "fixed_floor_s": floor,
            "floor_fraction": (
                round(floor / (build_s + exec_s), 3)
                if build_s + exec_s > 0
                else None
            ),
        }
        print(
            f"{n:24s} build={build_s:6.3f} exec={exec_s:6.3f} jobs={jobs} "
            f"pandas={pandas_s} floor_frac={rows[n]['floor_fraction']}"
        )

    out = {
        "sf_dir": SF_DIR,
        "box_calib_ms": _box_calibration_ms(),
        "sched_job_s": sched_s,
        "queries": rows,
        "totals": {
            "engine_s": round(
                sum(r["build_s"] + r["exec_s"] for r in rows.values()), 3
            ),
            "fixed_floor_s": round(
                sum(r["fixed_floor_s"] for r in rows.values()), 3
            ),
            "pandas_s": round(
                sum(r["pandas_s"] for r in rows.values() if r["pandas_s"]), 3
            ),
        },
    }
    with open(os.path.join(ROOT, "FLOOR_DECOMP.json"), "w") as f:
        json.dump(out, f, indent=1)
    t = out["totals"]
    print(
        f"\ntotals: engine {t['engine_s']}s, fixed floor {t['fixed_floor_s']}s "
        f"({t['fixed_floor_s'] / t['engine_s'] * 100:.0f}% of engine wall), "
        f"pandas {t['pandas_s']}s, per-job scheduling {sched_s}s"
    )
    print(
        "2x budget check: pandas_total x 2 =",
        round(t["pandas_s"] * 2, 3),
        "vs fixed floor",
        t["fixed_floor_s"],
        "→ bar is floor-bound" if t["fixed_floor_s"] > t["pandas_s"] * 2 * 0.8
        else "→ slope-bound, keep optimizing",
    )


if __name__ == "__main__":
    main()
