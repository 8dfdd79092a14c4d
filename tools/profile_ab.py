"""Interleaved same-moment A/B of runtime SQL confs over the headline set.

Box calib swings ±40% within minutes here, so sequential runs of two
configs measure the box, not the change. This tool alternates A and B
runs of each query back-to-back in ONE session (ABBA ordering cancels
linear drift), flipping only runtime-settable SQL confs between runs.

Usage: python tools/profile_ab.py k=v [k=v ...] [--queries a,b,c]
       (A = session defaults, B = with the given confs applied)
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
    confs = {}
    names = HEADLINE
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--queries":
            names = args[i + 1].split(",")
            i += 2
            continue
        if "=" in a:
            k, v = a.split("=", 1)
            confs[k] = v
        i += 1

    from pandas_spark import get_spark
    from pandas_spark import suite
    from bench import _box_calibration_ms

    spark = get_spark("profile_ab")
    qs = suite.queries()
    baseline = {k: spark.conf.get(k, None) for k in confs}

    def set_mode(b: bool):
        for k, v in confs.items():
            if b:
                spark.conf.set(k, v)
            elif baseline[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, baseline[k])

    for n in names:  # warm both modes
        for b in (False, True):
            set_mode(b)
            qs[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    set_mode(False)

    print(f"calib={_box_calibration_ms()}  B={confs}")
    print(f"{'query':24s} {'A_s':>7s} {'B_s':>7s} {'delta':>7s}")
    totA = totB = 0.0
    rounds = int(os.environ.get("AB_ROUNDS", "4"))
    for n in names:
        df = qs[n](spark, SF_DIR)
        ta, tb = [], []
        # ABBA BAAB ordering
        order = [False, True, True, False, True, False, False, True] * ((rounds + 1) // 2)
        for b in order[: rounds * 2]:
            set_mode(b)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            (tb if b else ta).append(dt)
        set_mode(False)
        a, b = statistics.median(ta), statistics.median(tb)
        print(f"{n:24s} {a:7.3f} {b:7.3f} {b - a:+7.3f}")
        totA += a
        totB += b
    print(f"{'TOTAL':24s} {totA:7.3f} {totB:7.3f} {totB - totA:+7.3f}")
    print(f"calib_end={_box_calibration_ms()}")


if __name__ == "__main__":
    main()
