"""Per-query plan-BUILD profile: py4j round trips + build wall.

For each headline query, construct the DataFrame (no action) and count
low-level py4j commands (GatewayClient.send_command interceptions) plus
wall seconds, median of 3 after one warm build. Identifies where driver
chatter — not data — is the cost (guide §1.2 fixed-cost floor).

Usage: python tools/profile_build.py [query ...] [--top N]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "q1_groupby_agg", "join_inner", "join_left", "join_multi_star",
    "merge_asof_backward", "topk_orders", "dedup_keep_first",
    "window_cumsum", "rolling_time_mean", "resample_1h", "string_ops",
    "value_counts", "query_dialect", "pivot_sum", "melt_unpivot",
    "groupby_skew_kurt", "ewm_mean", "text_stats", "dedup_minhash_lsh",
    "sim_topk_cosine",
]

_COUNT = {"n": 0}


def _install_counter():
    import py4j.clientserver as cs
    import py4j.java_gateway as jg

    for cls in (cs.ClientServerConnection, jg.GatewayConnection):
        orig = cls.send_command

        def wrapped(self, *a, _orig=orig, **kw):
            _COUNT["n"] += 1
            return _orig(self, *a, **kw)

        cls.send_command = wrapped


def main() -> None:
    from pandas_spark import get_spark
    from pandas_spark import suite

    spark = get_spark("profile_build")
    qs = suite.queries()
    names = [n for n in sys.argv[1:] if not n.startswith("--")] or HEADLINE
    _install_counter()

    rows = []
    for n in names:
        qs[n](spark, SF_DIR)  # warm build (memo fills, scan cache)
        walls, trips = [], []
        for _ in range(3):
            c0 = _COUNT["n"]
            t0 = time.perf_counter()
            qs[n](spark, SF_DIR)
            walls.append(time.perf_counter() - t0)
            trips.append(_COUNT["n"] - c0)
        rows.append((n, statistics.median(walls), int(statistics.median(trips))))

    rows.sort(key=lambda r: -r[1])
    tot_w = sum(r[1] for r in rows)
    tot_t = sum(r[2] for r in rows)
    print(f"{'query':26s} {'build_s':>8s} {'py4j':>6s}")
    for n, w, t in rows:
        print(f"{n:26s} {w:8.4f} {t:6d}")
    print(f"{'TOTAL':26s} {tot_w:8.4f} {tot_t:6d}")


if __name__ == "__main__":
    main()
