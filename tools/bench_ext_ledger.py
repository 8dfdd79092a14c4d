"""Bench-style timing ledger for the non-headline operator families
(VERDICT r11 #7: streaming + similarity-ANN were untouched for two
rounds — "left alone" must be a measured claim, not an assumption).

Each query is timed END-TO-END per invocation: the suite builder runs
(for streaming entries that includes driving the stream to completion
into its sink) and the returned frame materializes through the noop
sink — the same action the bench times. Warmup once, median of N.

Usage: SPARK_GRAFT_SF_DIR=... python tools/bench_ext_ledger.py [names...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("LEDGER_RUNS", "3"))

DEFAULT = [
    # streaming family (suite_datapipe / suite_ext)
    "streaming_resample_1h",
    "streaming_enrich_join",
    "streaming_session_windows",
    "streaming_quality_filter",
    "streaming_dedup_keys",
    "streaming_merge_asof",
    "streaming_merge_asof_buffered",
    "streaming_merge_asof_fwd",
    "streaming_merge_asof_nearest",
    # similarity-ANN family
    "sim_topk_ivf",
    "sim_topk_ivfpq",
    "sim_topk_pq",
    "sim_topk_lsh",
    "sim_neardup_blocked",
    "sim_neardup_lsh",
]


def main() -> None:
    from pandas_spark import get_spark, suite
    from bench import _box_calibration_ms

    names = sys.argv[1:] or DEFAULT
    spark = get_spark("ext_ledger")
    qs = suite.queries()
    out = {"sf_dir": SF_DIR, "box_calib_ms": _box_calibration_ms(), "queries": {}}

    def once(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for n in names:
        once(n)  # warm
        ts = [once(n) for _ in range(RUNS)]
        out["queries"][n] = round(statistics.median(ts), 3)
        print(f"{n:32s} {out['queries'][n]:7.3f}  all={[round(t, 3) for t in ts]}",
              file=sys.stderr, flush=True)
    out["box_calib_ms_end"] = _box_calibration_ms()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
