"""Measure the reference side of BASELINE.md: pandas itself, same
machine, same parquet data (protocol: wall-clock seconds, median of 5
after 1 warmup; see BASELINE.md).

The query bodies live in tools/pandas_ref_queries.py, SHARED with
bench.py's in-run same-moment probes (round-10 verdict #1b) — one
source of truth for the pandas denominator. Usage:

    python tools/bench_pandas_ref.py [sf_dir] > BASELINE_ref.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pandas_ref_queries import build  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def bench(fn, runs: int | None = None) -> float:
    if runs is None:
        runs = int(os.environ.get("PANDAS_REF_RUNS", "5"))
    fn()  # warmup
    times = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return round(statistics.median(times), 3)


def main() -> None:
    benches = build(SF_DIR)
    timings = {}
    for name, fn in benches.items():
        timings[name] = bench(fn)
        print(f"{name}: {timings[name]}s", file=sys.stderr)

    # Stamp the box state these numbers were taken under (same probe
    # bench.py uses), so bench.py can calib-normalize its ratio
    # against this reference by construction.
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _box_calibration_ms

    print(
        json.dumps(
            {
                "metric": "pandas_reference_seconds",
                "pandas_version": pd.__version__,
                "sf_dir": SF_DIR,
                "protocol": "median of 5 after 1 warmup",
                "queries": timings,
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "box_calib_ms": _box_calibration_ms(),
            }
        )
    )


if __name__ == "__main__":
    main()
