"""Capture .explain('formatted') output for headline queries.

Usage: python tools/capture_plans.py <dir> <suffix> [query ...]
Writes plans/<dir>/<query>_<suffix>.txt for each query (default: the
bench HEADLINE set). Pure plan construction + EXPLAIN - no jobs run.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pandas_spark import get_spark
    from pandas_spark import suite
    from bench import HEADLINE

    outdir = os.path.join(ROOT, "plans", sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:] or HEADLINE
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark("capture_plans")
    qs = suite.queries()
    for n in names:
        if n not in qs:
            print(f"skip {n}: not in queries()")
            continue
        df = qs[n](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(outdir, f"{n}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {outdir}/{n}_{suffix}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
