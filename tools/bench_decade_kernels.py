"""Decade rows for the correlation kernels (SCALE.md): distributed
kendall tau-b (r9) and the spearman rank v2 (r8) on the lineitem pair
(l_quantity — 50 distinct values, the heavy-tie shape that OOM'd rank
v1 — and l_extendedprice, near-continuous).

Inputs: a parquet decade dir (.scratch/sf1ish, sf10ish, sf100ish), or
``EXPLODE:<n>`` which replicates sf0.1 on the fly with a
sequence-explode (map-only, no shuffle added). The 10^4x decade MUST
be generated on the fly: a 6G-row lineitem is ~90 GB of parquet, more
than this box's free disk — so that row measures kernel+shuffle over
generated input rather than a parquet scan (documented in SCALE.md).
Replication multiplies tie-group sizes without adding distinct values
— exactly the regime the bucketed kernels must survive.

    SPARK_GRAFT_PROFILE=large python tools/bench_decade_kernels.py .scratch/sf10ish kendall
    SPARK_GRAFT_PROFILE=large python tools/bench_decade_kernels.py EXPLODE:10000 spearman
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
COLS = ["l_quantity", "l_extendedprice"]
# --wide5: the r10 fused-pass check — 5 numeric columns, job count
# O(k) (one pass per x-column with all partners riding along)
WIDE5 = ["l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_partkey"]


def frame(spark, spec: str):
    from pyspark.sql import functions as F

    from pandas_spark.frame import DataFrame
    import pandas_spark as ps

    if spec.startswith("EXPLODE:"):
        reps = int(spec.split(":", 1)[1])
        sdf = (
            spark.read.parquet(f"{SRC}/lineitem.parquet")
            .select(*COLS)
            .repartition(64)
            .withColumn("__rep__", F.explode(F.sequence(F.lit(1), F.lit(reps))))
            .drop("__rep__")
        )
        return DataFrame(sdf), reps
    f = ps.read_parquet(spark, f"{spec}/lineitem.parquet").select(COLS)
    return f, None


def main() -> None:
    from pandas_spark import get_spark

    spec = sys.argv[1]
    method = sys.argv[2] if len(sys.argv) > 2 else "kendall"
    global COLS
    if "--wide5" in sys.argv:
        COLS = WIDE5
    spark = get_spark("decade_kernels")
    f, reps = frame(spark, spec)
    t0 = time.time()
    sc = spark.sparkContext
    j0 = sc._jsc.sc().dagScheduler().nextJobId()
    rows = f.corr(subset=COLS, method=method).to_spark().collect()
    wall = round(time.time() - t0, 2)
    n_jobs = sc._jsc.sc().dagScheduler().nextJobId() - j0
    xy = next(
        r["corr"] for r in rows if r["col1"] == COLS[0] and r["col2"] == COLS[1]
    )
    print(
        json.dumps(
            {
                "kernel": f"corr_{method}",
                "input": spec,
                "explode_reps": reps,
                "pair": COLS,
                "wall_s": wall,
                "n_jobs": n_jobs,
                "corr_xy": xy,
            }
        )
    )


if __name__ == "__main__":
    main()
