"""A/B/C probe of q1's exactness tax (r12; VERDICT #5).

Variants over the same lineitem scan, interleaved ABBA in one session:
  fold    — the engine's digit-fold ESUM (current, bit-exact, 3 sum
            buffers per aggregate)
  plain   — naive sum/avg (NOT order-independent; lower bound only)
  decimal — sum(cast(x as decimal(38,10))) cast back (the scheme
            stats.py rejected in r6; VERDICT asks for a re-probe at a
            decade before re-rejecting)

Usage: SPARK_GRAFT_SF_DIR=... python tools/probe_q1_exactness.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PAIRS = int(os.environ.get("PROBE_RUNS", "5"))


def fold_sql(x: str) -> str:
    f0 = f"FLOOR({x})"
    fr = f"(({x}) - CAST({f0} AS DOUBLE))"
    frB = f"({fr} * 1.0E6)"
    l1 = f"FLOOR({frB})"
    l2 = f"FLOOR((({frB} - CAST({l1} AS DOUBLE)) * 1.0E6))"
    return f"(sum({f0}) + sum({l1}) / 1.0E6 + sum({l2}) / 1.0E12)"


def q1_with(spark, sums) -> "DataFrame":
    S = sums
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               {S('l_quantity')} AS sum_qty,
               {S('l_extendedprice')} AS sum_base_price,
               {S('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
               {S('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
               {S('l_quantity')} / count(l_quantity) AS avg_qty,
               {S('l_extendedprice')} / count(l_extendedprice) AS avg_price,
               {S('l_discount')} / count(l_discount) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """)


def main() -> None:
    import pandas_spark as ps
    from pandas_spark import get_spark

    spark = get_spark("probe_q1")
    li = ps.read_parquet(spark, f"{SF_DIR}/lineitem.parquet")
    li.spark.createOrReplaceTempView("lineitem")

    variants = {
        "fold": lambda x: fold_sql(x),
        "plain": lambda x: f"sum({x})",
        "decimal": lambda x: f"CAST(sum(CAST(({x}) AS DECIMAL(38,10))) AS DOUBLE)",
    }

    def run(sums) -> float:
        t0 = time.time()
        q1_with(spark, sums).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for name, s in variants.items():
        run(s)  # warm
    times: dict[str, list[float]] = {k: [] for k in variants}
    order = list(variants.items())
    for i in range(PAIRS):
        seq = order if i % 2 == 0 else order[::-1]
        for name, s in seq:
            times[name].append(run(s))
    for name, ts in times.items():
        print(
            f"{name:8s} med={statistics.median(ts):.3f} "
            f"all={[round(t, 3) for t in ts]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
