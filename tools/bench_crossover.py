"""Engine-vs-pandas crossover measurement at ~6M rows (BASELINE.md).

The sf0.1 headline numbers are dominated by Spark's fixed per-query
floor (~0.2-0.5s of job scheduling / shuffle setup that does not scale
with data). This script measures the point the design claim is
actually about: the same queries on 10× data (6M-row lineitem, 1M-row
events in ``.scratch/sf1ish``), engine and eager pandas side by side,
median of 3 after 1 warmup. Usage:

    python tools/bench_crossover.py [dir] > /tmp/crossover.json

Generates the 10× data on first run by replicating sf0.1 with shifted
keys (deterministic).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1ish"
SRC = "/root/testdata/sf0.1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_data(spark):
    from pyspark.sql import functions as F

    if os.path.exists(f"{DIR}/lineitem.parquet"):
        return
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    reps = [li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 10_000_000)) for i in range(10)]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    out.write.mode("overwrite").parquet(f"{DIR}/lineitem.parquet")
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    reps = [ev.withColumn("user_id", F.col("user_id") + F.lit(i * 1_000_000)) for i in range(10)]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    out.write.mode("overwrite").parquet(f"{DIR}/events.parquet")


def med3(fn):
    fn()
    ts = [0.0] * 3
    for i in range(3):
        t0 = time.time()
        fn()
        ts[i] = time.time() - t0
    return round(statistics.median(ts), 3)


def main():
    import pandas as pd

    from pandas_spark import get_spark
    import pandas_spark as ps
    from pandas_spark.expr import col

    spark = get_spark("crossover")
    ensure_data(spark)

    out = {}

    # ---- engine side -------------------------------------------------
    li = ps.read_parquet(spark, f"{DIR}/lineitem.parquet")
    cutoff = "1998-09-02"

    def e_q1():
        df = li.filter(col("l_shipdate") <= cutoff).assign(
            disc_price=col("l_extendedprice") * (1 - col("l_discount")),
            charge=col("l_extendedprice") * (1 - col("l_discount")) * (1 + col("l_tax")),
        )
        g = df.groupby(["l_returnflag", "l_linestatus"]).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            sum_charge=("charge", "sum"),
            avg_qty=("l_quantity", "mean"),
            count_order=("l_quantity", "count"),
        )
        g.to_spark().write.format("noop").mode("overwrite").save()

    def e_dedup():
        d = (
            li[["l_suppkey", "l_orderkey", "l_linenumber", "l_quantity"]]
            .sort_values(["l_orderkey", "l_linenumber"])
            .drop_duplicates(subset=["l_suppkey"], keep="first")
        )
        d.to_spark().write.format("noop").mode("overwrite").save()

    def e_cumsum():
        d = (
            li.sort_values(["l_orderkey", "l_linenumber"])
            .groupby("l_suppkey")
            .cumsum("l_quantity", alias="running")
        )
        d.to_spark().write.format("noop").mode("overwrite").save()

    def e_vc():
        li[["l_returnflag", "l_linestatus"]].value_counts().to_spark().write.format(
            "noop"
        ).mode("overwrite").save()

    out["engine"] = {
        "q1": med3(e_q1),
        "dedup_keep_first": med3(e_dedup),
        "cumsum_per_group": med3(e_cumsum),
        "value_counts": med3(e_vc),
    }

    # ---- pandas side -------------------------------------------------
    # column-pruned up front — the idiomatic-pandas equivalent of the
    # engine's scan pruning; timing the full-width frame would strawman
    # the baseline with copy costs no careful pandas user pays
    pli = pd.read_parquet(
        f"{DIR}/lineitem.parquet",
        columns=[
            "l_shipdate", "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax",
            "l_suppkey", "l_orderkey", "l_linenumber",
        ],
    )
    pcut = pd.Timestamp(cutoff)

    def p_q1():
        df = pli[pli.l_shipdate <= pcut]
        return (
            df.assign(
                disc_price=df.l_extendedprice * (1 - df.l_discount),
                charge=df.l_extendedprice * (1 - df.l_discount) * (1 + df.l_tax),
            )
            .groupby(["l_returnflag", "l_linestatus"])
            .agg(
                sum_qty=("l_quantity", "sum"),
                sum_base_price=("l_extendedprice", "sum"),
                sum_disc_price=("disc_price", "sum"),
                sum_charge=("charge", "sum"),
                avg_qty=("l_quantity", "mean"),
                count_order=("l_quantity", "count"),
            )
        )

    def p_dedup():
        return (
            pli[["l_suppkey", "l_orderkey", "l_linenumber", "l_quantity"]]
            .sort_values(["l_orderkey", "l_linenumber"], kind="stable")
            .drop_duplicates(subset=["l_suppkey"], keep="first")
        )

    def p_cumsum():
        df = pli[["l_suppkey", "l_orderkey", "l_linenumber", "l_quantity"]].sort_values(
            ["l_orderkey", "l_linenumber"], kind="stable"
        )
        return df.assign(running=df.groupby("l_suppkey")["l_quantity"].cumsum())

    def p_vc():
        return pli[["l_returnflag", "l_linestatus"]].value_counts()

    out["pandas"] = {
        "q1": med3(p_q1),
        "dedup_keep_first": med3(p_dedup),
        "cumsum_per_group": med3(p_cumsum),
        "value_counts": med3(p_vc),
    }
    out["rows"] = int(len(pli))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
