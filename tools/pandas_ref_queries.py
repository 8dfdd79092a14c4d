"""The pandas reference implementations of the headline queries —
SHARED between tools/bench_pandas_ref.py (the archived BASELINE_ref.json
record) and bench.py's in-run same-moment probes, so the two
denominators can never drift semantically (round-10 verdict #1b: the
committed/driver/judge ratios disagreed because only 3 of 17 queries
were re-probed in-run).

Each function mirrors a headline query from pandas_spark/suite.py
semantically — same filter, same keys, same aggregates — written as
idiomatic eager pandas.

``build(sf_dir)`` loads the tables once and returns
``{query_name: zero-arg callable}``.
"""

from __future__ import annotations

import pandas as pd


def build(sf_dir: str) -> dict:
    def load(name: str, columns=None) -> pd.DataFrame:
        return pd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)

    lineitem = load("lineitem")
    orders = load("orders")
    customer = load("customer")
    nation = load("nation")
    region = load("region")
    part = load("part")
    events = load("events")

    cutoff = pd.Timestamp("1998-09-02")

    def q1_groupby_agg():
        df = lineitem[lineitem.l_shipdate <= cutoff]
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
                avg_price=("l_extendedprice", "mean"),
                avg_disc=("l_discount", "mean"),
                count_order=("l_quantity", "size"),
            )
        )

    def join_inner():
        o = orders[orders.o_orderdate >= pd.Timestamp("1996-01-01")]
        m = lineitem.merge(o, left_on="l_orderkey", right_on="o_orderkey", how="inner")
        m = m.assign(rev=m.l_extendedprice * (1 - m.l_discount))
        return m.groupby("o_orderpriority").agg(revenue=("rev", "sum"), n=("rev", "size"))

    def join_left():
        m = customer.merge(orders, left_on="c_custkey", right_on="o_custkey", how="left")
        return m.groupby("c_mktsegment").agg(
            n_rows=("c_custkey", "size"),
            n_orders=("o_orderkey", "count"),
            total=("o_totalprice", "sum"),
        )

    def join_multi_star():
        m = customer.merge(nation, left_on="c_nationkey", right_on="n_nationkey").merge(
            region, left_on="n_regionkey", right_on="r_regionkey"
        )
        return m.groupby(["r_name", "n_name"]).agg(
            n_cust=("c_custkey", "size"), bal=("c_acctbal", "sum")
        )

    def merge_asof_backward():
        clicks = (
            events[events.event_type == "click"][["user_id", "ts", "event_id"]]
            .sort_values("ts", kind="stable")
        )
        purchases = (
            events[events.event_type == "purchase"][["user_id", "ts", "value"]]
            .sort_values("ts", kind="stable")
        )
        return pd.merge_asof(clicks, purchases, on="ts", by="user_id", direction="backward")

    def topk_orders():
        return (
            orders[["o_orderkey", "o_totalprice", "o_orderdate"]]
            .sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
            .head(100)
        )

    def dedup_keep_first():
        return (
            lineitem[["l_suppkey", "l_orderkey", "l_linenumber", "l_quantity"]]
            .sort_values(["l_orderkey", "l_linenumber"], kind="stable")
            .drop_duplicates(subset=["l_suppkey"], keep="first")
        )

    def window_cumsum():
        df = orders.sort_values(["o_orderdate", "o_orderkey"], kind="stable")
        return df.assign(running_total=df.groupby("o_custkey")["o_totalprice"].cumsum())

    def rolling_time_mean():
        df = events.sort_values("ts", kind="stable").set_index("ts")
        out = (
            df.groupby("user_id")["value"]
            .rolling("1h", min_periods=1)
            .mean()
        )
        return out

    def resample_1h():
        return events.set_index("ts").resample("1h")["value"].agg(["sum", "count"])

    def string_ops():
        p = part[
            part.p_type.str.startswith("STANDARD") | part.p_name.str.contains("red", regex=False)
        ]
        return p.assign(
            name_upper=p.p_name.str.upper(),
            name_len=p.p_name.str.len(),
            has_green=p.p_name.str.contains("green", regex=False),
            type2=p.p_type.str.replace("PLATED", "COATED", regex=False),
            brand5=p.p_brand.str.slice(0, 5),
        )

    def value_counts():
        return lineitem[["l_returnflag", "l_linestatus"]].value_counts()

    def query_dialect():
        hi = 100000
        return orders.query(
            "(o_totalprice > @hi and o_orderpriority in ['1-URGENT', '2-HIGH'])"
            " or o_orderstatus == 'F' and o_totalprice < 50000"
        )[["o_orderkey", "o_totalprice"]]

    def pivot_sum():
        return lineitem.pivot_table(
            values="l_quantity", index="l_returnflag", columns="l_linestatus", aggfunc="sum"
        )

    def melt_unpivot():
        return lineitem.melt(
            id_vars=["l_orderkey", "l_linenumber"],
            value_vars=["l_quantity", "l_extendedprice", "l_discount"],
            var_name="metric",
            value_name="value",
        )

    def groupby_skew_kurt():
        g = lineitem.groupby("l_returnflag")["l_extendedprice"]
        return pd.DataFrame({"skew": g.skew(), "kurt": g.apply(pd.Series.kurt)})

    def ewm_mean():
        df = events.sort_values("event_id", kind="stable")
        return df.groupby("user_id")["value"].transform(
            lambda s: s.ewm(alpha=0.3, adjust=True).mean()
        )

    def parquet_scan_count():
        return len(pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]))

    return {
        "q1_groupby_agg": q1_groupby_agg,
        "join_inner": join_inner,
        "join_left": join_left,
        "join_multi_star": join_multi_star,
        "merge_asof_backward": merge_asof_backward,
        "topk_orders": topk_orders,
        "dedup_keep_first": dedup_keep_first,
        "window_cumsum": window_cumsum,
        "rolling_time_mean": rolling_time_mean,
        "resample_1h": resample_1h,
        "string_ops": string_ops,
        "value_counts": value_counts,
        "query_dialect": query_dialect,
        "pivot_sum": pivot_sum,
        "melt_unpivot": melt_unpivot,
        "groupby_skew_kurt": groupby_skew_kurt,
        "ewm_mean": ewm_mean,
        "parquet_scan_count": parquet_scan_count,
    }
