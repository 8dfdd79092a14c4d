"""Query suite: one entry per implemented operator family (SURVEY.md §2).

Each query is a callable ``(spark, sf_dir) -> pyspark DataFrame`` built
through the pandas_spark engine API, paired with an ANSI-SQL oracle
(DuckDB dialect) over the same parquet tables. The driver compares
row-count + schema + order-insensitive value hash at sf0.01
(CORRECTNESS_r{N}.json) — so every computed column is aliased
identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame as SparkDF, SparkSession
from pandas_spark import fshim as F  # backtick-safe F.col facade

import pandas_spark as ps
from pandas_spark import col
from pandas_spark.functions import stats

QUERIES: dict[str, Callable[[SparkSession, str], SparkDF]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> ps.DataFrame:
    return ps.read_parquet(spark, f"{sf_dir}/{name}.parquet")


# --- exact base-10⁶ digit-fold SQL templates (mirror stats.exact_*) --------
# Double summation is order-dependent; both the engine and the oracle
# decompose each addend into three INTEGER-VALUED doubles — floor(x),
# the first 6 fraction digits, the next 6 — via IEEE-deterministic ops
# identical in any engine, then sum each stream as plain doubles.
# Integer summation in double arithmetic is EXACT (order-independent)
# while the running sums stay below 2⁵³, so the aggregate is THE
# mathematical sum of the deterministically quantized addends
# (fraction quantized at 1e-12), bit-identical on both sides
# regardless of partitioning. See stats.py for the engine half (and
# why this beats decimal accumulation). The expression trees match
# token-for-token so every intermediate rounds identically.


_FB = "1000000.0"          # 10^6 digit base
_FB2 = "1000000000000.0"   # 10^12


def _EQS(x: str) -> str:
    """Exact digit-fold sum: Σf0 + Σl1/10⁶ + Σl2/10¹² (mirrors _split_sum)."""
    f0 = f"floor(({x}))"
    fr = f"(({x}) - {f0})"
    frB = f"({fr} * {_FB})"
    l1 = f"floor({frB})"
    l2 = f"floor(({frB} - {l1}) * {_FB})"
    return f"(sum({f0}) + sum({l1}) / {_FB} + sum({l2}) / {_FB2})"


def ESUM(x: str) -> str:
    return _EQS(x)


def EAVG(x: str) -> str:
    return f"({ESUM(x)} / count({x}))"


def EVAR(x: str) -> str:
    n = f"CAST(count({x}) AS DOUBLE)"
    s2 = _EQS(f"({x}) * ({x})")
    return f"(({s2} - {ESUM(x)} * {ESUM(x)} / {n}) / ({n} - 1.0))"


def ESTD(x: str) -> str:
    return f"sqrt({EVAR(x)})"


def ESEM(x: str) -> str:
    return f"(sqrt({EVAR(x)}) / sqrt(CAST(count({x}) AS DOUBLE)))"


def ECORR(x: str, y: str) -> str:
    n = f"CAST(count(CASE WHEN ({x}) IS NOT NULL AND ({y}) IS NOT NULL THEN 1 END) AS DOUBLE)"
    sx = _EQS(f"CASE WHEN ({y}) IS NOT NULL THEN ({x}) END")
    sy = _EQS(f"CASE WHEN ({x}) IS NOT NULL THEN ({y}) END")
    sxx = _EQS(f"CASE WHEN ({y}) IS NOT NULL THEN ({x}) * ({x}) END")
    syy = _EQS(f"CASE WHEN ({x}) IS NOT NULL THEN ({y}) * ({y}) END")
    sxy = _EQS(f"({x}) * ({y})")
    return (
        f"(({sxy} - {sx} * {sy} / {n})"
        f" / sqrt(({sxx} - {sx} * {sx} / {n}) * ({syy} - {sy} * {sy} / {n})))"
    )


def ECOV(x: str, y: str) -> str:
    n = f"CAST(count(CASE WHEN ({x}) IS NOT NULL AND ({y}) IS NOT NULL THEN 1 END) AS DOUBLE)"
    sx = _EQS(f"CASE WHEN ({y}) IS NOT NULL THEN ({x}) END")
    sy = _EQS(f"CASE WHEN ({x}) IS NOT NULL THEN ({y}) END")
    sxy = _EQS(f"({x}) * ({y})")
    return f"(({sxy} - {sx} * {sy} / {n}) / ({n} - 1.0))"


# ---------------------------------------------------------------------------
# §2.4 groupby-agg — TPC-H Q1 shape (flagship)
# ---------------------------------------------------------------------------

@query(
    "q1_groupby_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {ESUM('l_quantity')}                                       AS sum_qty,
           {ESUM('l_extendedprice')}                                  AS sum_base_price,
           {ESUM('l_extendedprice * (1 - l_discount)')}               AS sum_disc_price,
           {ESUM('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {EAVG('l_quantity')}                                       AS avg_qty,
           {EAVG('l_extendedprice')}                                  AS avg_price,
           {EAVG('l_discount')}                                       AS avg_disc,
           count(*)::BIGINT                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_groupby_agg(spark: SparkSession, sf_dir: str) -> SparkDF:
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(col("l_shipdate") <= "1998-09-02")
        .assign(
            disc_price=col("l_extendedprice") * (1 - col("l_discount")),
            charge=col("l_extendedprice") * (1 - col("l_discount")) * (1 + col("l_tax")),
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
        .to_spark()
    )


@query(
    "groupby_stats",
    oracle=f"""
    SELECT l_returnflag,
           {EVAR('l_extendedprice')}                        AS var_price,
           {ESTD('l_extendedprice')}                        AS std_price,
           {ESEM('l_extendedprice')}                        AS sem_price,
           median(l_extendedprice)                          AS median_price,
           count(DISTINCT l_suppkey)::BIGINT                AS n_supp
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def groupby_stats(spark: SparkSession, sf_dir: str) -> SparkDF:
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.groupby("l_returnflag")
        .agg(
            var_price=("l_extendedprice", "var"),
            std_price=("l_extendedprice", "std"),
            sem_price=("l_extendedprice", "sem"),
            median_price=("l_extendedprice", "median"),
            n_supp=("l_suppkey", "nunique"),
        )
        .to_spark()
    )


@query(
    "groupby_minmax_firstlast",
    oracle="""
    SELECT o_orderpriority,
           min(o_totalprice)  AS min_price,
           max(o_totalprice)  AS max_price,
           min(o_orderdate)   AS first_date,
           max(o_orderdate)   AS last_date
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def groupby_minmax_firstlast(spark: SparkSession, sf_dir: str) -> SparkDF:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupby("o_orderpriority")
        .agg(
            min_price=("o_totalprice", "min"),
            max_price=("o_totalprice", "max"),
            first_date=("o_orderdate", "min"),
            last_date=("o_orderdate", "max"),
        )
        .to_spark()
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------

@query(
    "join_inner",
    oracle=f"""
    SELECT o_orderpriority,
           {ESUM('l_extendedprice * (1 - l_discount)')} AS revenue,
           count(*)::BIGINT AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY o_orderpriority
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> SparkDF:
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(col("o_orderdate") >= "1996-01-01")
    return (
        lineitem.merge(orders, left_on="l_orderkey", right_on="o_orderkey", how="inner")
        .assign(rev=col("l_extendedprice") * (1 - col("l_discount")))
        .groupby("o_orderpriority")
        .agg(revenue=("rev", "sum"), n=("rev", "size"))
        .to_spark()
    )


@query(
    "join_left",
    oracle=f"""
    SELECT c_mktsegment,
           count(*)::BIGINT                      AS n_rows,
           count(o_orderkey)::BIGINT             AS n_orders,
           {ESUM('o_totalprice')}                AS total
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> SparkDF:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        # broadcast='left': customer is the small preserved dim joined
        # to the orders fact — merge() honors this via the
        # inner-∪-anti rewrite (joins.py) so the fact side streams
        # instead of both sides shuffling (or the fact broadcasting).
        customer.merge(orders, left_on="c_custkey", right_on="o_custkey", how="left",
                       broadcast="left")
        .groupby("c_mktsegment")
        .agg(
            n_rows=("c_custkey", "size"),
            n_orders=("o_orderkey", "count"),
            total=("o_totalprice", "sum"),
        )
        .to_spark()
    )


@query(
    "join_anti",
    oracle="""
    SELECT p_brand, count(*)::BIGINT AS n_unsold
    FROM part ANTI JOIN lineitem ON p_partkey = l_partkey
    GROUP BY p_brand
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> SparkDF:
    part = _t(spark, sf_dir, "part")
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        part.merge(lineitem, left_on="p_partkey", right_on="l_partkey", how="left_anti")
        .groupby("p_brand")
        .agg(n_unsold=("p_partkey", "size"))
        .to_spark()
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_mktsegment, count(*)::BIGINT AS n_active
    FROM customer SEMI JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> SparkDF:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.merge(orders, left_on="c_custkey", right_on="o_custkey", how="semi")
        .groupby("c_mktsegment")
        .agg(n_active=("c_custkey", "size"))
        .to_spark()
    )


@query(
    "join_multi_star",
    oracle=f"""
    SELECT r_name, n_name, count(*)::BIGINT AS n_cust, {ESUM('c_acctbal')} AS bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_multi_star(spark: SparkSession, sf_dir: str) -> SparkDF:
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    # dims are small → broadcast both (no shuffle of the fact table)
    return (
        customer.merge(nation, left_on="c_nationkey", right_on="n_nationkey", broadcast="right")
        .merge(region, left_on="n_regionkey", right_on="r_regionkey", broadcast="right")
        .groupby(["r_name", "n_name"])
        .agg(n_cust=("c_custkey", "size"), bal=("c_acctbal", "sum"))
        .to_spark()
    )


# ---------------------------------------------------------------------------
# §2.6 sort / top-k / dedup
# ---------------------------------------------------------------------------

@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> SparkDF:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(["o_orderkey", "o_totalprice", "o_orderdate"])
        .sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        .head(100)
        .to_spark()
    )


@query(
    "dedup_keep_first",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    QUALIFY row_number() OVER (
        PARTITION BY l_suppkey
        ORDER BY l_orderkey, l_linenumber, l_quantity) = 1
    """,
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> SparkDF:
    lineitem = _t(spark, sf_dir, "lineitem").select(
        ["l_suppkey", "l_orderkey", "l_linenumber", "l_quantity"]
    )
    # deterministic "first": establish the order explicitly, then
    # dedup. l_quantity rides as the third key because the synthetic
    # data does NOT enforce (orderkey, linenumber) uniqueness — with it
    # the sort order ties only on fully-identical payload rows, so the
    # stable-sort position tiebreak (pandas first-occurrence rule)
    # cannot flip observable values vs the oracle's value ordering.
    return (
        lineitem.sort_values(["l_orderkey", "l_linenumber", "l_quantity"])
        .drop_duplicates(subset=["l_suppkey"], keep="first")
        .to_spark()
    )


@query(
    "value_counts",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS count
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def value_counts(spark: SparkSession, sf_dir: str) -> SparkDF:
    lineitem = _t(spark, sf_dir, "lineitem")
    return lineitem.value_counts(["l_returnflag", "l_linestatus"], sort=False).to_spark()


# ---------------------------------------------------------------------------
# §2.2 filter / projection / scalar exprs / query dialect
# ---------------------------------------------------------------------------

@query(
    "filter_project_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net,
           round(l_quantity / 7.0, 2)         AS qty_per_week
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def filter_project_arith(spark: SparkSession, sf_dir: str) -> SparkDF:
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(col("l_discount").between(0.05, 0.07) & (col("l_quantity") < 24))
        .assign(
            net=col("l_extendedprice") * (1 - col("l_discount")),
            qty_per_week=(col("l_quantity") / 7.0).round(2),
        )
        .select(["l_orderkey", "l_linenumber", "net", "qty_per_week"])
        .to_spark()
    )


@query(
    "query_dialect",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE (o_totalprice > 100000 AND o_orderpriority IN ('1-URGENT', '2-HIGH'))
       OR o_orderstatus = 'F' AND o_totalprice < 50000
    """,
)
def query_dialect(spark: SparkSession, sf_dir: str) -> SparkDF:
    orders = _t(spark, sf_dir, "orders")
    hi = 100000
    return (
        orders.query(
            "(o_totalprice > @hi and o_orderpriority in ['1-URGENT', '2-HIGH'])"
            " or o_orderstatus == 'F' and o_totalprice < 50000",
            hi=hi,
        )
        .select(["o_orderkey", "o_totalprice"])
        .to_spark()
    )


@query(
    "string_ops",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                   AS name_upper,
           length(p_name)::INT                             AS name_len,
           contains(p_name, 'green')                       AS has_green,
           replace(p_type, 'PLATED', 'COATED')             AS type2,
           substring(p_brand, 1, 5)                        AS brand5
    FROM part
    WHERE starts_with(p_type, 'STANDARD') OR contains(p_name, 'red')
    """,
)
def string_ops(spark: SparkSession, sf_dir: str) -> SparkDF:
    part = _t(spark, sf_dir, "part")
    return (
        part.filter(
            col("p_type").str.startswith("STANDARD") | col("p_name").str.contains("red", regex=False)
        )
        .assign(
            name_upper=col("p_name").str.upper(),
            name_len=col("p_name").str.len(),
            has_green=col("p_name").str.contains("green", regex=False),
            type2=col("p_type").str.replace("PLATED", "COATED", regex=False),
            brand5=col("p_brand").str.slice(0, 5),
        )
        .select(["p_partkey", "name_upper", "name_len", "has_green", "type2", "brand5"])
        .to_spark()
    )


@query(
    "datetime_ops",
    oracle=f"""
    SELECT date_trunc('month', o_orderdate)::TIMESTAMP AS month,
           count(*)::BIGINT                  AS n,
           {ESUM('o_totalprice')}            AS total
    FROM orders
    WHERE year(o_orderdate) = 1997 AND dayofweek(o_orderdate) NOT IN (0, 6)
    GROUP BY 1
    """,
)
def datetime_ops(spark: SparkSession, sf_dir: str) -> SparkDF:
    orders = _t(spark, sf_dir, "orders")
    # duckdb dayofweek: Sunday=0..Saturday=6; pandas weekday: Monday=0..Sunday=6
    return (
        orders.filter(
            (col("o_orderdate").dt.year == 1997) & (col("o_orderdate").dt.weekday < 5)
        )
        .assign(month=col("o_orderdate").dt.floor("month"))
        .groupby("month")
        .agg(n=("o_orderkey", "size"), total=("o_totalprice", "sum"))
        .to_spark()
    )


# ---------------------------------------------------------------------------
# §2.5 windows
# ---------------------------------------------------------------------------

@query(
    "window_lag_diff",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           o_totalprice - lag(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS price_diff
    FROM orders
    """,
)
def window_lag_diff(spark: SparkSession, sf_dir: str) -> SparkDF:
    orders = _t(spark, sf_dir, "orders")
    # stable order: orderdate with orderkey tiebreak
    out = (
        orders.sort_values(["o_orderdate", "o_orderkey"])
        .groupby("o_custkey")
        .diff("o_totalprice", alias="price_diff")
    )
    return out.select(["o_custkey", "o_orderkey", "o_totalprice", "price_diff"]).to_spark()


@query(
    "window_cumsum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_total
    FROM orders
    """,
)
def window_cumsum(spark: SparkSession, sf_dir: str) -> SparkDF:
    orders = _t(spark, sf_dir, "orders")
    out = (
        orders.sort_values(["o_orderdate", "o_orderkey"])
        .groupby("o_custkey")
        .cumsum("o_totalprice", alias="running_total")
    )
    return out.select(["o_custkey", "o_orderkey", "running_total"]).to_spark()


@query(
    "window_rank",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_suppkey,
           rank()       OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC) AS price_rank,
           dense_rank() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC) AS price_dense
    FROM lineitem
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> SparkDF:
    lineitem = _t(spark, sf_dir, "lineitem")
    out = (
        lineitem.groupby("l_suppkey")
        .rank("l_extendedprice", method="min", ascending=False, alias="price_rank")
        .groupby("l_suppkey")
        .rank("l_extendedprice", method="dense", ascending=False, alias="price_dense")
    )
    return (
        out.select(["l_orderkey", "l_linenumber", "l_suppkey", "price_rank", "price_dense"])
        .to_spark()
        .withColumn("price_rank", F.col("price_rank").cast("long"))
        .withColumn("price_dense", F.col("price_dense").cast("long"))
    )


@query(
    "rolling_time_mean",
    oracle="""
    SELECT event_id, user_id, ts,
           avg(value) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS value_1h_avg
    FROM events
    """,
)
def rolling_time_mean(spark: SparkSession, sf_dir: str) -> SparkDF:
    from pandas_spark.window import Rolling

    events = _t(spark, sf_dir, "events")
    r = Rolling(events, "1h", on="ts", by=["user_id"], min_periods=1)
    return r.mean("value", alias="value_1h_avg").select(
        ["event_id", "user_id", "ts", "value_1h_avg"]
    ).to_spark()


@query(
    "resample_1h",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS ts,
           {ESUM('value')}  AS value_sum,
           count(value)::BIGINT AS value_count
    FROM events
    GROUP BY 1
    """,
)
def resample_1h(spark: SparkSession, sf_dir: str) -> SparkDF:
    events = _t(spark, sf_dir, "events")
    return events.resample("1h", on="ts").agg({"value": ["sum", "count"]}).to_spark()


@query(
    "resample_interpolate_30min",
    oracle=f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts)::TIMESTAMP AS ts, {EAVG('value')} AS value
        FROM events GROUP BY 1
    ),
    bounds AS (SELECT min(ts) AS mn, max(ts) AS mx FROM hourly),
    spine AS (
        SELECT unnest(generate_series(mn, mx, INTERVAL 30 MINUTE)) AS ts FROM bounds
    ),
    j AS (
        SELECT s.ts, h.value, row_number() OVER (ORDER BY s.ts) AS rn
        FROM spine s LEFT JOIN hourly h ON s.ts = h.ts
    ),
    w AS (
        SELECT ts, rn, value,
               max(CASE WHEN value IS NOT NULL THEN rn END) OVER
                   (ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prn,
               last_value(value IGNORE NULLS) OVER
                   (ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               min(CASE WHEN value IS NOT NULL THEN rn END) OVER
                   (ORDER BY rn ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nrn,
               first_value(value IGNORE NULLS) OVER
                   (ORDER BY rn ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
        FROM j
    )
    SELECT ts,
           CASE WHEN value IS NOT NULL THEN value
                WHEN pv IS NULL THEN NULL
                WHEN nv IS NULL THEN pv
                ELSE pv * (1.0 - (rn - prn)::DOUBLE / (nrn - prn))
                     + nv * ((rn - prn)::DOUBLE / (nrn - prn))
           END AS value
    FROM w
    """,
)
def resample_interpolate_30min(spark: SparkSession, sf_dir: str) -> SparkDF:
    """``Resampler.interpolate`` (reference core/resample.py:851):
    hourly means upsampled onto a 30-minute grid, values at exact grid
    stamps, linear interpolation between, trailing carry-forward."""
    events = _t(spark, sf_dir, "events")
    hourly = events.resample("1h", on="ts").agg({"value": "mean"})
    return (
        hourly.resample("30min", on="ts")
        .interpolate(subset=["value"], method="linear")
        .select(["ts", "value"])
        .to_spark()
    )


@query(
    "resample_interpolate_by_type",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts)::TIMESTAMP AS ts,
               {EAVG('value')} AS value
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, min(ts) AS mn, max(ts) AS mx FROM hourly GROUP BY 1
    ),
    spine AS (
        SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 30 MINUTE)) AS ts
        FROM bounds
    ),
    j AS (
        SELECT s.event_type, s.ts, h.value,
               row_number() OVER (PARTITION BY s.event_type ORDER BY s.ts) AS rn
        FROM spine s
        LEFT JOIN hourly h ON s.event_type = h.event_type AND s.ts = h.ts
    ),
    w AS (
        SELECT event_type, ts, rn, value,
               max(CASE WHEN value IS NOT NULL THEN rn END) OVER
                   (PARTITION BY event_type ORDER BY rn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prn,
               last_value(value IGNORE NULLS) OVER
                   (PARTITION BY event_type ORDER BY rn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               min(CASE WHEN value IS NOT NULL THEN rn END) OVER
                   (PARTITION BY event_type ORDER BY rn
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nrn,
               first_value(value IGNORE NULLS) OVER
                   (PARTITION BY event_type ORDER BY rn
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
        FROM j
    )
    SELECT event_type, ts,
           CASE WHEN value IS NOT NULL THEN value
                WHEN pv IS NULL THEN NULL
                WHEN nv IS NULL THEN pv
                ELSE pv * (1.0 - (rn - prn)::DOUBLE / (nrn - prn))
                     + nv * ((rn - prn)::DOUBLE / (nrn - prn))
           END AS value
    FROM w
    """,
)
def resample_interpolate_by_type(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Grouped ``Resampler.interpolate`` (round 7): per-group spine —
    each event_type's own bucket-floored min..max — then per-group
    linear fill; the engine partitions every window by the group keys
    (no cross-group bleed; pandas 2.2's direct grouped interpolate
    bleeds across groups — a documented reference bug the per-group
    apply form avoids)."""
    events = _t(spark, sf_dir, "events")
    hourly = events.resample("1h", on="ts", by=["event_type"]).agg({"value": "mean"})
    return (
        hourly.resample("30min", on="ts", by=["event_type"])
        .interpolate(subset=["value"], method="linear")
        .select(["event_type", "ts", "value"])
        .to_spark()
    )


# ---------------------------------------------------------------------------
# §2.9 reshape
# ---------------------------------------------------------------------------

@query(
    "pivot_sum",
    oracle=f"""
    SELECT l_returnflag,
           {ESUM("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS F,
           {ESUM("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_sum(spark: SparkSession, sf_dir: str) -> SparkDF:
    lineitem = _t(spark, sf_dir, "lineitem")
    return ps.pivot_table(
        lineitem,
        values="l_quantity",
        index="l_returnflag",
        columns="l_linestatus",
        aggfunc="sum",
        column_values=["F", "O"],
    ).to_spark()


@query(
    "pivot_margins_multi",
    oracle=f"""
    SELECT l_returnflag,
           {ESUM("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS F_l_quantity_sum,
           {EAVG("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS F_l_quantity_mean,
           {ESUM("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS O_l_quantity_sum,
           {EAVG("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS O_l_quantity_mean,
           {ESUM('l_quantity')} AS All_l_quantity_sum,
           {EAVG('l_quantity')} AS All_l_quantity_mean
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT 'All',
           {ESUM("CASE WHEN l_linestatus = 'F' THEN l_quantity END")},
           {EAVG("CASE WHEN l_linestatus = 'F' THEN l_quantity END")},
           {ESUM("CASE WHEN l_linestatus = 'O' THEN l_quantity END")},
           {EAVG("CASE WHEN l_linestatus = 'O' THEN l_quantity END")},
           {ESUM('l_quantity')},
           {EAVG('l_quantity')}
    FROM lineitem
    """,
)
def pivot_margins_multi(spark: SparkSession, sf_dir: str) -> SparkDF:
    """pivot_table with aggfunc LIST + margins (reference
    reshape/pivot.py:59 _add_margins over a multi-agg spec; flattened
    MultiIndex naming per core/apply.py:1888)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    return ps.pivot_table(
        lineitem,
        values="l_quantity",
        index="l_returnflag",
        columns="l_linestatus",
        aggfunc=["sum", "mean"],
        margins=True,
        column_values=["F", "O"],
    ).to_spark()


@query(
    "melt_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity::DOUBLE AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    """,
)
def melt_unpivot(spark: SparkSession, sf_dir: str) -> SparkDF:
    lineitem = _t(spark, sf_dir, "lineitem")
    return ps.melt(
        lineitem,
        id_vars=["l_orderkey", "l_linenumber"],
        value_vars=["l_quantity", "l_extendedprice", "l_discount"],
        var_name="metric",
        value_name="value",
    ).to_spark()


@query(
    "cut_bins",
    oracle=f"""
    SELECT CASE WHEN l_quantity > 0  AND l_quantity <= 10 THEN 'low'
                WHEN l_quantity > 10 AND l_quantity <= 30 THEN 'mid'
                WHEN l_quantity > 30 AND l_quantity <= 50 THEN 'high'
           END AS qty_bin,
           count(*)::BIGINT AS n,
           {ESUM('l_extendedprice')} AS total
    FROM lineitem GROUP BY 1
    """,
)
def cut_bins(spark: SparkSession, sf_dir: str) -> SparkDF:
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        ps.cut(lineitem, "l_quantity", bins=[0, 10, 30, 50], labels=["low", "mid", "high"], alias="qty_bin")
        .groupby("qty_bin", dropna=False)
        .agg(n=("l_orderkey", "size"), total=("l_extendedprice", "sum"))
        .to_spark()
    )


@query(
    "concat_union",
    oracle="""
    SELECT o_orderkey, o_totalprice, 'hi' AS bucket FROM orders WHERE o_totalprice > 200000
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'lo' FROM orders WHERE o_totalprice < 20000
    """,
)
def concat_union(spark: SparkSession, sf_dir: str) -> SparkDF:
    orders = _t(spark, sf_dir, "orders")
    hi = (
        orders.filter(col("o_totalprice") > 200000)
        .select(["o_orderkey", "o_totalprice"])
        .assign(bucket=ps.lit("hi"))
    )
    lo = (
        orders.filter(col("o_totalprice") < 20000)
        .select(["o_orderkey", "o_totalprice"])
        .assign(bucket=ps.lit("lo"))
    )
    return ps.concat([hi, lo]).to_spark()


# ---------------------------------------------------------------------------
# §2.3 merge_asof — events joined to the latest preceding event per user
# ---------------------------------------------------------------------------

@query(
    "merge_asof_backward",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id, c.ts, c.event_id, p.value AS last_purchase_value
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def merge_asof_backward(spark: SparkSession, sf_dir: str) -> SparkDF:
    events = _t(spark, sf_dir, "events")
    clicks = events.filter(col("event_type") == "click").select(["user_id", "ts", "event_id"])
    purchases = events.filter(col("event_type") == "purchase").select(["user_id", "ts", "value"])
    out = ps.merge_asof(clicks, purchases, on="ts", by="user_id", direction="backward")
    return (
        out.rename({"value": "last_purchase_value"})
        .select(["user_id", "ts", "event_id", "last_purchase_value"])
        .to_spark()
    )


# The driver's per-round CORRECTNESS sample is the FIRST 50 keys of
# queries(). Promote the 10^4x-proven pipeline kernels into that
# prefix (round-9 verdict #8) so the driver exercises them each round,
# and demote four near-duplicate variants (their base entries stay in
# the prefix; all four remain fully oracled in the 266-entry local
# suite that tools/verify_oracle.py runs).
_DRIVER_PROMOTE = [
    "text_repetition_gopher",
    "dedup_exact_substring",
    "cluster_kmeans",
    "sim_topk_ivfpq",
]
_DRIVER_DEMOTE = [
    "dedup_cluster_reps",
    "dedup_cluster_reps_best",
    "merge_asof_tolerance",
    "merge_asof_nearest",
]


def _driver_order(keys) -> list[str]:
    rest = [k for k in keys if k not in _DRIVER_PROMOTE and k not in _DRIVER_DEMOTE]
    promote = [k for k in _DRIVER_PROMOTE if k in keys]
    demote = [k for k in _DRIVER_DEMOTE if k in keys]
    cut = max(0, 50 - len(promote))
    return rest[:cut] + promote + rest[cut:] + demote


def queries() -> dict[str, Callable[[SparkSession, str], SparkDF]]:
    return {k: QUERIES[k] for k in _driver_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    return {k: ORACLES[k] for k in _driver_order(list(ORACLES))}


# Registers the training-data-pipeline entries (text / dedup /
# similarity / multimodal) into QUERIES/ORACLES. Bottom import: the
# module needs the @query decorator defined above.
import pandas_spark.suite_datapipe  # noqa: E402,F401
import pandas_spark.suite_ext  # noqa: E402,F401
