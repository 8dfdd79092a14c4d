"""Adversarial user-column names (round-8 verdict #2 / advisor
finding): every name here is either one of the engine's own internal
tag literals (``__rk0__``, ``__cnt__``, ``__pos__``, ``__side__``,
``__rn__``, ``__p__``, …) or a SQL-identifier stressor (dots,
backticks, unicode). pandas accepts all of them; the engine must too —
a fixed internal tag that shadows a user column either raises
AMBIGUOUS_REFERENCE (the corr repro the advisor reduced) or, worse,
silently overwrites the user's data via ``withColumn``. Each case runs
the engine op against pandas on the same frame and compares values.

The shared factory these ops must derive tags from is
``pandas_spark.dtypes.free_name`` / ``free_names``.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import conftest  # noqa: E402,F401

import pandas_spark as ps  # noqa: E402
from pandas_spark import col  # noqa: E402
from pandas_spark.frame import DataFrame  # noqa: E402

# engine-internal literals a hostile (or unlucky) user might name a
# column; __ord__-shaped names are the documented reserved namespace
# (frame.py is_order_col) and stay excluded
G, K, V, T, TS = "__side__", "__rk0__", "__cnt__", "__pos__", "__rn__"

ROWS = [
    ("a", 0, -1.5),
    ("b", 1, 2.5),
    ("a", 1, 2.5),
    (None, 2, 7.25),
    ("b", 0, None),
    ("a", 2, 0.0),
    ("b", None, 2.5),
    ("a", 0, 7.25),
]


def _frames(spark, g=G, k=K, v=V, t=T, ts=TS):
    epoch = pd.Timestamp("2024-01-01")
    data = [
        (gg, kk, vv, i, (epoch + pd.Timedelta(hours=i)).to_pydatetime())
        for i, (gg, kk, vv) in enumerate(ROWS)
    ]
    pdf = pd.DataFrame(data, columns=[g, k, v, t, ts]).astype(
        {g: "object", k: "float64", v: "float64", t: "int64", ts: "datetime64[us]"}
    )
    def q(n: str) -> str:
        return "`" + n.replace("`", "``") + "`"

    sdf = spark.createDataFrame(
        data,
        schema=f"{q(g)} string, {q(k)} int, {q(v)} double, {q(t)} int, {q(ts)} timestamp",
    )
    return pdf, DataFrame(sdf)


def _vals(x):
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return None
    if isinstance(x, float):
        return round(x, 9)
    return x


def _canon(df) -> list:
    if isinstance(df, DataFrame):
        pdf = df.to_spark().toPandas()
    else:
        pdf = df.reset_index(drop=True)
    pdf = pdf[sorted(pdf.columns)]
    rows = [tuple(_vals(x) for x in r) for r in pdf.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))


def test_corr_spearman_with_internal_tag_names(spark):
    """The advisor's exact repro class: corr(method='spearman') on a
    frame whose numeric columns are named like the rank kernel's own
    tags must compute, not raise AMBIGUOUS_REFERENCE."""
    names = ["__rk0__", "__rkv0__", "__cnt__", "__bk__"]
    rng = np.random.default_rng(7)
    data = rng.normal(size=(40, 4))
    data[3, 1] = np.nan
    pdf = pd.DataFrame(data, columns=names)
    e = DataFrame(spark.createDataFrame(pdf))
    for method in ("spearman", "pearson"):
        got = e.corr(method=method).to_spark().toPandas()
        exp = pdf.corr(method=method)
        g = got.set_index("col1") if "col1" in got.columns else got
        # compare the full matrix by (col1, col2) lookups
        for a in names:
            for b in names:
                gv = got[(got["col1"] == a) & (got["col2"] == b)]["corr"].iloc[0]
                assert abs(gv - exp.loc[a, b]) < 1e-9, (method, a, b)


def test_sorted_dedup_keep_first(spark):
    pdf, e = _frames(spark)
    exp = pdf.sort_values([T]).drop_duplicates(subset=[G], keep="first")
    got = e.sort_values([T]).drop_duplicates(subset=[G], keep="first")
    assert _canon(got) == _canon(exp)


def test_dedup_payload_tag_column(spark):
    """min_by path aliases its payload struct '__p__' — a user column
    with that exact name must survive."""
    pdf, e = _frames(spark, v="__p__")
    exp = pdf.sort_values([T]).drop_duplicates(subset=[G], keep="first")
    got = e.sort_values([T]).drop_duplicates(subset=[G], keep="first")
    assert _canon(got) == _canon(exp)


def test_duplicated_flag(spark):
    pdf, e = _frames(spark)
    exp = pdf.assign(duplicated=pdf.duplicated(subset=[G], keep=False))
    got = e.duplicated(subset=[G], keep=False)
    assert _canon(got) == _canon(exp)


def test_merge_internal_tags(spark):
    """r8 already fixed merge; keep the regression pinned through the
    shared-factory era."""
    pdf, e = _frames(spark)
    dim = [(0.0, 10.0), (1.0, 20.0), (2.0, 30.0)]
    pdim = pd.DataFrame(dim, columns=["__rk_0", "__lp__"])
    edim = DataFrame(spark.createDataFrame(pdim))
    exp = pdf.merge(pdim, left_on=K, right_on="__rk_0", how="left")
    got = e.merge(edim, left_on=K, right_on="__rk_0", how="left")
    assert _canon(got) == _canon(exp)


def test_merge_asof_internal_tags(spark):
    pdf, e = _frames(spark)
    rdata = [
        (pd.Timestamp("2024-01-01 01:30").to_pydatetime(), 1.0),
        (pd.Timestamp("2024-01-01 04:30").to_pydatetime(), 2.0),
    ]
    prt = pd.DataFrame(rdata, columns=[TS, "__rpos__"]).astype(
        {TS: "datetime64[us]", "__rpos__": "float64"}
    )
    ert = DataFrame(
        spark.createDataFrame(rdata, schema=f"`{TS}` timestamp, `__rpos__` double")
    )
    exp = pd.merge_asof(pdf.sort_values(TS), prt.sort_values(TS), on=TS)
    got = ps.merge_asof(e.sort_values(TS), ert.sort_values(TS), on=TS)
    assert _canon(got) == _canon(exp)


def test_groupby_window_ops(spark):
    pdf, e = _frames(spark)
    pg = pdf.sort_values(T)
    exp = pg.assign(
        cs=pg.groupby(G)[V].cumsum(),
        sh=pg.groupby(G)[V].shift(1),
        rk=pg.groupby(G)[V].rank(method="average"),
    )
    ge = e.sort_values(T)
    got = ge.groupby(G).cumsum(V, alias="cs")
    got = got.groupby(G).shift(V, 1, alias="sh")
    got = got.groupby(G).rank(V, method="average", alias="rk")
    assert _canon(got) == _canon(exp)


def test_frame_ffill(spark):
    pdf, e = _frames(spark)
    ps_sorted = pdf.sort_values(T)
    exp = ps_sorted.assign(**{V: ps_sorted[V].ffill()})
    got = e.sort_values(T).ffill(subset=[V])
    assert _canon(got) == _canon(exp)


def test_value_counts(spark):
    pdf, e = _frames(spark)
    exp = (
        pdf.value_counts([G, K], sort=False, dropna=True)
        .rename("count")
        .reset_index()
    )
    got = e.value_counts([G, K], sort=False)
    assert _canon(got) == _canon(exp)


def test_quoting_stressors_still_work(spark):
    """dots, spaces, unicode — the qi() quoter's territory, swept
    through sort+dedup+filter+select. Raw-backtick NAMES are a known
    engine limitation on the Column-building paths (pyspark's F.col
    attribute parser rejects them; the SQL-text paths quote via qi —
    r7 advisor fix — and pd.col() quotes since r9); declared in
    COVERAGE.md rather than swept through every internal F.col call."""
    g, k, v, t, ts = "with.dot", "UP per", "ζκ", "__key__", "a b"
    pdf, e = _frames(spark, g=g, k=k, v=v, t=t, ts=ts)
    exp = pdf.sort_values([t]).drop_duplicates(subset=[g], keep="first")
    got = e.sort_values([t]).drop_duplicates(subset=[g], keep="first")
    assert _canon(got) == _canon(exp)
    exp2 = pdf[pdf[v] > 0][[g, v]]
    got2 = e.filter(col(v) > 0).select([g, v])
    assert _canon(got2) == _canon(exp2)
    # pd.col on a LITERAL dotted label (r10, r9 ADVICE): Spark parses
    # an unquoted dotted F.col as a struct path and raises
    # UNRESOLVED_COLUMN — pd.col must quote it like the internal
    # _fcol paths do
    exp3 = pdf[pdf[g].notna()][[g]]
    got3 = e.filter(col(g).notna()).select([g])
    assert _canon(got3) == _canon(exp3)


def test_backtick_names_across_operators(spark):
    """Raw-BACKTICK column names (r10, closes the COVERAGE.md batch-40
    KNOWN LIMIT): pyspark's F.col attribute parser rejects a literal
    backtick, so every internal Column-building path must quote it.
    The engine routes F.col through pandas_spark.fshim, which quotes
    backtick-containing names once, at the bottom."""
    g, k, v, t, ts = "a`b", "x``", "`lead", "t`", "s` p"
    pdf, e = _frames(spark, g=g, k=k, v=v, t=t, ts=ts)

    # select / filter / sort / dedup
    exp = pdf[pdf[v].notna()].sort_values([t]).drop_duplicates(subset=[g], keep="first")[[g, v, t]]
    got = (
        e.filter(col(v).notna())
        .sort_values([t])
        .drop_duplicates(subset=[g], keep="first")
        .select([g, v, t])
    )
    assert _canon(got) == _canon(exp)

    # groupby agg
    exp2 = pdf.groupby(g, dropna=True).agg(s=(v, "sum"), n=(v, "count")).reset_index()
    got2 = e.groupby(g).agg(s=(v, "sum"), n=(v, "count"))
    assert _canon(got2) == _canon(exp2)

    # groupby transform window (cumsum) + shift
    exp3 = pdf.sort_values(t).assign(
        cs=pdf.sort_values(t).groupby(g, dropna=True)[v].cumsum(),
        lag=pdf.sort_values(t).groupby(g, dropna=True)[v].shift(1),
    )[[g, t, "cs", "lag"]]
    got3 = (
        e.sort_values(t)
        .groupby(g)
        .cumsum(v, alias="cs")
        .groupby(g)
        .shift(v, 1, alias="lag")
        .select([g, t, "cs", "lag"])
    )
    assert _canon(got3) == _canon(exp3)

    # merge on the backticked key
    right = pdf[[g, k]].dropna(subset=[g]).drop_duplicates(subset=[g])
    r_e = ps.from_pandas(spark, right.rename(columns={k: "r`val"}))
    exp4 = pdf.merge(right.rename(columns={k: "r`val"}), on=g, how="inner")[[g, v, "r`val"]]
    got4 = e.merge(r_e, on=g, how="inner").select([g, v, "r`val"])
    assert _canon(got4) == _canon(exp4)

    # rolling over the backticked value column
    exp5 = pdf.sort_values(t).assign(m=pdf.sort_values(t)[v].rolling(3, min_periods=1).mean())[[t, "m"]]
    got5 = e.sort_values(t).rolling(3, min_periods=1).mean(v, alias="m").select([t, "m"])
    assert _canon(got5) == _canon(exp5)
