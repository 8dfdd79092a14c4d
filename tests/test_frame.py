"""Unit tests for the engine DataFrame surface not covered by the
oracle suite: semantics shims (division, null handling), dedup keeps,
merge options, expression accessors."""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import math

import pytest
from pyspark.sql import Row

import pandas_spark as ps
from pandas_spark import col
from pandas_spark.frame import DataFrame


@pytest.fixture(scope="module")
def small(spark):
    sdf = spark.createDataFrame(
        [
            Row(k="a", v=1, x=2.0),
            Row(k="a", v=2, x=None),
            Row(k="b", v=3, x=0.0),
            Row(k=None, v=4, x=4.0),
        ]
    )
    return DataFrame(sdf)


def test_truediv_by_zero_inf(spark):
    sdf = spark.createDataFrame([Row(a=1.0, b=0.0), Row(a=-1.0, b=0.0), Row(a=0.0, b=0.0), Row(a=6.0, b=2.0)])
    out = DataFrame(sdf).assign(q=col("a") / col("b")).to_spark().collect()
    vals = [r.q for r in out]
    assert vals[0] == float("inf")
    assert vals[1] == float("-inf")
    assert math.isnan(vals[2])
    assert vals[3] == 3.0


def test_floordiv_mod_python_semantics(spark):
    sdf = spark.createDataFrame([Row(a=-7, b=3), Row(a=7, b=-3)])
    out = DataFrame(sdf).assign(fd=col("a") // col("b"), md=col("a") % col("b")).to_spark().collect()
    assert out[0].fd == -7 // 3 and out[0].md == -7 % 3  # -3, 2
    assert out[1].fd == 7 // -3 and out[1].md == 7 % -3  # -3, -2


def test_groupby_dropna_default(small):
    out = small.groupby("k").agg(n=("v", "count")).to_pandas()
    assert set(out["k"]) == {"a", "b"}  # NULL key dropped (pandas default)
    out2 = small.groupby("k", dropna=False).agg(n=("v", "count")).to_pandas()
    assert len(out2) == 3


def test_merge_null_safe_keys(spark):
    l = DataFrame(spark.createDataFrame([Row(k="a", lv=1), Row(k=None, lv=2)]))
    r = DataFrame(spark.createDataFrame([Row(k="a", rv=10), Row(k=None, rv=20)]))
    out = l.merge(r, on="k", how="inner").to_pandas()
    # pandas matches NULL==NULL merge keys (merge.py:177)
    assert len(out) == 2
    assert set(out["rv"]) == {10, 20}


def test_merge_suffixes_and_indicator(spark):
    l = DataFrame(spark.createDataFrame([Row(k=1, v=1)]))
    r = DataFrame(spark.createDataFrame([Row(k=1, v=2), Row(k=2, v=3)]))
    out = l.merge(r, on="k", how="outer", indicator=True).to_pandas()
    assert "v_x" in out.columns and "v_y" in out.columns and "_merge" in out.columns
    assert set(out["_merge"]) == {"both", "right_only"}


def test_merge_validate_raises(spark):
    l = DataFrame(spark.createDataFrame([Row(k=1), Row(k=1)]))
    r = DataFrame(spark.createDataFrame([Row(k=1)]))
    with pytest.raises(ValueError, match="not unique"):
        l.merge(r, on="k", validate="1:1")


def test_drop_duplicates_keep_false(spark):
    sdf = spark.createDataFrame([Row(k=1), Row(k=1), Row(k=2)])
    out = DataFrame(sdf).drop_duplicates(subset=["k"], keep=False).to_pandas()
    assert list(out["k"]) == [2]


def test_dropna_fillna(small):
    assert small.dropna(subset=["x"]).count() == 3
    filled = small.fillna({"x": -1.0}).to_pandas()
    assert (filled["x"] == -1.0).sum() == 1


def test_isin_where(small):
    out = small.filter(col("k").isin(["a"])).count()
    assert out == 2


def test_str_accessor(spark):
    sdf = spark.createDataFrame([Row(s="Hello World"), Row(s="spark")])
    f = DataFrame(sdf)
    out = f.assign(
        up=col("s").str.upper(),
        has=col("s").str.contains("World", regex=False),
        ln=col("s").str.len(),
        sub=col("s").str.slice(0, 5),
    ).to_pandas()
    assert out["up"][0] == "HELLO WORLD"
    assert bool(out["has"][0]) and not bool(out["has"][1])
    assert out["ln"][1] == 5
    assert out["sub"][0] == "Hello"


def test_dt_accessor(spark):
    sdf = spark.sql("SELECT TIMESTAMP '2024-03-15 13:45:30' AS ts")
    out = DataFrame(sdf).assign(
        y=col("ts").dt.year,
        dow=col("ts").dt.weekday,
        mstart=col("ts").dt.is_month_start,
        fl=col("ts").dt.floor("D"),
    ).to_pandas()
    assert out["y"][0] == 2024
    assert out["dow"][0] == 4  # Friday (Mon=0)
    assert not out["mstart"][0]
    assert str(out["fl"][0]) == "2024-03-15 00:00:00"


def test_query_translator_scope():
    from pandas_spark.computation.eval import translate_query

    sql = translate_query("a > @x and b in ['u', 'v']", {"x": 5})
    assert "5" in sql and "IN" in sql and "AND" in sql


def test_concat_inner_outer(spark):
    a = DataFrame(spark.createDataFrame([Row(x=1, y=2)]))
    b = DataFrame(spark.createDataFrame([Row(x=3, z=4)]))
    outer = ps.concat([a, b]).to_pandas()
    assert set(outer.columns) == {"x", "y", "z"} and len(outer) == 2
    inner = ps.concat([a, b], join="inner").to_pandas()
    assert list(inner.columns) == ["x"]


def test_nlargest_keep_all(spark):
    sdf = spark.createDataFrame([Row(v=3), Row(v=3), Row(v=2), Row(v=1)])
    out = DataFrame(sdf).nlargest(1, "v", keep="all").to_pandas()
    assert len(out) == 2  # ties kept


def test_value_counts_normalize(small):
    out = small.value_counts("k", normalize=True).to_pandas()
    assert abs(out["proportion"].sum() - 1.0) < 1e-9


def test_groupby_rank_average(spark):
    sdf = spark.createDataFrame([Row(g=1, v=10), Row(g=1, v=10), Row(g=1, v=20)])
    out = (
        DataFrame(sdf).groupby("g").rank("v", method="average", alias="r").to_pandas()
    )
    assert sorted(out["r"]) == [1.5, 1.5, 3.0]


def test_ewm_mean_matches_pandas(spark):
    import pandas as pd

    pdf = pd.DataFrame({"g": ["a"] * 5 + ["b"] * 5, "t": list(range(5)) * 2, "v": [1.0, 2, 3, 4, 5, 5, 4, 3, 2, 1]})
    sdf = DataFrame(spark.createDataFrame(pdf))
    from pandas_spark.window import ewm_mean

    out = ewm_mean(sdf, "v", alpha=0.5, by=["g"], order_by="t", alias="e").to_pandas()
    out = out.sort_values(["g", "t"]).reset_index(drop=True)
    expect = pdf.groupby("g")["v"].transform(lambda s: s.ewm(alpha=0.5).mean())
    assert (out["e"] - expect).abs().max() < 1e-12


def test_cumprod(spark):
    sdf = spark.createDataFrame([Row(g=1, t=1, v=2.0), Row(g=1, t=2, v=-3.0), Row(g=1, t=3, v=0.0), Row(g=1, t=4, v=4.0)])
    out = DataFrame(sdf).groupby("g").cumprod("v", alias="cp", order_by="t").to_pandas().sort_values("t")
    assert list(out["cp"]) == [2.0, -6.0, 0.0, 0.0]


def test_ops_on_empty_input(spark):
    """Operators must survive empty frames (filter-everything inputs)."""
    import pandas_spark as ps
    from pandas_spark import col
    from pandas_spark.operators import dedup, similarity
    from conftest import SF_DIR

    docs = ps.read_parquet(spark, f"{SF_DIR}/documents.parquet").filter(
        col("doc_id") < 0
    )
    assert dedup.exact_dedup(docs).to_spark().count() == 0
    assert dedup.minhash_dedup_pairs(docs).to_spark().count() == 0

    li = ps.read_parquet(spark, f"{SF_DIR}/lineitem.parquet").filter(
        col("l_orderkey") < 0
    )
    assert li.sort_values("l_orderkey").drop_duplicates(subset=["l_suppkey"]).to_spark().count() == 0
    assert li.groupby("l_returnflag").agg(n=("l_quantity", "size")).to_spark().count() == 0
    assert li.nlargest(5, "l_quantity").to_spark().count() == 0


def test_ewm_empty_and_single_row(spark):
    from pandas_spark.window import ewm_mean
    from pandas_spark import col
    from conftest import SF_DIR
    import pandas_spark as ps

    ev = ps.read_parquet(spark, f"{SF_DIR}/events.parquet").select(
        ["event_id", "user_id", "value"]
    )
    empty = ev.filter(col("event_id") < 0)
    assert ewm_mean(empty, "value", alpha=0.5, by=["user_id"], order_by="event_id").to_spark().count() == 0
    one = ev.limit(1)
    rows = ewm_mean(one, "value", alpha=0.5, by=["user_id"], order_by="event_id").to_spark().collect()
    assert len(rows) == 1 and abs(rows[0]["value_ewm"] - rows[0]["value"]) < 1e-9
