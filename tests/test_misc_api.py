"""API-surface tests for operators whose effect isn't oracle-visible
(column position, label filtering, driver-side IO, scale warnings)."""

from __future__ import annotations

import warnings

import pytest

import pandas_spark as ps
from pandas_spark.frame import DataFrame


@pytest.fixture(scope="module")
def frame(spark):
    return ps.read_parquet(spark, "/root/testdata/sf0.001/customer.parquet")


def test_insert_positional(frame):
    out = frame.insert(1, "flag", ps.col("c_custkey") % 2 == 0)
    assert out.columns[1] == "flag"
    assert out.columns[0] == "c_custkey"
    assert len(out.columns) == len(frame.columns) + 1


def test_insert_existing_raises(frame):
    with pytest.raises(ValueError):
        frame.insert(0, "c_custkey", ps.col("c_custkey"))


def test_filter_labels_like_regex_items(frame):
    assert frame.filter_labels(like="name").columns == ["c_name"]
    assert frame.filter_labels(regex="key$").columns == ["c_custkey", "c_nationkey"]
    assert frame.filter_labels(items=["c_acctbal", "nope"]).columns == ["c_acctbal"]
    with pytest.raises(ValueError):
        frame.filter_labels(like="a", regex="b")


def test_feather_roundtrip(tmp_path, spark, frame):
    from pandas_spark.sources.io import read_feather, to_feather

    path = str(tmp_path / "c.feather")
    small = frame.select(["c_custkey", "c_name", "c_acctbal"])
    to_feather(small, path)
    back = read_feather(spark, path)
    assert back.spark.count() == small.spark.count()
    assert set(back.columns) == {"c_custkey", "c_name", "c_acctbal"}


def test_unkeyed_window_warns_once(frame):
    import pandas_spark.frame as fr

    fr._warned_unkeyed.discard("take")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        frame.take([0, 1]).spark.collect()
        frame.take([0])  # second call: no new warning
    msgs = [x for x in w if "single ordered partition" in str(x.message)]
    assert len(msgs) == 1


def test_salted_join_outer_raises(frame):
    from pandas_spark.operators.joins import salted_join

    with pytest.raises(ValueError):
        salted_join(frame, frame, "c_custkey", how="outer")


def test_rsplit_and_rfind_edges(spark):
    pdf_rows = [("a-b-c",), ("nodash",), (None,)]
    f = DataFrame(spark.createDataFrame(pdf_rows, ["s"]))
    out = f.assign(
        r=ps.col("s").str.rsplit("-", n=1),
        i=ps.col("s").str.rfind("-"),
        p=ps.col("s").str.rpartition("-"),
    ).spark.collect()
    by_s = {r["s"]: r for r in out}
    assert by_s["a-b-c"]["r"] == ["a-b", "c"]
    assert by_s["a-b-c"]["i"] == 3
    assert by_s["a-b-c"]["p"].asDict() == {"head": "a-b", "sep": "-", "tail": "c"}
    assert by_s["nodash"]["r"] == ["nodash"]
    assert by_s["nodash"]["i"] == -1
    assert by_s["nodash"]["p"].asDict() == {"head": "", "sep": "", "tail": "nodash"}


def test_asof_last_row_at_or_before(spark):
    rows = [(1, 10.0), (3, 30.0), (5, None), (7, 70.0)]
    f = DataFrame(spark.createDataFrame(rows, ["t", "v"]))
    assert f.asof(4, on="t").spark.collect()[0]["t"] == 3
    # null-v row at t=5 is skipped when subset is given
    assert f.asof(6, on="t", subset="v").spark.collect()[0]["t"] == 3
    assert f.asof(6, on="t").spark.collect()[0]["t"] == 5
    assert f.asof(0, on="t").spark.count() == 0


def test_quantile_approx_close_to_exact(spark):
    import pandas_spark as psm

    li = psm.read_parquet(spark, "/root/testdata/sf0.001/lineitem.parquet")
    g = li[["l_returnflag", "l_quantity"]].groupby("l_returnflag")
    exact = {r["l_returnflag"]: r["l_quantity"] for r in g.quantile(0.5).spark.collect()}
    approx = {
        r["l_returnflag"]: r["l_quantity"]
        for r in g.quantile(0.5, approx=True).spark.collect()
    }
    for k, v in exact.items():
        assert abs(approx[k] - v) <= 1.0  # quantities are 1..50; sketch is near-exact here


def test_empty_input_schema_stability(spark):
    """Operators must return stable schemas (and not throw) on empty
    input — the behavior a driver hits when a filter eliminates every
    row upstream."""
    import pandas_spark as psm
    from pandas_spark import col
    from pandas_spark.window import Rolling

    li = psm.read_parquet(spark, "/root/testdata/sf0.001/lineitem.parquet")
    empty = li.filter(col("l_quantity") < -1)  # no rows

    g = empty.groupby("l_returnflag").agg(s=("l_quantity", "sum"))
    assert g.spark.count() == 0
    assert g.spark.columns == ["l_returnflag", "s"]

    d = empty.sort_values(["l_orderkey", "l_linenumber"]).drop_duplicates(
        subset=["l_suppkey"], keep="first"
    )
    assert d.spark.count() == 0

    r = Rolling(empty, 5, on="l_orderkey", by=["l_suppkey"]).mean("l_quantity", alias="m")
    assert r.spark.count() == 0

    vc = empty[["l_returnflag"]].value_counts()
    assert vc.spark.count() == 0

    m = psm.merge(empty, empty.rename(columns={"l_quantity": "q2"}),
                  on="l_orderkey", how="inner")
    assert m.spark.count() == 0

    ss = empty.searchsorted("l_quantity", [5.0])
    rows = ss.spark.collect()
    assert rows[0]["insert_at"] == 0
