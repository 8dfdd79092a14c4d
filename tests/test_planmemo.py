"""Focused tests for the r11 plan-build memo (_planmemo.py) and the
buffer-pool InMemoryRelation re-anchor (sources/io.py).

Both are metadata caches: they memoize CONSTRUCTED Dataset objects
(plans), never rows or results — every action still computes from the
parquet/cache inputs. These tests pin the correctness properties the
memo's key design relies on.
"""
from __future__ import annotations

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas_spark as ps
from pandas_spark import fshim as F
from pandas_spark._planmemo import plan_memo, _memo


def test_plan_memo_hit_returns_same_dataset(spark):
    sdf = spark.range(5).withColumnRenamed("id", "v")
    a = plan_memo(sdf, "filter", None, (F.col("v") > 2,),
                  lambda: sdf.filter(F.col("v") > 2))
    b = plan_memo(sdf, "filter", None, (F.col("v") > 2,),
                  lambda: sdf.filter(F.col("v") > 2))
    assert b is a  # hit: the constructed Dataset object is reused
    assert sorted(r.v for r in b.collect()) == [3, 4]


def test_plan_memo_distinguishes_literals_and_types(spark):
    """Normalized-node equality must separate literals by VALUE and by
    TYPE (a string '1' is not an int 1), and different parent objects
    never share an entry."""
    sdf = spark.range(5).withColumnRenamed("id", "v")
    a = plan_memo(sdf, "filter", None, (F.col("v") > 2,),
                  lambda: sdf.filter(F.col("v") > 2))
    b = plan_memo(sdf, "filter", None, (F.col("v") > 3,),
                  lambda: sdf.filter(F.col("v") > 3))
    assert b is not a
    assert sorted(r.v for r in b.collect()) == [4]
    c = plan_memo(sdf, "filter", None, (F.col("v").cast("string") == "3",),
                  lambda: sdf.filter(F.col("v").cast("string") == "3"))
    d = plan_memo(sdf, "filter", None, (F.col("v").cast("string") == "4",),
                  lambda: sdf.filter(F.col("v").cast("string") == "4"))
    assert c is not d
    # a distinct parent (same logical content, different object) misses
    sdf2 = spark.range(5).withColumnRenamed("id", "v")
    e = plan_memo(sdf2, "filter", None, (F.col("v") > 2,),
                  lambda: sdf2.filter(F.col("v") > 2))
    assert e is not a


def test_plan_memo_static_key_and_op_separate(spark):
    sdf = spark.range(3).withColumnRenamed("id", "v")
    a = plan_memo(sdf, "selectExpr", ("v",), None, lambda: sdf.selectExpr("v"))
    b = plan_memo(sdf, "selectExpr", ("v + 1 AS v",), None,
                  lambda: sdf.selectExpr("v + 1 AS v"))
    assert a is not b
    assert [r.v for r in b.orderBy("v").collect()] == [1, 2, 3]


def test_plan_memo_epoch_invalidates_on_ansi_flip(spark):
    """Eager analysis bakes ANSI coercion into the constructed plan, so
    the memo key includes the conf — a flip must never replay a plan
    analyzed under the other mode."""
    sdf = spark.range(3).withColumnRenamed("id", "v")
    a = plan_memo(sdf, "filter", None, (F.col("v") > 0,),
                  lambda: sdf.filter(F.col("v") > 0))
    old = spark.conf.get("spark.sql.ansi.enabled", "false")
    try:
        spark.conf.set("spark.sql.ansi.enabled",
                       "false" if old == "true" else "true")
        b = plan_memo(sdf, "filter", None, (F.col("v") > 0,),
                      lambda: sdf.filter(F.col("v") > 0))
        assert b is not a  # epoch changed: fresh build, no stale replay
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def test_plan_memo_results_identical_when_disabled(spark, tmp_path):
    """The memo is a pure construction cache: a query built twice with
    the memo on returns the same rows as with the memo off."""
    import pandas_spark._planmemo as pm

    path = str(tmp_path / "t.parquet")
    pd.DataFrame({"k": [2, 1, 2, 3], "v": [1.0, 2.0, 3.0, 4.0]}).to_parquet(path)

    def run():
        f = ps.read_parquet(spark, path)
        out = (f.filter(ps.col("v") > 1.0)
                .groupby("k").agg({"v": "sum"})
                .sort_values("k"))
        return out.to_pandas()

    on1, on2 = run(), run()  # second build rides memo hits
    was = pm._DISABLED
    pm._DISABLED = True
    try:
        off = run()
    finally:
        pm._DISABLED = was
    pd.testing.assert_frame_equal(on1, off)
    pd.testing.assert_frame_equal(on2, off)


def test_plan_memo_dead_parent_never_stale_hits(spark):
    """Entries are weakref-guarded: if a parent is collected and a new
    object reuses its id, the `ref() is parent` check must reject the
    entry instead of replaying a plan over the wrong source."""
    import weakref

    sdf = spark.range(4).withColumnRenamed("id", "v")
    a = plan_memo(sdf, "filter", None, (F.col("v") > 1,),
                  lambda: sdf.filter(F.col("v") > 1))
    key = next(k for k, (refs, _, out) in _memo["m"].items() if out is a)
    refs, nodes, out = _memo["m"][key]
    # simulate id reuse: a dead weakref under the same key
    class _Dummy:
        pass

    _memo["m"][key] = (tuple(weakref.ref(_Dummy()) for _ in refs), nodes, out)
    b = plan_memo(sdf, "filter", None, (F.col("v") > 1,),
                  lambda: sdf.filter(F.col("v") > 1))
    assert b is not a  # stale entry rejected, fresh build
    assert sorted(r.v for r in b.collect()) == [2, 3]


def test_pool_reanchor_leaf_preserves_rows_and_unpersists(spark, tmp_path):
    """A pooled (persisted) table is re-anchored on its
    InMemoryRelation leaf: rows and order stay bit-identical to the
    file, the leaf plan still scans the cache, and clear_scan_cache
    unpersists THROUGH the original plan (the one CacheManager
    registered) so no cached entry leaks."""
    from pandas_spark.sources import io as psio

    path = str(tmp_path / "mid.parquet")
    n = 5000
    pdf = pd.DataFrame({"k": [(i * 2654435761) % n for i in range(n)],
                        "v": range(n)})
    pdf.to_parquet(path)
    psio.clear_scan_cache()
    jcm = spark._jsparkSession.sharedState().cacheManager()
    a = ps.read_parquet(spark, path).to_spark()
    a.write.format("noop").mode("overwrite").save()  # fill the pool
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        a._jdf.queryExecution(), "formatted")
    assert "InMemoryRelation" in plan or "InMemoryTableScan" in plan
    # re-anchored object carries the origin for eviction
    assert hasattr(a, "_pool_origin")
    got = [r.k for r in
           a.select(F.monotonically_increasing_id().alias("__i__"), "k")
            .orderBy("__i__").collect()]
    assert got == pdf["k"].tolist()
    # this table's registration is present, and clear_scan_cache removes
    # exactly it (other suites may hold unrelated cache entries, so
    # assert on THIS plan, not on cache emptiness)
    origin = getattr(a, "_pool_origin", a)
    assert jcm.lookupCachedData(origin._jdf).isDefined()
    psio.clear_scan_cache()
    assert not jcm.lookupCachedData(origin._jdf).isDefined()
