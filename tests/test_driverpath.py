"""Driver-side fast path: py4j handle caching, lit/col interning,
static-expression memoization (r11 optimization round).

These memoize PROTOCOL HANDLES and EXPRESSION HANDLES only — the tests
assert both the caching behavior (same handle back) and, more
importantly, that results computed through cached handles are correct.
"""

import pytest

from pandas_spark import get_spark
from pandas_spark import fshim as F
from pandas_spark._exprmemo import memo_column


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_driverpath")


def test_jvmview_class_resolution_cached(spark):
    jvm = spark.sparkContext._jvm
    a = getattr(jvm, "org.apache.spark.sql.functions")
    b = getattr(jvm, "org.apache.spark.sql.functions")
    assert a is b  # second access is an instance-dict hit
    # cached static-member handle still calls correctly
    assert "5" in a.lit(5).toString()


def test_lit_interning_same_handle_and_values(spark):
    assert F.lit(42) is F.lit(42)
    assert F.lit("x") is F.lit("x")
    # bool and int of equal value must NOT share a literal
    assert F.lit(True) is not F.lit(1)
    row = (
        spark.range(1)
        .select(
            F.lit(42).alias("i"),
            F.lit(True).alias("b"),
            F.lit("x").alias("s"),
            F.lit(None).alias("n"),
            F.lit(2.5).alias("f"),
        )
        .collect()[0]
    )
    assert (row.i, row.b, row.s, row.n, row.f) == (42, True, "x", None, 2.5)


def test_col_interning_reuse_across_frames(spark):
    c = F.col("v")
    assert F.col("v") is c
    df1 = spark.createDataFrame([(1,)], ["v"]).select(c)
    df2 = spark.createDataFrame([(7,)], ["v"]).select(c * 2)
    assert df1.collect()[0][0] == 1
    assert df2.collect()[0][0] == 14


def test_col_backtick_names_not_interned_and_still_work(spark):
    df = spark.createDataFrame([(3,)], ["a`b"])
    assert df.select(F.col("a`b")).collect()[0][0] == 3


def test_string_column_arg_cache_correct(spark):
    # _create_column_from_name cache: same string arg, different frames
    df1 = spark.createDataFrame([(1, 2)], ["x", "y"])
    df2 = spark.createDataFrame([(9, 8)], ["x", "y"])
    assert df1.select(F.sum("x")).collect()[0][0] == 1
    assert df2.select(F.sum("x")).collect()[0][0] == 9


def test_memo_column_keys_and_reuse(spark):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return F.col("v") + 1

    a = memo_column(("t_memo", 1), build)
    b = memo_column(("t_memo", 1), build)
    c = memo_column(("t_memo", 2), lambda: F.col("v") + 2)
    assert a is b and calls["n"] == 1
    df = spark.createDataFrame([(10,)], ["v"])
    assert df.select(a.alias("r")).collect()[0].r == 11
    assert df.select(c.alias("r")).collect()[0].r == 12
    # the same memoized HOF-free handle works in a second plan
    assert df.filter(a > 5).count() == 1


def test_memoized_hof_reused_twice_in_one_plan(spark):
    # lambda-variable-bearing expressions (transform) must stay correct
    # when the SAME memoized handle appears twice in one projection
    expr = memo_column(
        ("t_memo_hof",), lambda: F.transform(F.col("arr"), lambda x: x * 2)
    )
    df = spark.createDataFrame([([1, 2],)], ["arr"])
    row = df.select(expr.alias("a"), F.reverse(expr).alias("b")).collect()[0]
    assert row.a == [2, 4] and row.b == [4, 2]
