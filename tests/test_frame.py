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


def test_groupby_nlargest_keep_all_boundary_ties(spark):
    """keep='all' must keep rows tied with the boundary value — rank
    over the VALUE only (tie-breaker exprs would degenerate rank into
    row_number and silently drop the tied rows)."""
    sdf = spark.createDataFrame(
        [Row(g="a", i=1, v=5.0), Row(g="a", i=2, v=5.0), Row(g="a", i=3, v=3.0),
         Row(g="a", i=4, v=1.0), Row(g="b", i=5, v=2.0), Row(g="b", i=6, v=2.0)]
    )
    gb = DataFrame(sdf).groupby("g")
    out = gb.nlargest("v", n=1, keep="all").to_pandas()
    assert sorted(out["i"]) == [1, 2, 5, 6]  # all boundary ties kept
    first = gb.nlargest("v", n=1, keep="first").to_pandas()
    assert len(first) == 2  # exactly one row per group


def test_groupby_nsmallest_excludes_nulls(spark):
    """pandas selectn.py: NULLs are excluded from the value RANKING
    (Spark asc() would otherwise put them FIRST, ahead of real smallest
    values) but PAD each group's result in forward row order when the
    group has fewer than n non-null values — group b here has one
    non-null, so pandas returns [6, 4] for n=2 (differentially
    verified: pdf.groupby('g')['v'].nsmallest(2) keeps index 4)."""
    sdf = spark.createDataFrame(
        [Row(g="a", i=1, v=None), Row(g="a", i=2, v=7.0), Row(g="a", i=3, v=9.0),
         Row(g="b", i=4, v=None), Row(g="b", i=5, v=None), Row(g="b", i=6, v=4.0)]
    )
    gb = DataFrame(sdf).groupby("g")
    small = gb.nsmallest("v", n=2).to_pandas()
    # group a: [7.0, 9.0] (no pad); group b: [4.0] + first NULL row (i=4)
    assert sorted(small["i"]) == [2, 3, 4, 6]
    assert sorted(small[~small["v"].isna()]["i"]) == [2, 3, 6]
    large = gb.nlargest("v", n=2).to_pandas()
    assert sorted(large["i"]) == [2, 3, 4, 6]
    # ranked slots are never occupied by NULL: n=1 → no padding anywhere
    one = gb.nsmallest("v", n=1).to_pandas()
    assert sorted(one["i"]) == [2, 6] and not one["v"].isna().any()


def test_interpolate_pad_honors_on(spark):
    """pad must fill in on= order like every other method, not the
    frame's declared row order."""
    # declared order (no sort) differs from ts order
    sdf = spark.createDataFrame(
        [Row(rid=1, ts=30, v=None), Row(rid=2, ts=10, v=1.0),
         Row(rid=3, ts=20, v=None), Row(rid=4, ts=40, v=4.0)]
    )
    out = (
        DataFrame(sdf).interpolate(subset=["v"], method="pad", on="ts")
        .to_pandas().set_index("rid")["v"]
    )
    # in ts order: 10→1.0, 20→pad 1.0, 30→pad 1.0, 40→4.0
    assert out[2] == 1.0 and out[3] == 1.0 and out[1] == 1.0 and out[4] == 4.0
    byg = spark.createDataFrame(
        [Row(g="x", rid=1, ts=30, v=None), Row(g="x", rid=2, ts=10, v=2.0),
         Row(g="x", rid=3, ts=20, v=None)]
    )
    outg = (
        DataFrame(byg).interpolate(subset=["v"], method="pad", on="ts", by=["g"])
        .to_pandas().set_index("rid")["v"]
    )
    assert outg[1] == 2.0 and outg[3] == 2.0


def test_explode_multi_null_asymmetry(spark):
    """NULL matches only NULL (pandas mylen(NaN) = -1): a NULL in the
    FIRST column vs an array in the second must raise exactly like the
    reverse; all-NULL rows survive as one all-null row."""
    import pandas as pd
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    ok = spark.createDataFrame(
        pd.DataFrame({"a": [[1, 2], None], "b": [[10, 20], None], "k": [1, 2]})
    )
    out = DataFrame(ok).explode(["a", "b"]).to_pandas()
    assert len(out) == 3  # 2 zipped + 1 null row
    bad_first = spark.createDataFrame(
        pd.DataFrame({"a": [None], "b": [[10, 20]], "k": [1]})
    )
    with pytest.raises(SparkRuntimeException):
        DataFrame(bad_first).explode(["a", "b"]).to_spark().collect()
    bad_second = spark.createDataFrame(
        pd.DataFrame({"a": [[1, 2]], "b": [None], "k": [1]})
    )
    with pytest.raises(SparkRuntimeException):
        DataFrame(bad_second).explode(["a", "b"]).to_spark().collect()


def test_dedup_fast_path_skips_nested_unorderable(spark):
    """array<map> / struct-with-map columns must stay out of the min_by
    ordering struct (AnalysisException on unorderable comparison) —
    nested maps pass a naive dtype-prefix test."""
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame(
        [Row(k=1, s=2), Row(k=1, s=1), Row(k=2, s=3)]
    ).withColumn("am", F.array(F.create_map(F.lit("x"), F.col("s")))) \
     .withColumn("st", F.struct(F.create_map(F.lit("y"), F.col("s")).alias("m")))
    out = (
        DataFrame(sdf).sort_values("s").drop_duplicates(subset=["k"])
        .to_pandas().set_index("k")
    )
    assert out.loc[1, "s"] == 1 and out.loc[2, "s"] == 3
    gout = (
        DataFrame(sdf).groupby("k").first(order_by="s").to_pandas()
    )
    assert sorted(gout["s"]) == [1, 3]


def test_groupby_sample_rng_exact_counts(spark):
    """RNG path: exact min(n, group_size) per group (n=) and exact
    round(frac·group_size) per group (frac=) — no driver collect of the
    key set."""
    rows = [Row(g=f"g{i % 7}", i=i) for i in range(140)]
    gb = DataFrame(spark.createDataFrame(rows)).groupby("g")
    out_n = gb.sample(n=3, seed=42).to_pandas()
    assert out_n.groupby("g").size().tolist() == [3] * 7
    out_small = DataFrame(
        spark.createDataFrame([Row(g="a", i=1), Row(g="b", i=2), Row(g="b", i=3)])
    ).groupby("g").sample(n=5, seed=0).to_pandas()
    assert len(out_small) == 3  # min(n, size), never padded
    out_f = gb.sample(frac=0.25, seed=7).to_pandas()
    assert out_f.groupby("g").size().tolist() == [5] * 7  # round(20*0.25)


def test_frame_nlargest_null_nan_and_keep_last(spark):
    """pandas parity (selectn.py SelectNSeries.compute): NULL and
    double-NaN rows are excluded from the value RANKING but PAD the
    result in forward row order when fewer than n non-null values
    exist; keep='last' prefers the last occurrence among value ties.
    Differential against pandas itself — the spec by construction."""
    import pandas as pd

    pdf = pd.DataFrame(
        {"i": [1, 2, 3, 4, 5, 6],
         "v": [5.0, float("nan"), 3.0, None, 5.0, 1.0]}
    )
    eng = DataFrame(spark.createDataFrame(pdf))
    # 4 non-null values + 1 NaN pad (the FIRST missing row, i=2)
    got = eng.nlargest(5, "v").to_pandas()
    exp = pdf.nlargest(5, "v")
    assert sorted(got["i"]) == sorted(exp["i"].tolist()) == [1, 2, 3, 5, 6]
    # n <= non-null count: no padding at all
    got3 = eng.nlargest(3, "v").to_pandas()
    exp3 = pdf.nlargest(3, "v")
    assert sorted(got3["i"]) == sorted(exp3["i"].tolist()) == [1, 3, 5]
    # keep='last': boundary tie (two 5.0s) resolved to the LAST row
    got_last = eng.nlargest(1, "v", keep="last").to_pandas()
    exp_last = pdf.nlargest(1, "v", keep="last")
    assert got_last["i"].tolist() == exp_last["i"].tolist() == [5]
    got_first = eng.nlargest(1, "v", keep="first").to_pandas()
    assert got_first["i"].tolist() == [1]
    # nsmallest symmetric: missing rows never occupy RANKED slots even
    # though Spark asc() sorts NULL first, but do pad at the end
    got_small = eng.nsmallest(5, "v").to_pandas()
    exp_small = pdf.nsmallest(5, "v")
    assert sorted(got_small["i"]) == sorted(exp_small["i"].tolist()) == [1, 2, 3, 5, 6]
    assert got_small[~got_small["v"].isna()]["i"].tolist()[:1] == [6]


def test_frame_nlargest_keep_all_two_phase_threshold(spark):
    """keep='all': boundary ties kept via the literal-threshold filter
    (map-only phase-2 plan — no whole-frame single-partition window).
    Covers: ties AT the boundary, all-rows-tied, < n rows total, and
    multi-column lexicographic thresholds."""
    sdf = spark.createDataFrame(
        [Row(i=1, a=3, b=1), Row(i=2, a=3, b=2), Row(i=3, a=3, b=2),
         Row(i=4, a=2, b=9), Row(i=5, a=1, b=0)]
    )
    eng = DataFrame(sdf)
    out = eng.nlargest(2, ["a", "b"], keep="all").to_pandas()
    # boundary tuple is (3,2) at rank 2 — rows 2,3 tie; row 1 (3,1) is rank 3
    assert sorted(out["i"]) == [2, 3]
    out2 = eng.nlargest(3, ["a", "b"], keep="all").to_pandas()
    assert sorted(out2["i"]) == [1, 2, 3]
    # all tied
    tied = DataFrame(spark.createDataFrame([Row(i=k, v=7) for k in range(4)]))
    assert len(tied.nlargest(1, "v", keep="all").to_pandas()) == 4
    # fewer rows than n
    assert len(eng.nlargest(99, "a", keep="all").to_pandas()) == 5
    # pandas findex rule: non-null rows run out before n → ALL missing
    # rows are appended (pdf.nlargest(2, 'v', keep='all') returns 3 rows)
    import pandas as pd

    pdf = pd.DataFrame({"i": [1, 2, 3], "v": [9.0, None, float("nan")]})
    got = DataFrame(spark.createDataFrame(pdf)).nlargest(2, "v", keep="all").to_pandas()
    exp = pdf.nlargest(2, "v", keep="all")
    assert len(got) == len(exp) == 3
    # plan shape: returned plan is a filter, not a single-partition window
    from pandas_spark.operators.diagnostics import plan_report
    r = plan_report(eng.nlargest(2, ["a", "b"], keep="all"))
    assert r["single_partition_exchanges"] == 0


def test_groupby_nlargest_nan_and_keep_last(spark):
    """Spark double-NaN is NOT NULL and sorts above every value — the
    group top-n must exclude it like pandas; keep='last' supported."""
    sdf = spark.createDataFrame(
        [Row(g="a", i=1, v=2.0), Row(g="a", i=2, v=float("nan")),
         Row(g="a", i=3, v=9.0), Row(g="b", i=4, v=1.0), Row(g="b", i=5, v=1.0)]
    )
    gb = DataFrame(sdf).groupby("g")
    out = gb.nlargest("v", n=1).to_pandas()
    assert sorted(out["i"]) == [3, 4]  # NaN row 2 never surfaces
    last = gb.nlargest("v", n=1, keep="last").to_pandas()
    assert sorted(last["i"]) == [3, 5]  # tie in group b → last row


def test_groupby_sample_frac_bankers_rounding(spark):
    """frac cap uses HALF_EVEN (pandas round(frac*len)): 5 rows at
    frac=0.5 → round(2.5) = 2 rows, not HALF_UP's 3."""
    rows = [Row(g="a", i=i) for i in range(5)]
    out = DataFrame(spark.createDataFrame(rows)).groupby("g").sample(
        frac=0.5, seed=1
    ).to_pandas()
    assert len(out) == 2 == round(0.5 * 5)


def test_groupby_transforms_null_keys_dropna(spark):
    """dropna=True (pandas default): NULL-key rows stay in transform
    output with NULL results (cum*/shift/rank/ngroup/cumcount), and are
    EXCLUDED from row-subset ops (head/nlargest/sample) — verified
    against pandas 2.2 behavior."""
    sdf = spark.createDataFrame(
        [Row(g="a", t=0, v=1.0), Row(g=None, t=1, v=2.0),
         Row(g="a", t=2, v=3.0), Row(g=None, t=3, v=4.0)]
    )
    gb = DataFrame(sdf).groupby("g")
    cs = gb.cumsum("v", alias="cs", order_by="t").to_pandas().sort_values("t")
    assert cs["cs"].tolist()[0] == 1.0 and cs["cs"].tolist()[2] == 4.0
    assert cs["cs"].isna().tolist() == [False, True, False, True]
    sh = gb.shift("v", periods=1, alias="sh", order_by="t").to_pandas().sort_values("t")
    assert sh["sh"].isna().tolist() == [True, True, False, True]
    ng = gb.ngroup().to_pandas().sort_values("t")
    assert ng["ngroup"].tolist()[0] == 0  # numbering unshifted by NULL group
    assert ng["ngroup"].isna().tolist() == [False, True, False, True]
    rk = gb.rank("v", alias="rk").to_pandas().sort_values("t")
    assert rk["rk"].isna().tolist() == [False, True, False, True]
    hd = gb.head(1, order_by="t").to_pandas()
    assert hd["t"].tolist() == [0]  # NULL-key rows excluded entirely
    top = gb.nlargest("v", n=1).to_pandas()
    assert top["t"].tolist() == [2]
    # dropna=False keeps the NULL group as a real group
    cs2 = DataFrame(sdf).groupby("g", dropna=False).cumsum(
        "v", alias="cs", order_by="t"
    ).to_pandas().sort_values("t")
    assert cs2["cs"].tolist() == [1.0, 2.0, 4.0, 6.0]


def test_merge_user_column_named_like_internal_tag(spark):
    """A user column literally named '__rk_<key>' / '__lp__' must not
    collide with merge's internal tag names (review-found r8: the
    plain-name selectExpr projection raised AMBIGUOUS_REFERENCE where
    the old qualified refs resolved)."""
    import pandas as pd

    left = ps.from_pandas(spark, pd.DataFrame({
        "b": [1, 2, 3], "__rk_b": ["a", "b", "c"], "__lp__": [7, 8, 9],
    }))
    right = ps.from_pandas(spark, pd.DataFrame({
        "b": [2, 3, 4], "v": [20.0, 30.0, 40.0],
    }))
    for how in ("inner", "left", "outer", "right"):
        got = left.merge(right, on="b", how=how).to_pandas()
        assert "__rk_b" in got.columns and "__lp__" in got.columns
        inner_rows = got.dropna(subset=["v"]) if how != "inner" else got
        assert set(inner_rows["b"]) >= {2, 3}
    ind = left.merge(right, on="b", how="outer", indicator=True).to_pandas()
    assert set(ind["_merge"]) == {"left_only", "both", "right_only"}


def test_drop_duplicates_packed_spec_reduce_matches_pandas(spark, tmp_path):
    """r11: when every output column is a group key or an INTEGRAL
    footer-proven sort key, keep=first/last dedup collapses to ONE
    HashAggregate over a packed bigint (frame._dedup_spec_reduce) —
    values must match pandas exactly, including on duplicate sort
    keys (ties are output-identical by construction)."""
    import pandas as pd
    import numpy as np

    rng = np.random.default_rng(19)
    pdf = pd.DataFrame(
        {
            "g": rng.integers(0, 40, 4000),
            "a": rng.integers(-500, 500, 4000),
            "b": rng.integers(0, 7, 4000),
        }
    )
    p = tmp_path / "t.parquet"
    pdf.to_parquet(p, index=False)
    f = ps.read_parquet(spark, str(p))
    assert "a" in f._bounds and isinstance(f._bounds["a"][0], int)
    for keep in ["first", "last"]:
        fs = f.sort_values(["a", "b"])
        out = fs.drop_duplicates(subset=["g"], keep=keep)
        plan = out.spark._jdf.queryExecution().executedPlan().toString()
        assert "SortAggregate" not in plan, "packed path not taken"
        got = (
            out.to_pandas().sort_values("g").reset_index(drop=True)
        )
        exp = (
            pdf.sort_values(["a", "b"], kind="stable")
            .drop_duplicates(subset=["g"], keep=keep)
            .sort_values("g")
            .reset_index(drop=True)
        )
        assert got[["g", "a", "b"]].values.tolist() == exp[["g", "a", "b"]].values.tolist(), keep


def test_drop_duplicates_spec_reduce_falls_back_cleanly(spark, tmp_path):
    """A double sort key whose proven range spans 0 → struct path
    (a range through 0 reaches subnormal gaps no 38-digit decimal
    grid can separate, so the packed path declines), with identical
    results."""
    import pandas as pd
    import numpy as np

    rng = np.random.default_rng(20)
    pdf = pd.DataFrame(
        {
            "g": rng.integers(0, 30, 2000),
            "a": rng.integers(0, 100, 2000),
            "v": rng.normal(size=2000).round(4),
        }
    )
    p = tmp_path / "t2.parquet"
    pdf.to_parquet(p, index=False)
    f = ps.read_parquet(spark, str(p))
    # 'v' (double) rides in the sort → packed path must decline
    out = f.sort_values(["a", "v"]).drop_duplicates(subset=["g"], keep="first")
    got = out.to_pandas().sort_values("g").reset_index(drop=True)
    exp = (
        pdf.sort_values(["a", "v"], kind="stable")
        .drop_duplicates(subset=["g"], keep="first")
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert got[["g", "a", "v"]].values.tolist() == exp[["g", "a", "v"]].values.tolist()


def test_drop_duplicates_double_key_struct_path_exact(spark, tmp_path):
    """Double sort keys keep the struct min_by path (the exact
    decimal(38,0) packing was prototyped and measured SLOWER — the
    per-row double->decimal cast string-parses; receipt in
    frame._dedup_spec_reduce) — results bit-exact vs pandas,
    including ulp-adjacent values and NaN (NaN-last ordering)."""
    import math
    import random

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    random.seed(11)
    vals = [1.0, 2.0, 32.0, 50.0]
    for base in [1.0, 2.0, 31.999999999999996, 49.99999999999999]:
        vals.append(math.nextafter(base, 100.0))
    vals += [1.0 + random.random() * 60 for _ in range(40)]
    g = np.array([random.randrange(0, 50) for _ in range(4000)])
    ok = np.array([random.randrange(0, 3000) for _ in range(4000)])
    q = np.array([random.choice(vals) for _ in range(4000)])
    q[::13] = np.nan  # NaN stays a VALUE under the pyarrow writer
    pq.write_table(
        pa.table({"g": pa.array(g), "ok": pa.array(ok), "q": pa.array(q)}),
        tmp_path / "d.parquet",
    )
    pdf = pd.DataFrame({"g": g, "ok": ok, "q": q})
    f = ps.read_parquet(spark, str(tmp_path / "d.parquet"))
    for keep in ["first", "last"]:
        out = f.sort_values(["ok", "q"]).drop_duplicates(
            subset=["g"], keep=keep
        )
        got = out.to_pandas().sort_values("g").reset_index(drop=True)
        exp = (
            pdf.sort_values(["ok", "q"], kind="stable")
            .drop_duplicates(subset=["g"], keep=keep)
            .sort_values("g")
            .reset_index(drop=True)
        )
        assert got["g"].tolist() == exp["g"].tolist(), keep
        assert got["ok"].tolist() == exp["ok"].tolist(), keep
        for gv, ev in zip(got["q"], exp["q"]):
            assert (math.isnan(gv) and math.isnan(ev)) or gv.hex() == ev.hex(), keep
