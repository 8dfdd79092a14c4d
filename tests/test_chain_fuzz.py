"""Property-based op-CHAIN differential fuzzing (SURVEY §5 / r5 verdict
item 5): hypothesis draws a small adversarial typed frame (NULLs, NaN≡
missing, ties, empty groups, unicode keys) and a random 2–4-op chain
(filter → assign → fillna/dropna → dedup → window → join → optional
terminal groupby-agg), runs it through BOTH pandas and the engine, and
compares canonicalized row multisets. The fixed 232 oracle entries
cannot see interaction edges (the frame-nlargest NULL case survived
five rounds); random chains can.

Determinism: ``derandomize=True`` — hypothesis derives examples from
the test body, so CI runs are reproducible with no ambient seed.

Missing-value boundary (engine data model): pandas NaN ≡ Spark NULL.
Frames are built from the same Python lists — pandas gets None (→NaN
in float cols), Spark gets None (→NULL) — and outputs are compared
with NaN/None unified.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import conftest  # noqa: E402,F401

import pandas_spark as ps  # noqa: E402
from pandas_spark import col  # noqa: E402
from pandas_spark.frame import DataFrame  # noqa: E402


# ---------------------------------------------------------------------------
# frame generation
# ---------------------------------------------------------------------------

G_VALS = ["a", "b", "ζ", None]
K_VALS = [0, 1, 2, 3, None]
V_VALS = [-1.5, 0.0, 2.5, 2.5, 7.25, None]  # ties + missing

rows_strategy = st.lists(
    st.tuples(st.sampled_from(G_VALS), st.sampled_from(K_VALS), st.sampled_from(V_VALS)),
    min_size=0,
    max_size=24,
)


def build_frames(spark, rows):
    """(pandas frame, engine frame) from the same row list; ``t`` is a
    unique tiebreak column so order-sensitive ops are deterministic;
    ``ts`` = epoch + t hours gives the time-op families a clock."""
    epoch = pd.Timestamp("2024-01-01")
    data = [
        (g, k, v, i, (epoch + pd.Timedelta(hours=i)).to_pydatetime())
        for i, (g, k, v) in enumerate(rows)
    ]
    pdf = pd.DataFrame(data, columns=["g", "k", "v", "t", "ts"]).astype(
        {"g": "object", "k": "float64", "v": "float64", "t": "int64",
         "ts": "datetime64[us]"}
    )
    sdf = spark.createDataFrame(
        data, schema="g string, k int, v double, t int, ts timestamp"
    )
    return pdf, DataFrame(sdf)


DIM_ROWS = [(0, 10.0), (1, 20.0), (3, 30.0), (None, 99.0)]


def dim_frames(spark):
    pdf2 = pd.DataFrame(DIM_ROWS, columns=["k", "u"]).astype(
        {"k": "float64", "u": "float64"}
    )
    sdf2 = spark.createDataFrame(DIM_ROWS, schema="k int, u double")
    return pdf2, DataFrame(sdf2)


# ---------------------------------------------------------------------------
# op pool — each op: (pandas_transform, engine_transform), row-preserving
# schema so any op can follow any other
# ---------------------------------------------------------------------------

def op_filter_v(c):
    return (lambda p: p[p["v"] > c], lambda e: e.filter(col("v") > c))


def op_filter_k(c):
    return (lambda p: p[p["k"] == c], lambda e: e.filter(col("k") == c))


def op_assign():
    return (
        lambda p: p.assign(v=p["v"] * 2 + p["k"]),
        lambda e: e.assign(v=col("v") * 2 + col("k")),
    )


def op_fillna(c):
    return (
        lambda p: p.assign(v=p["v"].fillna(c)),
        lambda e: e.fillna({"v": c}),
    )


def op_dropna():
    return (lambda p: p.dropna(subset=["v"]), lambda e: e.dropna(subset=["v"]))


def op_sort_head(m):
    return (
        lambda p: p.sort_values(["v", "t"], na_position="last").head(m),
        lambda e: e.sort_values(["v", "t"]).head(m),
    )


def op_dedup():
    return (
        lambda p: p.sort_values("t").drop_duplicates(subset=["k"]),
        lambda e: e.sort_values("t").drop_duplicates(subset=["k"]),
    )


def op_rank():
    def pandas_side(p):
        return p.assign(r=p.groupby("g")["v"].rank())

    return (pandas_side, lambda e: e.groupby("g").rank("v", alias="r"))


def op_ffill():
    def pandas_side(p):
        p = p.sort_values("t")
        return p.assign(v=p.groupby("g")["v"].ffill())

    return (pandas_side, lambda e: e.groupby("g").ffill("v", order_by="t"))


def op_dedup_last():
    return (
        lambda p: p.sort_values("t").drop_duplicates(subset=["k"], keep="last"),
        lambda e: e.sort_values("t").drop_duplicates(subset=["k"], keep="last"),
    )


def op_cumsum():
    def pandas_side(p):
        p = p.sort_values("t")
        return p.assign(v=p.groupby("g")["v"].cumsum())

    return (pandas_side, lambda e: e.groupby("g").cumsum("v", order_by="t"))


def op_shift():
    def pandas_side(p):
        p = p.sort_values("t")
        return p.assign(v=p.groupby("g")["v"].shift(1))

    return (pandas_side, lambda e: e.groupby("g").shift("v", periods=1, order_by="t"))


def op_clip(lo, hi):
    return (
        lambda p: p.assign(v=p["v"].clip(lo, hi)),
        lambda e: e.assign(v=col("v").clip(lo, hi)),
    )


def op_isin():
    return (
        lambda p: p[p["k"].isin([0.0, 2.0])],
        lambda e: e.filter(col("k").isin([0, 2])),
    )


def op_between(a, b):
    return (
        lambda p: p[p["v"].between(a, b)],
        lambda e: e.filter(col("v").between(a, b)),
    )


def op_replace_v():
    return (
        lambda p: p.assign(v=p["v"].replace({2.5: 9.0})),
        lambda e: e.replace({2.5: 9.0}, subset=["v"]),
    )


def op_diff():
    def pandas_side(p):
        p = p.sort_values("t")
        return p.assign(d=p.groupby("g")["v"].diff())

    return (pandas_side, lambda e: e.groupby("g").diff("v", alias="d", order_by="t"))


def op_pct_change():
    def pandas_side(p):
        p = p.sort_values("t")
        return p.assign(pc=p.groupby("g")["v"].pct_change(fill_method=None))

    return (
        pandas_side,
        lambda e: e.groupby("g").pct_change("v", alias="pc", order_by="t"),
    )


def op_cummax():
    def pandas_side(p):
        p = p.sort_values("t")
        return p.assign(v=p.groupby("g")["v"].cummax())

    return (pandas_side, lambda e: e.groupby("g").cummax("v", order_by="t"))


def op_group_head(m):
    def pandas_side(p):
        return p.sort_values("t").groupby("g").head(m)

    return (pandas_side, lambda e: e.groupby("g").head(m, order_by="t"))


def op_nlargest(m):
    def pandas_side(p):
        return p.sort_values("t").nlargest(m, "v")

    return (pandas_side, lambda e: e.sort_values("t").nlargest(m, "v"))


def op_str_upper():
    return (
        lambda p: p.assign(g=p["g"].str.upper()),
        lambda e: e.assign(g=col("g").str.upper()),
    )


def op_str_len():
    return (
        lambda p: p.assign(sl=p["g"].str.len().astype("float64")),
        lambda e: e.assign(sl=col("g").str.len().astype("double")),
    )


def op_concat_self():
    """Union with a t-shifted copy — the shift keeps the ``t`` tiebreak
    column unique (a plain self-concat would duplicate t and make every
    order-sensitive downstream op ambiguous in BOTH engines)."""

    def pandas_side(p):
        return pd.concat(
            [p, p.assign(t=p["t"] + 1000, ts=p["ts"] + pd.Timedelta(hours=1000))],
            ignore_index=True,
        )

    def engine_side(e):
        import pyspark.sql.functions as SF

        shifted = e.assign(t=col("t") + 1000).assign(
            ts=SF.col("ts") + SF.expr("interval 1000 hours")
        )
        return ps.concat([e, shifted])

    return (pandas_side, engine_side)


def op_bfill():
    def pandas_side(p):
        p = p.sort_values("t")
        return p.assign(v=p.groupby("g")["v"].bfill())

    return (pandas_side, lambda e: e.groupby("g").bfill("v", order_by="t"))


def op_group_tail(m):
    def pandas_side(p):
        return p.sort_values("t").groupby("g").tail(m)

    return (pandas_side, lambda e: e.groupby("g").tail(m, order_by="t"))


def op_cummin():
    def pandas_side(p):
        p = p.sort_values("t")
        return p.assign(v=p.groupby("g")["v"].cummin())

    return (pandas_side, lambda e: e.groupby("g").cummin("v", order_by="t"))


def op_shift_lead():
    def pandas_side(p):
        p = p.sort_values("t")
        return p.assign(v=p.groupby("g")["v"].shift(-1))

    return (pandas_side, lambda e: e.groupby("g").shift("v", periods=-1, order_by="t"))


def op_dedup_none():
    return (
        lambda p: p.drop_duplicates(subset=["k"], keep=False),
        lambda e: e.drop_duplicates(subset=["k"], keep=False),
    )


def op_filter_g():
    return (lambda p: p[p["g"] == "a"], lambda e: e.filter(col("g") == "a"))


DIM_G_ROWS = [("a", 1.0), ("ζ", 2.0), ("zz", 3.0)]


def op_join_g(spark, how):
    def pandas_side(p):
        pdf2 = pd.DataFrame(DIM_G_ROWS, columns=["g", "w"])
        return pd.merge(p, pdf2, on="g", how=how)

    def engine_side(e):
        sdf2 = spark.createDataFrame(DIM_G_ROWS, schema="g string, w double")
        return e.merge(DataFrame(sdf2), on="g", how=how)

    return (pandas_side, engine_side)


def _roll2_nanmean(s):
    # explicit reference semantics: NaN-skipping mean over a 2-row
    # window, IEEE for ±inf. pandas' own rolling kernels treat inf as
    # missing (documented numerical-stability artifact) — the engine
    # follows IEEE instead (window.py Rolling docs), so the reference
    # is computed by hand.
    v = s.to_numpy(dtype="float64")
    out = np.empty(len(v))
    for i in range(len(v)):
        win = v[max(0, i - 1): i + 1]
        fin = win[~np.isnan(win)]
        out[i] = np.nan if len(fin) == 0 else fin.mean()
    return pd.Series(out, index=s.index)


def op_rolling2_mean():
    def pandas_side(p):
        p = p.sort_values("t")
        return p.assign(v=p.groupby("g")["v"].transform(_roll2_nanmean))

    return (
        pandas_side,
        lambda e: e.sort_values("t").rolling(2, by=["g"], min_periods=1)
                   .mean("v", alias="v"),
    )


def op_ewm_span2():
    def pandas_side(p):
        p = p.sort_values("t")
        return p.assign(
            v=p.groupby("g")["v"].transform(
                lambda s: s.ewm(span=2, adjust=True).mean()
            )
        )

    def engine_side(e):
        from pandas_spark.window import ewm_mean

        return ewm_mean(e, "v", span=2, by=["g"], order_by="t", alias="v")

    return (pandas_side, engine_side)


def op_interp_linear():
    def pandas_side(p):
        p = p.sort_values("t")
        return p.assign(v=p["v"].interpolate())

    return (
        pandas_side,
        lambda e: e.sort_values("t").interpolate(subset=["v"]),
    )


def op_size_terminal():
    """Terminal — groupby size (counts NULL values, unlike count)."""

    def pandas_side(p):
        return p.groupby("g").size().reset_index(name="size")

    return (pandas_side, lambda e: e.groupby("g").size())


def op_join(spark, how):
    def pandas_side(p):
        pdf2, _ = dim_frames(spark)
        return pd.merge(p, pdf2, on="k", how=how)

    def engine_side(e):
        _, edf2 = dim_frames(spark)
        return e.merge(edf2, on="k", how=how)

    return (pandas_side, engine_side)


def op_sorted_join(spark, how, asc):
    """merge of a VALUE-SORTED left against the dim — exercises the
    slot-based order carry (advisor-found __ord__ leak: merging a
    sorted frame crashed or scrambled the declared tiebreak)."""

    def pandas_side(p):
        pdf2, _ = dim_frames(spark)
        return pd.merge(
            p.sort_values("v", ascending=asc, kind="stable"), pdf2,
            on="k", how=how,
        )

    def engine_side(e):
        _, edf2 = dim_frames(spark)
        return e.sort_values("v", ascending=asc).merge(edf2, on="k", how=how)

    return (pandas_side, engine_side)


def op_agg(fn):
    """Terminal op — schema collapses to (g, out)."""

    def pandas_side(p):
        out = p.groupby("g", dropna=True).agg(out=("v", fn)).reset_index()
        if fn == "count":
            out["out"] = out["out"].astype("int64")
        return out

    return (pandas_side, lambda e: e.groupby("g").agg(out=("v", fn)))


def draw_chain(draw, spark):
    ops = []
    n_ops = draw(st.integers(min_value=2, max_value=4))
    pool = st.sampled_from(
        ["filter_v", "filter_k", "assign", "fillna", "dropna",
         "sort_head", "dedup", "dedup_last", "cumsum", "shift", "join",
         "rank", "ffill", "clip", "isin", "between", "replace_v",
         "diff", "pct_change", "cummax", "group_head", "nlargest",
         "str_upper", "str_len", "concat_self", "bfill", "group_tail",
         "cummin", "shift_lead", "dedup_none", "filter_g", "join_g",
         "rolling2_mean", "ewm_span2", "interp_linear", "sorted_join",
         "frame_cumsum", "frame_pct", "round1", "abs_v",
         "applymap_affine", "join_gk",
         "rolling_time_3h", "filter_hour", "period_label"]
    )
    for _ in range(n_ops):
        name = draw(pool)
        if name == "filter_v":
            ops.append(op_filter_v(draw(st.sampled_from([-1.0, 0.0, 2.5]))))
        elif name == "filter_k":
            ops.append(op_filter_k(draw(st.sampled_from([0, 1, 3]))))
        elif name == "assign":
            ops.append(op_assign())
        elif name == "fillna":
            ops.append(op_fillna(draw(st.sampled_from([0.0, -9.0]))))
        elif name == "dropna":
            ops.append(op_dropna())
        elif name == "sort_head":
            ops.append(op_sort_head(draw(st.sampled_from([3, 7, 50]))))
        elif name == "dedup":
            ops.append(op_dedup())
        elif name == "dedup_last":
            ops.append(op_dedup_last())
        elif name == "rank":
            ops.append(op_rank())
        elif name == "ffill":
            ops.append(op_ffill())
        elif name == "cumsum":
            ops.append(op_cumsum())
        elif name == "shift":
            ops.append(op_shift())
        elif name == "join":
            ops.append(op_join(spark, draw(st.sampled_from(["inner", "left", "outer"]))))
        elif name == "sorted_join":
            ops.append(op_sorted_join(
                spark,
                draw(st.sampled_from(["inner", "left"])),
                draw(st.booleans()),
            ))
        elif name == "clip":
            ops.append(op_clip(draw(st.sampled_from([-1.0, 0.0])), draw(st.sampled_from([2.5, 7.0]))))
        elif name == "isin":
            ops.append(op_isin())
        elif name == "between":
            ops.append(op_between(-1.0, draw(st.sampled_from([0.0, 2.5]))))
        elif name == "replace_v":
            ops.append(op_replace_v())
        elif name == "diff":
            ops.append(op_diff())
        elif name == "pct_change":
            ops.append(op_pct_change())
        elif name == "cummax":
            ops.append(op_cummax())
        elif name == "group_head":
            ops.append(op_group_head(draw(st.sampled_from([1, 2]))))
        elif name == "nlargest":
            ops.append(op_nlargest(draw(st.sampled_from([2, 5]))))
        elif name == "str_upper":
            ops.append(op_str_upper())
        elif name == "str_len":
            ops.append(op_str_len())
        elif name == "concat_self":
            ops.append(op_concat_self())
        elif name == "bfill":
            ops.append(op_bfill())
        elif name == "group_tail":
            ops.append(op_group_tail(draw(st.sampled_from([1, 2]))))
        elif name == "cummin":
            ops.append(op_cummin())
        elif name == "shift_lead":
            ops.append(op_shift_lead())
        elif name == "dedup_none":
            ops.append(op_dedup_none())
        elif name == "filter_g":
            ops.append(op_filter_g())
        elif name == "join_g":
            ops.append(op_join_g(spark, draw(st.sampled_from(["inner", "left"]))))
        elif name == "rolling2_mean":
            ops.append(op_rolling2_mean())
        elif name == "ewm_span2":
            ops.append(op_ewm_span2())
        elif name == "interp_linear":
            ops.append(op_interp_linear())
        elif name == "frame_cumsum":
            ops.append(op_frame_cumsum())
        elif name == "frame_pct":
            ops.append(op_frame_pct())
        elif name == "round1":
            ops.append(op_round1())
        elif name == "abs_v":
            ops.append(op_abs_v())
        elif name == "applymap_affine":
            ops.append(op_applymap_affine())
        elif name == "join_gk":
            ops.append(op_join_gk(spark, draw(st.sampled_from(["inner", "left", "outer"]))))
        elif name == "rolling_time_3h":
            ops.append(op_rolling_time_3h())
        elif name == "filter_hour":
            ops.append(op_filter_hour(3, draw(st.sampled_from([8, 15, 22]))))
        elif name == "period_label":
            ops.append(op_period_label(draw(st.sampled_from(["D", "W", "M", "h"]))))
    if draw(st.booleans()):
        term = draw(st.sampled_from(
            ["sum", "mean", "min", "max", "count", "var", "std", "median",
             "nunique", "size"]
        ))
        ops.append(op_size_terminal() if term == "size" else op_agg(term))
    return ops


# -- round-6 frame-method families (registered in _EXTRA_OPS below) --------
def op_frame_cumsum():
    def pandas_side(p):
        p = p.sort_values("t")
        return p.assign(v=p["v"].cumsum())

    return (pandas_side, lambda e: e.sort_values("t").cumsum(["v"]))


def op_frame_pct():
    def pandas_side(p):
        p = p.sort_values("t")
        return p.assign(v=p["v"].pct_change(fill_method=None))

    return (pandas_side, lambda e: e.sort_values("t").pct_change(columns=["v"]))


def op_round1():
    return (
        lambda p: p.assign(v=p["v"].round(1)),
        lambda e: e.round({"v": 1}),
    )


def op_abs_v():
    return (
        lambda p: p.assign(v=p["v"].abs()),
        lambda e: e.abs(["v"]),
    )


def op_applymap_affine():
    fn = lambda x: x * 3.0 - 1.0
    return (
        lambda p: p.assign(v=p["v"].map(fn)),
        lambda e: e.applymap(fn, subset=["v"], dtype="double"),
    )


def op_rolling_time_3h():
    """Time-range rolling over the ts clock. NULL-ts rows (outer-join
    residue) are dropped first in BOTH engines — pandas raises on a
    NaT in the on= column; the concat op keeps ts unique so Spark's
    ties-inclusive RANGE frame and pandas' position cut agree. The
    reference mean is computed by hand (NaN-skipping, IEEE for ±inf)
    because pandas' rolling kernel treats inf as missing."""
    def pandas_side(p):
        p = p.dropna(subset=["ts"]).sort_values("ts")
        ts = p["ts"].to_numpy()
        v = p["v"].to_numpy(dtype="float64")
        out = np.empty(len(v))
        for i in range(len(v)):
            mask = (ts > ts[i] - np.timedelta64(3, "h")) & (ts <= ts[i])
            win = v[mask]
            fin = win[~np.isnan(win)]
            out[i] = np.nan if len(fin) == 0 else fin.mean()
        return p.assign(v=out)

    return (
        pandas_side,
        lambda e: e.filter(col("ts").notna()).sort_values("ts")
                   .rolling("3h", on="ts").mean("v", alias="v"),
    )


def op_filter_hour(lo, hi):
    return (
        lambda p: p[p["ts"].dt.hour.between(lo, hi)],
        lambda e: e.filter(col("ts").dt.hour.between(lo, hi)),
    )


def op_period_label(freq):
    def pandas_side(p):
        # NULL ts (outer-join residue) -> None, not the string 'NaT'
        return p.assign(
            pl=p["ts"].dt.to_period(freq).astype(str).where(p["ts"].notna(), None)
        )

    def engine_side(e):
        return e.assign(pl=ps.period_str(ps.to_period(col("ts"), freq), freq))

    return (pandas_side, engine_side)


DIM_GK_ROWS = [("a", 0.0, 5.0), ("a", 1.0, 6.0), ("b", 0.0, 7.0),
               (None, 3.0, 8.0), ("ζ", None, 9.0)]


def op_join_gk(spark, how):
    """Two-key merge with NULLs in BOTH key columns of the dim —
    stresses the null-safe `<=>` key path and suffix-free overlap."""
    def pandas_side(p):
        pdf2 = pd.DataFrame(DIM_GK_ROWS, columns=["g", "k", "u2"])
        return pd.merge(p, pdf2, on=["g", "k"], how=how)

    def engine_side(e):
        sdf2 = spark.createDataFrame(DIM_GK_ROWS, schema="g string, k double, u2 double")
        return e.merge(DataFrame(sdf2), on=["g", "k"], how=how)

    return (pandas_side, engine_side)


# ---------------------------------------------------------------------------
# canonical comparison
# ---------------------------------------------------------------------------

def _norm(x):
    if x is None:
        return None
    if isinstance(x, pd.Timestamp) or x is pd.NaT:
        # pandas NaT (outer-join ts residue) ≡ engine NULL; timestamps
        # to a canonical string
        return None if pd.isna(x) else x.isoformat()
    if isinstance(x, float):
        if math.isnan(x):
            return None
        if math.isinf(x):
            return x
        if x == 0.0:
            return 0.0  # unify IEEE signed zeros (repr-sort key!)
        if x == int(x) and abs(x) < 1e15:
            return float(x)  # unify int-valued floats across dtypes
        return round(x, 9)
    if isinstance(x, (int,)):
        return float(x)
    return x


def canon(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm(v) for v in rec)
        for rec in pdf[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows, key=repr)


@settings(
    # CI: 60 derandomized examples. Exploratory soaks override with
    # FUZZ_EXAMPLES=n (random seed each run, prints the failing example
    # via hypothesis' normal reporting) — the mode the round-6 soak runs.
    max_examples=int(os.environ.get("FUZZ_EXAMPLES", "60")),
    deadline=None,
    derandomize="FUZZ_EXAMPLES" not in os.environ,
    suppress_health_check=list(HealthCheck),
)
@given(data=st.data())
def test_chain_differential(spark, data):
    rows = data.draw(rows_strategy)
    pdf, edf = build_frames(spark, rows)
    ops = draw_chain(data.draw, spark)
    for p_op, e_op in ops:
        pdf, edf = p_op(pdf), e_op(edf)
    got_cols, got = canon(edf.to_pandas())
    want_cols, want = canon(pdf)
    assert got_cols == want_cols
    assert got == want


# decoy columns named like the engine's own internal tags (plus a
# dotted name): every op in the pool must carry their VALUES through
# untouched — a fixed internal withColumn/alias that shadows one of
# these silently corrupts data or raises AMBIGUOUS_REFERENCE (round-9
# verdict #2: the adversarial-name family over ALL operators, not just
# merge). __ord__-shaped names stay excluded (documented reserved).
DECOYS = ["__rk0__", "__pos__", "__cnt__", "__p__", "__side__", "with.dot", "tick`mark"]


def _add_decoys(spark, pdf, edf):
    import pyspark.sql.functions as SF

    pdf = pdf.assign(**{
        "__rk0__": pdf["t"] * 1.5,
        "__pos__": (pdf["t"] % 7).astype("int64"),
        "__cnt__": (pdf["t"] % 3).astype(str),
        "__p__": pdf["t"] * -2.0,
        "__side__": (pdf["t"] % 2).astype("int64"),
        "with.dot": pdf["t"] + 0.25,
        "tick`mark": pdf["t"] - 0.5,
    })
    sdf = edf._sdf.withColumns({
        "__rk0__": SF.col("t") * 1.5,
        "__pos__": (SF.col("t") % 7).cast("long"),
        "__cnt__": (SF.col("t") % 3).cast("string"),
        "__p__": SF.col("t") * -2.0,
        "__side__": (SF.col("t") % 2).cast("long"),
        "with.dot": SF.col("t") + 0.25,
        "tick`mark": SF.col("t") - 0.5,
    })
    return pdf, edf._with(sdf)


@settings(
    max_examples=int(os.environ.get("FUZZ_EXAMPLES", "40")),
    deadline=None,
    derandomize="FUZZ_EXAMPLES" not in os.environ,
    suppress_health_check=list(HealthCheck),
)
@given(data=st.data())
def test_chain_differential_adversarial_decoys(spark, data):
    rows = data.draw(rows_strategy)
    pdf, edf = build_frames(spark, rows)
    pdf, edf = _add_decoys(spark, pdf, edf)
    ops = draw_chain(data.draw, spark)
    for p_op, e_op in ops:
        pdf, edf = p_op(pdf), e_op(edf)
    got_cols, got = canon(edf.to_pandas())
    want_cols, want = canon(pdf)
    assert got_cols == want_cols
    assert got == want
