"""Calendar-anchored resample (ME/MS/QE/QS/YE/YS/W[-DOW]) vs pandas.

pandas semantics verified here (reference core/resample.py:2402
TimeGrouper, :2404 end-anchored right/right defaults, _adjust_bin_edges
day-end adjustment; offsets.pyx Week:5192, MonthEnd:4680):

* END-anchored freqs (ME/QE/YE/W) decide membership at DAY granularity
  (edges are day-end-adjusted): Jan 31 23:59 is still January,
  Sunday 05:00 still ends that Sunday's week.
* START-anchored freqs (MS/QS/YS) keep midnight edges: closed='right'
  moves an exactly-midnight month-start into the earlier bucket.
* Defaults: closed/label = right/right for end-anchored, left/left
  otherwise.

The engine only emits OCCUPIED buckets (pandas emits empty bins for
interior gaps); the comparison therefore filters pandas' result to
count>0 bins — upsampling/gap-filling is `asfreq_spine`/`interpolate`,
tested separately below.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest

import pandas_spark as ps

FREQS = [
    "ME", "MS", "QE", "QS", "YE", "YS", "W",
    "W-WED", "W-MON", "QE-FEB", "YE-JUN", "QS-OCT", "YS-JUL",
]

BOUNDARY_STAMPS = [
    "2024-01-15 10:00", "2024-01-31 00:00", "2024-01-31 00:01",
    "2024-01-31 23:59", "2024-02-01 00:00", "2024-02-01 10:00",
    "2024-02-29 12:00", "2024-03-01 00:00", "2023-12-31 00:00",
    "2023-12-31 05:00", "2024-06-30 23:59:59.999999",
    "2024-07-01 00:00:00.000001", "2024-12-31 23:59:59",
    "2025-01-01 00:00:00",
]


def _random_boundary_stamps(n: int, seed: int) -> list[pd.Timestamp]:
    """Stamps clustered around month/week boundaries ±2h, plus interior."""
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        month = rng.randint(1, 12)
        year = rng.choice([2023, 2024])
        anchor = pd.Timestamp(year=year, month=month, day=1)
        if rng.random() < 0.7:
            off = rng.randint(-7200, 7200)  # ±2h around a month edge
        else:
            off = rng.randint(0, 27 * 86400)
        out.append(anchor + pd.Timedelta(seconds=off))
    return out


def _compare(pdf: pd.DataFrame, eng: ps.DataFrame, freq: str, closed, label):
    kw = {}
    if closed:
        kw["closed"] = closed
    if label:
        kw["label"] = label
    grp = pdf.set_index("ts").resample(freq, **kw)["v"]
    exp = grp.sum().reset_index().rename(columns={"v": "s"})
    exp = exp[grp.count().values > 0].reset_index(drop=True)
    got = (
        eng.resample(freq, on="ts", **kw)
        .agg({"v": "sum"})
        .to_spark()
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
        .rename(columns={"v": "s"})
    )
    assert len(exp) == len(got), (freq, closed, label, exp, got)
    assert (exp["ts"].values == got["ts"].values).all(), (freq, closed, label, exp, got)
    assert (abs(exp["s"].values - got["s"].values) < 1e-9).all(), (freq, closed, label)


@pytest.fixture(scope="module")
def frames(spark):
    stamps = list(pd.to_datetime(BOUNDARY_STAMPS, format="mixed"))
    stamps += _random_boundary_stamps(120, seed=11)
    pdf = pd.DataFrame({"ts": stamps, "v": [float(i % 17) + 0.25 for i in range(len(stamps))]})
    return pdf, ps.DataFrame(spark.createDataFrame(pdf))


@pytest.mark.parametrize("freq", FREQS)
def test_anchored_defaults_match_pandas(frames, freq):
    pdf, eng = frames
    _compare(pdf, eng, freq, None, None)


@pytest.mark.parametrize("freq", ["ME", "MS", "W", "QE"])
@pytest.mark.parametrize("closed", ["left", "right"])
@pytest.mark.parametrize("label", ["left", "right"])
def test_anchored_closed_label_matrix(frames, freq, closed, label):
    pdf, eng = frames
    _compare(pdf, eng, freq, closed, label)


def test_anchored_multiple_raises(frames):
    _, eng = frames
    with pytest.raises(NotImplementedError, match="multiples"):
        eng.resample("2ME", on="ts").agg({"v": "sum"})
    with pytest.raises(NotImplementedError, match="multiples"):
        eng.resample("3W", on="ts").agg({"v": "sum"})


def test_anchored_origin_offset_raise(frames):
    _, eng = frames
    with pytest.raises(NotImplementedError, match="origin"):
        eng.resample("ME", on="ts", origin="start")
    with pytest.raises(NotImplementedError, match="origin"):
        eng.resample("W", on="ts", offset="1D")


def test_ms_is_not_milliseconds_confusion(frames):
    """'ms' (lowercase) must NOT parse as month-start: it is pandas'
    millisecond alias, which the engine doesn't support — loud raise."""
    _, eng = frames
    with pytest.raises(ValueError, match="unsupported frequency unit"):
        eng.resample("ms", on="ts").agg({"v": "sum"})


def test_anchored_spine_matches_agg_labels(frames):
    """asfreq_spine covers exactly the label range of the aggregate and
    every aggregate label is on the spine (upsample-join contract)."""
    pdf, eng = frames
    for freq in ["ME", "MS", "W", "QE", "YE"]:
        r = eng.resample(freq, on="ts")
        agg = r.agg({"v": "sum"}).to_spark().toPandas()
        spine = r.asfreq_spine().to_spark().toPandas()
        agg_ts = set(agg["ts"])
        spine_ts = set(spine["ts"])
        assert agg_ts <= spine_ts, (freq, sorted(agg_ts - spine_ts)[:3])
        assert min(spine_ts) == min(agg_ts) and max(spine_ts) == max(agg_ts), freq


def test_anchored_count_matches_pandas_weekly_by_group(frames, spark):
    """Grouped weekly resample (by=) against pandas groupby().resample()."""
    pdf, _ = frames
    pdf = pdf.assign(k=[i % 3 for i in range(len(pdf))])
    eng = ps.DataFrame(spark.createDataFrame(pdf))
    exp = (
        pdf.set_index("ts")
        .groupby("k")
        .resample("W")["v"]
        .count()
        .reset_index()
        .rename(columns={"v": "n"})
    )
    exp = exp[exp["n"] > 0].sort_values(["k", "ts"]).reset_index(drop=True)
    got = (
        eng.resample("W", on="ts", by=["k"])
        .agg({"v": "count"})
        .to_spark()
        .toPandas()
        .rename(columns={"v": "n"})
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    assert exp[["k", "n"]].values.tolist() == got[["k", "n"]].values.tolist()
    assert (exp["ts"].values == got["ts"].values).all()


def test_streaming_resample_rejects_anchored(spark):
    from pandas_spark import fshim as F
    from pandas_spark.streaming.core import resample_stream

    sdf = spark.range(1).select(
        F.current_timestamp().alias("ts"), F.lit(1.0).alias("v")
    )
    with pytest.raises(NotImplementedError, match="batch-only"):
        resample_stream(sdf, "ME", "ts", {"v": "sum"})


# --- r11 reference sweep: origin semantics, NaT, invalid freqs ----------
# (reference tests/resample/test_datetime_index.py: test_resample_origin,
# test_resample_multiday_closed_right_43198, test_resample_7D_vs_168h,
# test_resample_with_nat, test_resample_M_Q_Y_raises)


def _origin_frames(spark):
    rng = random.Random(43)
    base = pd.Timestamp("2024-03-05 13:47:21.123456")
    stamps = [
        base + pd.Timedelta(seconds=rng.randint(0, 40 * 86400),
                            microseconds=rng.randint(0, 999999))
        for _ in range(250)
    ]
    pdf = pd.DataFrame({"ts": stamps, "v": [round(i * 0.37, 3) for i in range(250)]})
    return pdf, ps.DataFrame(spark.createDataFrame(pdf))


@pytest.mark.parametrize(
    "rule,kw",
    [
        # pandas' DEFAULT origin is 'start_day': for widths that do NOT
        # divide a day (2D/7D/7min) epoch anchoring gives different bins
        ("2D", {}),
        ("7D", {}),
        ("7min", {}),
        ("90min", {}),
        ("6h", {"origin": "end"}),       # defaults flip to right/right
        ("6h", {"origin": "end_day"}),
        ("2D", {"origin": "end"}),
        ("35min", {"origin": "start"}),
        ("45min", {"origin": "end", "closed": "left"}),
        ("1D", {"origin": "2024-03-01 06:00:00"}),
        ("7D", {"origin": "epoch"}),
        ("2D", {"closed": "right"}),     # start_day default × closed
    ],
)
def test_resample_origin_matches_pandas(spark, rule, kw):
    pdf, eng = _origin_frames(spark)
    grp = pdf.set_index("ts").resample(rule, **kw)["v"]
    exp = grp.sum().reset_index().rename(columns={"v": "s"})
    exp = exp[grp.count().values > 0].reset_index(drop=True)
    got = (
        eng.resample(rule, on="ts", **kw)
        .agg({"v": "sum"})
        .to_spark()
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
        .rename(columns={"v": "s"})
    )
    assert len(exp) == len(got), (rule, kw, exp, got)
    assert (exp["ts"].values == got["ts"].values).all(), (rule, kw)
    assert (abs(exp["s"].values - got["s"].values) < 1e-9).all(), (rule, kw)


def test_resample_nat_rows_dropped(spark):
    """pandas drops NaT index rows before binning (test_resample_with_nat)."""
    pdf = pd.DataFrame(
        {
            "ts": [pd.NaT, pd.Timestamp("2024-01-01"), pd.NaT,
                   pd.Timestamp("2024-01-01 00:00:01")],
            "v": [2.0, 3.0, 5.0, 7.0],
        }
    )
    eng = ps.DataFrame(spark.createDataFrame(pdf))
    got = eng.resample("1s", on="ts").agg({"v": "sum"}).to_spark().toPandas()
    assert len(got) == 2 and got["ts"].notna().all()
    got_me = eng.resample("ME", on="ts").agg({"v": "sum"}).to_spark().toPandas()
    assert len(got_me) == 1 and got_me["ts"].notna().all()
    got_ohlc = eng.resample("1s", on="ts").ohlc("v").to_spark().toPandas()
    assert len(got_ohlc) == 2 and got_ohlc["ts"].notna().all()


@pytest.mark.parametrize("freq", ["M", "Q", "Y", "A", "2BM", "1BQ", "B", "C"])
def test_resample_invalid_frequency_raises(spark, freq):
    """pandas raises 'Invalid frequency: M' for the deprecated/business
    aliases (test_resample_M_Q_Y_raises, test_resample_BM_BQ_raises)."""
    pdf = pd.DataFrame({"ts": [pd.Timestamp("2024-01-01")], "v": [1.0]})
    eng = ps.DataFrame(spark.createDataFrame(pdf))
    with pytest.raises(ValueError, match="Invalid frequency"):
        eng.resample(freq, on="ts").agg({"v": "sum"})


# --- r11: Resampler.asfreq / ffill / bfill / nearest (upsample fills) ----


@pytest.mark.parametrize("rule", ["1s", "2s", "5s"])
@pytest.mark.parametrize(
    "method,limit",
    [("asfreq", None), ("ffill", None), ("ffill", 1), ("ffill", 2),
     ("bfill", None), ("bfill", 1), ("nearest", None)],
)
def test_resampler_upsample_fills_match_pandas(spark, rule, method, limit):
    """reference core/resample.py ffill/bfill/nearest/asfreq: the fill
    VALUE comes from the nearest ORIGINAL row (off-grid rows count —
    reindex semantics, not asfreq-then-fill), while limit= caps the
    consecutive grid slots filled per occupied-slot run."""
    rng = random.Random(7)
    base = pd.Timestamp("2024-01-01 00:00:00")
    stamps = sorted(
        base + pd.Timedelta(milliseconds=rng.randint(0, 120_000))
        for _ in range(25)
    )
    pdf = pd.DataFrame({"ts": stamps, "v": [float(i) for i in range(25)]})
    pdf = pdf.drop_duplicates("ts")
    eng = ps.DataFrame(spark.createDataFrame(pdf))
    rp = pdf.set_index("ts")["v"].resample(rule)
    re = eng.resample(rule, on="ts")
    if method == "asfreq":
        exp, got_df = rp.asfreq(), re.asfreq()
    elif method == "ffill":
        exp, got_df = rp.ffill(limit=limit), re.ffill(limit=limit)
    elif method == "bfill":
        exp, got_df = rp.bfill(limit=limit), re.bfill(limit=limit)
    else:
        exp, got_df = rp.nearest(), re.nearest()
    got = (
        got_df.to_spark().toPandas().sort_values("ts").reset_index(drop=True)
    )
    exp = exp.reset_index()
    exp.columns = ["ts", "v"]
    assert len(got) == len(exp), (method, limit, rule)
    assert (got["ts"].values == exp["ts"].values).all(), (method, limit, rule)
    for a, b in zip(got["v"], exp["v"]):
        assert (pd.isna(a) and pd.isna(b)) or a == b, (method, limit, rule, a, b)


def test_resampler_ffill_grouped_matches_pandas(spark):
    rng = random.Random(3)
    base = pd.Timestamp("2024-01-01")
    rows = []
    for k in ["a", "b"]:
        for _ in range(15):
            rows.append((k, base + pd.Timedelta(seconds=rng.randint(0, 90)), rng.random()))
    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"]).drop_duplicates(["k", "ts"])
    eng = ps.DataFrame(spark.createDataFrame(pdf))
    exp = (
        pdf.set_index("ts").groupby("k")["v"].resample("5s").ffill()
        .reset_index().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    got = (
        eng.resample("5s", on="ts", by=["k"]).ffill()
        .to_spark().toPandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["ts"].values == exp["ts"].values).all()
    for a, b in zip(got["v"], exp["v"]):
        assert (pd.isna(a) and pd.isna(b)) or a == b


def test_resampler_nearest_limit_raises(spark):
    pdf = pd.DataFrame({"ts": [pd.Timestamp("2024-01-01")], "v": [1.0]})
    eng = ps.DataFrame(spark.createDataFrame(pdf))
    with pytest.raises(NotImplementedError, match="nearest"):
        eng.resample("1s", on="ts")._upsample_fill("nearest", 1)
