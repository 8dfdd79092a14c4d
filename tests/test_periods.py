"""Period struct dtype vs real pandas (reference _libs/tslibs/period.pyx).

Every ordinal/str/start/end/asfreq value is compared against pd.Period
itself across freqs, including pre-1970 dates (negative ordinals),
weekends (business-day roll), leap years, and intraday freqs.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

import pandas_spark as ps
from pandas_spark.functions import periods as P

TS = [
    "1970-01-01 00:00:00",
    "1969-12-31 23:59:59",   # negative ordinals
    "1968-02-29 12:30:45",   # pre-epoch leap day
    "1995-01-15 13:07:09",
    "2024-01-06 08:00:00",   # Saturday (B rolls forward to Monday)
    "2024-01-07 23:59:59",   # Sunday
    "2024-01-05 10:00:00",   # Friday (B inverse residue 3 mod 5)
    "2024-01-02 10:00:00",   # Tuesday
    "2024-01-03 10:00:00",   # Wednesday
    "2024-01-04 10:00:00",   # Thursday
    "2024-02-29 00:00:00",   # leap day
    "2099-12-31 23:00:30",
    "1970-01-04 00:00:00",   # W boundary (Sunday, end of epoch week)
    "1970-01-05 00:00:00",   # W boundary (Monday, start of week 1)
]

FREQS = ["Y", "Q", "M", "W", "D", "B", "h", "min", "s"]


def _frame(spark):
    sdf = spark.createDataFrame(
        [(i, pd.Timestamp(t).to_pydatetime()) for i, t in enumerate(TS)],
        "i long, ts timestamp",
    )
    return ps.DataFrame(sdf)


@pytest.mark.parametrize("freq", FREQS)
def test_ordinal_str_start_end_match_pandas(spark, freq):
    f = _frame(spark)
    got = f.assign(p=ps.to_period(ps.col("ts"), freq)).assign(
        s=ps.period_str(ps.col("p")),
        start=ps.period_start_time(ps.col("p")),
        end=ps.period_end_time(ps.col("p")),
    )
    pdf = got.sort_values("i").to_pandas()
    ords = [r["ordinal"] for r in pdf["p"]]
    for i, t in enumerate(TS):
        ref = pd.Period(pd.Timestamp(t), freq)
        assert ords[i] == ref.ordinal, (freq, t, ords[i], ref.ordinal)
        assert pdf["s"][i] == str(ref), (freq, t, pdf["s"][i], str(ref))
        assert pd.Timestamp(pdf["start"][i]) == ref.start_time, (freq, t)
        # engine end = last µs; pandas end_time is last ns
        assert pd.Timestamp(pdf["end"][i]) == ref.end_time.floor("us"), (freq, t)


@pytest.mark.parametrize(
    "from_f,to_f,how",
    [("M", "Q", "end"), ("M", "Q", "start"), ("D", "M", "end"),
     ("Q", "Y", "end"), ("h", "D", "start"), ("D", "W", "end"),
     ("M", "D", "start"), ("M", "D", "end"), ("Y", "M", "start")],
)
def test_asfreq_matches_pandas(spark, from_f, to_f, how):
    f = _frame(spark)
    got = (
        f.assign(p=ps.to_period(ps.col("ts"), from_f))
        .assign(q=ps.period_asfreq(ps.col("p"), to_f, how=how))
        .sort_values("i")
        .to_pandas()
    )
    for i, t in enumerate(TS):
        ref = pd.Period(pd.Timestamp(t), from_f).asfreq(to_f, how=how)
        assert got["q"][i]["ordinal"] == ref.ordinal, (t, got["q"][i], ref)
        assert got["q"][i]["freq"] == to_f


def test_add_diff_and_mixed_freq_null(spark):
    f = _frame(spark)
    got = (
        f.assign(p=ps.to_period(ps.col("ts"), "M"))
        .assign(
            p7=ps.period_add(ps.col("p"), 7),
            pm3=ps.period_add(ps.col("p"), -3),
            d=ps.period_diff(ps.period_add(ps.col("p"), 7), ps.col("p")),
            mixed=ps.period_diff(
                ps.to_period(ps.col("ts"), "D"), ps.col("p")
            ),
        )
        .sort_values("i")
        .to_pandas()
    )
    for i, t in enumerate(TS):
        ref = pd.Period(pd.Timestamp(t), "M")
        assert got["p7"][i]["ordinal"] == (ref + 7).ordinal
        assert got["pm3"][i]["ordinal"] == (ref - 3).ordinal
        assert got["d"][i] == 7
        # pandas raises IncompatibleFrequency; row-level analog is NULL
        assert got["mixed"][i] is None or pd.isna(got["mixed"][i])


def test_null_timestamp_gives_null_period(spark):
    sdf = spark.createDataFrame([(1, None)], "i long, ts timestamp")
    got = (
        ps.DataFrame(sdf)
        .assign(p=ps.to_period(ps.col("ts"), "M"))
        .to_pandas()
    )
    assert got["p"][0] is None


@pytest.mark.parametrize("freq", ["M", "W", "B", "Q"])
def test_period_range_struct_matches_pandas(spark, freq):
    ref = pd.period_range("1995-01-15", "1996-03-02", freq=freq)
    got = ps.period_range_struct(
        spark, "1995-01-15", "1996-03-02", freq=freq
    ).to_pandas()
    assert [p["ordinal"] for p in got["period"]] == [p.ordinal for p in ref]
    got2 = ps.period_range_struct(spark, "1995-01-15", periods=5, freq=freq).to_pandas()
    ref2 = pd.period_range("1995-01-15", periods=5, freq=freq)
    assert [p["ordinal"] for p in got2["period"]] == [p.ordinal for p in ref2]


def test_groupby_on_period_struct(spark):
    # the representative use: bucket a fact table by month and aggregate
    f = _frame(spark)
    got = (
        f.assign(p=ps.to_period(ps.col("ts"), "M"))
        .groupby("p")
        .agg(n=("i", "size"))
        .assign(label=ps.period_str(ps.col("p"), "M"))
        .sort_values("label")
        .to_pandas()
    )
    ref = (
        pd.DataFrame({"ts": pd.to_datetime(TS), "i": range(len(TS))})
        .assign(p=lambda d: d["ts"].dt.to_period("M").astype(str))
        .groupby("p")
        .size()
        .sort_index()
    )
    assert list(got["label"]) == list(ref.index)
    assert list(got["n"]) == list(ref.values)


def test_period_accessor(spark):
    """.period accessor sugar (PeriodProperties analog)."""
    import pandas_spark as psm

    pdf = pd.DataFrame({"ts": pd.to_datetime(["1995-03-15", "1996-07-01"])})
    f = psm.from_pandas(spark, pdf).assign(p=psm.to_period(psm.col("ts"), "M"))
    out = (
        f.assign(
            o=psm.col("p").period.ordinal,
            s=psm.col("p").period.strftime(),
            st=psm.col("p").period.start_time,
            q=psm.col("p").period.asfreq("Q"),
            p2=psm.col("p").period + 2,
        )
        .sort_values("ts")
        .to_pandas()
    )
    refs = [pd.Period(t, "M") for t in pdf["ts"]]
    assert list(out["o"]) == [r.ordinal for r in refs]
    assert list(out["s"]) == [str(r) for r in refs]
    assert [pd.Timestamp(t) for t in out["st"]] == [r.start_time for r in refs]
    assert [x["ordinal"] for x in out["q"]] == [r.asfreq("Q").ordinal for r in refs]
    assert [x["ordinal"] for x in out["p2"]] == [(r + 2).ordinal for r in refs]
