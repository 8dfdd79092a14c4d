"""Period dtype as a real struct — pandas PeriodDtype on Catalyst.

Reference: pandas/core/arrays/period.py (PeriodArray),
pandas/_libs/tslibs/period.pyx (ordinal arithmetic, DtoB/BtoD business
roll), pandas/core/indexes/period.py:66 (PeriodIndex). SURVEY §1.3
planned ``struct(ordinal: bigint, freq: string)`` — this module closes
that gap (the earlier trunc-timestamp representation in
``datetimes.period_range`` stays for spine generation back-compat).

A period value IS pandas' ordinal: integer count of whole periods since
the epoch period (the one containing 1970-01-01), with the freq code
carried as a struct tag so mixed-freq comparisons can NULL out instead
of silently comparing apples to oranges. All conversions are closed-form
Catalyst expressions (year/quarter/month arithmetic, epoch-day floors)
— JVM-side, codegen-friendly, no UDFs — so ``to_period`` on a 100 TB
fact table is a map-only projection and ``groupBy(period)`` shuffles a
16-byte struct, not a string.

Ordinal conventions (verified against pd.Period in the differential
tests, tests/test_periods.py):

    Y   year - 1970
    Q   (year-1970)*4 + quarter-1            (Q-DEC)
    M   (year-1970)*12 + month-1
    W   floor((epoch_day + 10) / 7)          (W-SUN: Mon..Sun weeks,
        anchored so the week ENDING 1969-12-28 is ordinal 0)
    D   epoch_day
    B   ((d+4) floordiv 7)*5 + (d+4) mod 7 - 4, weekends rolled
        FORWARD to Monday first (measured pd.Period convention)
    h   epoch_day*24 + hour
    min h*60 + minute
    s   min*60 + second
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pandas_spark import fshim as F  # backtick-safe F.col facade

def _epoch() -> Column:
    # built lazily: constructing a Column literal needs an active session
    return F.lit("1970-01-01").cast("date")

# canonical freq code <- accepted aliases (pandas accepts both legacy
# and current aliases; we normalize to one tag so struct equality works)
_ALIASES = {
    "Y": "Y", "A": "Y", "Y-DEC": "Y", "A-DEC": "Y",
    "Q": "Q", "Q-DEC": "Q",
    "M": "M",
    "W": "W", "W-SUN": "W",
    "D": "D",
    "B": "B",
    "h": "h", "H": "h",
    "min": "min", "T": "min",
    "s": "s", "S": "s",
}

FREQS = ("Y", "Q", "M", "W", "D", "B", "h", "min", "s")


def _norm_freq(freq: str) -> str:
    try:
        return _ALIASES[freq]
    except KeyError:
        raise ValueError(
            f"unsupported period freq {freq!r}; supported: {sorted(set(_ALIASES))}"
        ) from None


def _unwrap(v):
    from pandas_spark.expr import Expr

    return v._col if isinstance(v, Expr) else v


def _wrap(c: Column):
    from pandas_spark.expr import Expr

    return Expr(c)


# -- timestamp -> ordinal ---------------------------------------------------

def _epoch_day(ts: Column) -> Column:
    return F.datediff(ts.cast("date"), _epoch()).cast("bigint")


def period_ordinal(ts, freq: str) -> Column:
    """pandas Period ordinal of the period containing ``ts``."""
    ts = _unwrap(ts)
    f = _norm_freq(freq)
    y = (F.year(ts) - F.lit(1970)).cast("bigint")
    if f == "Y":
        return y
    if f == "Q":
        return y * 4 + F.quarter(ts).cast("bigint") - 1
    if f == "M":
        return y * 12 + F.month(ts).cast("bigint") - 1
    d = _epoch_day(ts)
    if f == "W":
        return F.floor((d + 10) / 7).cast("bigint")
    if f == "D":
        return d
    if f == "B":
        # weekday Mon=0: 1970-01-01 (d=0) is Thursday=3
        wd = F.pmod(d + 3, 7)
        # weekend rolls FORWARD to Monday (measured pd.Period behavior:
        # Sat 2024-01-06 -> Period('2024-01-08','B')); then the
        # period.pyx DtoB weekday-count formula
        db = F.when(wd > 4, d + (7 - wd)).otherwise(d)
        return (F.floor((db + 4) / 7) * 5 + F.pmod(db + 4, 7) - 4).cast("bigint")
    h = d * 24 + F.hour(ts).cast("bigint")
    if f == "h":
        return h
    m = h * 60 + F.minute(ts).cast("bigint")
    if f == "min":
        return m
    return m * 60 + F.second(ts).cast("bigint")  # "s"


def to_period(ts, freq: str = "M"):
    """``Series.dt.to_period`` (reference core/arrays/period.py:1169):
    timestamp -> struct(ordinal, freq). NULL in -> NULL struct out."""
    ts = _unwrap(ts)
    f = _norm_freq(freq)
    p = F.struct(
        period_ordinal(ts, f).alias("ordinal"), F.lit(f).alias("freq")
    )
    return _wrap(F.when(ts.isNotNull(), p))


# -- ordinal -> timestamp ---------------------------------------------------

def _start_for(ord_: Column, f: str) -> Column:
    """Start timestamp of the period with ordinal ``ord_`` under freq f."""
    if f == "Y":
        d = F.make_date(F.lit(1970) + ord_, F.lit(1), F.lit(1))
    elif f == "Q":
        d = F.make_date(
            F.lit(1970) + F.floor(ord_ / 4), F.lit(1) + F.pmod(ord_, 4) * 3, F.lit(1)
        )
    elif f == "M":
        d = F.make_date(
            F.lit(1970) + F.floor(ord_ / 12), F.lit(1) + F.pmod(ord_, 12), F.lit(1)
        )
    elif f == "W":
        d = F.date_add(_epoch(), (ord_ * 7 - 10).cast("int"))
    elif f == "D":
        d = F.date_add(_epoch(), ord_.cast("int"))
    elif f == "B":
        # inverse of the DtoB weekday count: epoch anchor is Thursday,
        # so +3 shifts b to a Monday-based 5-day week index
        d = F.date_add(
            _epoch(),
            (F.floor((ord_ + 3) / 5) * 7 + F.pmod(ord_ + 3, 5) - 3).cast("int"),
        )
    else:  # h / min / s: split into day + intraday remainder
        per_day = {"h": 24, "min": 1440, "s": 86400}[f]
        day = F.floor(ord_ / per_day)
        rem_s = F.pmod(ord_, per_day) * {"h": 3600, "min": 60, "s": 1}[f]
        return F.date_add(_epoch(), day.cast("int")).cast("timestamp") + F.make_dt_interval(
            F.lit(0), F.lit(0), F.lit(0), rem_s.cast("double")
        )
    return d.cast("timestamp")


def _case_over_freqs(p: Column, make) -> Column:
    """CASE chain over the freq tag — used when freq isn't known at
    plan time. Nine constant-folded branches; still whole-stage
    codegen (verified in the plan tests)."""
    out = None
    for f in FREQS:
        branch = make(p["ordinal"], f)
        out = F.when(p["freq"] == f, branch) if out is None else out.when(
            p["freq"] == f, branch
        )
    return out


def period_to_timestamp(p, freq: str | None = None, how: str = "start"):
    """``PeriodArray.to_timestamp`` (reference core/arrays/period.py:634).
    ``how='start'`` -> period start; ``how='end'`` -> last microsecond
    of the period (pandas end_time is last nanosecond; µs is the
    documented resolution divergence, SURVEY §1.3). Pass ``freq`` when
    known to emit the single closed form instead of the freq-tag CASE."""
    p = _unwrap(p)
    if how not in ("start", "end", "S", "E"):
        raise ValueError(f"how must be 'start' or 'end', got {how!r}")
    end = how in ("end", "E")

    def mk(ord_, f):
        if not end:
            return _start_for(ord_, f)
        if f == "B":
            # a business period covers only its weekday: end = that
            # day's last µs, NOT the instant before the next B period
            # (which would swallow the weekend) — measured pd.Period
            nxt = F.date_add(_start_for(ord_, f).cast("date"), 1).cast("timestamp")
        else:
            nxt = _start_for(ord_ + 1, f)
        return nxt - F.expr("interval 1 microsecond")

    if freq is not None:
        return _wrap(mk(p["ordinal"], _norm_freq(freq)))
    return _wrap(_case_over_freqs(p, mk))


def period_start_time(p, freq: str | None = None):
    """``Period.start_time`` analog."""
    return period_to_timestamp(p, freq, "start")


def period_end_time(p, freq: str | None = None):
    """``Period.end_time`` analog (µs resolution)."""
    return period_to_timestamp(p, freq, "end")


# -- arithmetic / comparison ------------------------------------------------

def period_add(p, n):
    """``Period + n`` (n whole periods; reference period.pyx
    Period.__add__). n may be a literal or an int column."""
    p = _unwrap(p)
    n = _unwrap(n) if not isinstance(n, int) else F.lit(n)
    return _wrap(
        F.when(
            p.isNotNull(),
            F.struct(
                (p["ordinal"] + n.cast("bigint")).alias("ordinal"), p["freq"].alias("freq")
            ),
        )
    )


def period_diff(a, b):
    """``Period - Period`` -> whole-period count (bigint). Mixed freq
    -> NULL (pandas raises IncompatibleFrequency; NULL is the engine's
    row-level analog — a differential test documents this)."""
    a, b = _unwrap(a), _unwrap(b)
    return _wrap(
        F.when(a["freq"] == b["freq"], a["ordinal"] - b["ordinal"])
    )


def period_asfreq(p, to_freq: str, how: str = "end", from_freq: str | None = None):
    """``Period.asfreq`` (reference period.pyx:2580 Period.asfreq):
    resample the period tag — ``how='start'`` maps via the period's
    first instant, ``how='end'`` (pandas default) via its last."""
    ts = period_to_timestamp(p, from_freq, "start" if how in ("start", "S") else "end")
    return to_period(ts, to_freq)


# -- formatting -------------------------------------------------------------

def period_str(p, freq: str | None = None):
    """``str(Period)`` (reference period.pyx strftime defaults):
    Y '1995' | Q '1995Q1' | M '1995-01' | W '1994-12-26/1995-01-01'
    | D/B '1995-01-15' | h '1995-01-15 13:00' | min '… 13:07'
    | s '… 13:07:09'."""
    p = _unwrap(p)

    def mk(ord_, f):
        start = _start_for(ord_, f)
        if f == "Y":
            return F.date_format(start, "yyyy")
        if f == "Q":
            return F.concat(
                F.date_format(start, "yyyy"), F.lit("Q"), F.quarter(start).cast("string")
            )
        if f == "M":
            return F.date_format(start, "yyyy-MM")
        if f == "W":
            return F.concat(
                F.date_format(start, "yyyy-MM-dd"),
                F.lit("/"),
                F.date_format(F.date_add(start.cast("date"), 6), "yyyy-MM-dd"),
            )
        if f in ("D", "B"):
            return F.date_format(start, "yyyy-MM-dd")
        if f == "h":
            return F.date_format(start, "yyyy-MM-dd HH:00")
        if f == "min":
            return F.date_format(start, "yyyy-MM-dd HH:mm")
        return F.date_format(start, "yyyy-MM-dd HH:mm:ss")

    if freq is not None:
        return _wrap(mk(p["ordinal"], _norm_freq(freq)))
    return _wrap(_case_over_freqs(p, mk))


# -- spine ------------------------------------------------------------------

def period_range_struct(
    spark: SparkSession,
    start: str,
    end: str | None = None,
    periods: int | None = None,
    freq: str = "M",
):
    """``pd.period_range`` under the struct representation: a
    distributed ``spark.range`` over the ordinal interval (bounds
    computed driver-side with pandas' own Period so they are
    bit-identical to the reference), one struct row per period —
    a billion-period spine never touches the driver."""
    import pandas as pd

    from pandas_spark.frame import DataFrame

    f = _norm_freq(freq)
    pf = {"Y": "Y", "Q": "Q", "M": "M", "W": "W", "D": "D", "B": "B",
          "h": "h", "min": "min", "s": "s"}[f]
    lo = pd.Period(start, pf).ordinal
    if end is not None:
        hi = pd.Period(end, pf).ordinal
    elif periods is not None:
        hi = lo + int(periods) - 1
    else:
        raise ValueError("period_range_struct needs end= or periods=")
    sdf = spark.range(lo, hi + 1).select(
        F.struct(F.col("id").alias("ordinal"), F.lit(f).alias("freq")).alias("period")
    )
    return DataFrame(sdf)


class PeriodMethods:
    """``.period`` accessor on a struct(ordinal, freq) column — the
    PeriodProperties analog (reference core/indexes/accessors.py:
    PeriodProperties)."""

    __slots__ = ("_c",)

    def __init__(self, col: Column):
        self._c = col

    @property
    def ordinal(self):
        return _wrap(self._c["ordinal"])

    @property
    def freqstr(self):
        return _wrap(self._c["freq"])

    @property
    def start_time(self):
        return period_start_time(self._c)

    @property
    def end_time(self):
        return period_end_time(self._c)

    def to_timestamp(self, freq: str | None = None, how: str = "start"):
        return period_to_timestamp(self._c, freq, how)

    def asfreq(self, to_freq: str, how: str = "end"):
        return period_asfreq(self._c, to_freq, how=how)

    def strftime(self):
        return period_str(self._c)

    def __add__(self, n: int):
        return period_add(self._c, n)

    def __sub__(self, n: int):
        return period_add(self._c, -n)
