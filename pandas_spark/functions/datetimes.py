"""Datetime accessor + constructors: pandas ``.dt`` / to_datetime on Catalyst.

Reference: pandas/core/indexes/accessors.py:271 (DatetimeProperties),
pandas/core/tools/datetimes.py:767 (to_datetime), tools/numeric.py:51
(to_numeric), indexes/datetimes.py:1521 (date_range). Fields map to
built-in Catalyst datetime expressions; ``errors='coerce'`` maps to
``try_to_timestamp``/``try_cast`` (NULL on failure, like pandas NaT).
Timestamps are µs-precision session-TZ (ns→µs is the documented
divergence, SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pandas_spark import fshim as F  # backtick-safe F.col facade


class DatetimeMethods:
    __slots__ = ("_c",)

    def __init__(self, col: Column):
        self._c = col

    def _wrap(self, c: Column):
        from pandas_spark.expr import Expr

        return Expr(c)

    # -- fields ------------------------------------------------------------
    @property
    def year(self):         return self._wrap(F.year(self._c))
    @property
    def month(self):        return self._wrap(F.month(self._c))
    @property
    def day(self):          return self._wrap(F.dayofmonth(self._c))
    @property
    def hour(self):         return self._wrap(F.hour(self._c))
    @property
    def minute(self):       return self._wrap(F.minute(self._c))
    @property
    def second(self):       return self._wrap(F.second(self._c))
    @property
    def microsecond(self):
        return self._wrap((F.unix_micros(self._c.cast("timestamp")) % 1_000_000).cast("int"))
    @property
    def dayofweek(self):
        # pandas: Monday=0; Spark dayofweek: Sunday=1
        return self._wrap(((F.dayofweek(self._c) + 5) % 7).cast("int"))
    weekday = dayofweek
    @property
    def dayofyear(self):    return self._wrap(F.dayofyear(self._c))
    @property
    def quarter(self):      return self._wrap(F.quarter(self._c))
    @property
    def week(self):         return self._wrap(F.weekofyear(self._c))
    weekofyear = week
    @property
    def days_in_month(self):
        return self._wrap(F.dayofmonth(F.last_day(self._c)))
    daysinmonth = days_in_month
    @property
    def date(self):         return self._wrap(F.to_date(self._c))
    @property
    def time(self):
        return self._wrap(F.date_format(self._c, "HH:mm:ss"))
    @property
    def month_end(self):
        return self._wrap(F.last_day(self._c))
    @property
    def is_month_start(self):
        return self._wrap(F.dayofmonth(self._c) == 1)
    @property
    def is_month_end(self):
        return self._wrap(F.to_date(self._c) == F.last_day(self._c))
    @property
    def is_quarter_start(self):
        return self._wrap((F.dayofmonth(self._c) == 1) & F.month(self._c).isin([1, 4, 7, 10]))
    @property
    def is_quarter_end(self):
        return self._wrap(
            (F.to_date(self._c) == F.last_day(self._c)) & F.month(self._c).isin([3, 6, 9, 12])
        )
    @property
    def is_year_start(self):
        return self._wrap((F.dayofyear(self._c) == 1))
    @property
    def is_year_end(self):
        return self._wrap((F.month(self._c) == 12) & (F.dayofmonth(self._c) == 31))
    @property
    def is_leap_year(self):
        y = F.year(self._c)
        return self._wrap(((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0))

    def day_name(self, locale=None):
        """pandas ``dt.day_name()`` (reference datetimelike.py) —
        JVM date_format 'EEEE'. Non-default locales are declared out
        (Spark formats in the JVM default locale)."""
        if locale is not None:
            raise NotImplementedError("day_name(locale=) — JVM default locale only")
        return self._wrap(F.date_format(self._c, "EEEE"))

    def month_name(self, locale=None):
        """pandas ``dt.month_name()`` — JVM date_format 'MMMM'."""
        if locale is not None:
            raise NotImplementedError("month_name(locale=) — JVM default locale only")
        return self._wrap(F.date_format(self._c, "MMMM"))

    def isocalendar_week(self):
        return self._wrap(F.weekofyear(self._c))

    # -- ops -----------------------------------------------------------------
    _TRUNC_ALIAS = {
        "D": "day", "day": "day", "h": "hour", "H": "hour", "hour": "hour",
        "min": "minute", "T": "minute", "minute": "minute",
        "s": "second", "S": "second", "second": "second",
        "W": "week", "ME": "month", "M": "month", "MS": "month", "month": "month",
        "QE": "quarter", "Q": "quarter", "quarter": "quarter",
        "YE": "year", "Y": "year", "YS": "year", "year": "year",
    }

    def floor(self, freq: str):
        unit = self._TRUNC_ALIAS.get(freq, freq)
        return self._wrap(F.date_trunc(unit, self._c))

    def ceil(self, freq: str):
        unit = self._TRUNC_ALIAS.get(freq, freq)
        floored = F.date_trunc(unit, self._c)
        step = {"day": "1 day", "hour": "1 hour", "minute": "1 minute", "second": "1 second"}[unit]
        bumped = floored + F.expr(f"INTERVAL {step}")
        return self._wrap(F.when(self._c == floored, floored).otherwise(bumped))

    def round(self, freq: str):
        unit = self._TRUNC_ALIAS.get(freq, freq)
        secs = {"day": 86400, "hour": 3600, "minute": 60, "second": 1}[unit]
        epoch = F.unix_timestamp(self._c)
        rounded = F.bround(epoch / secs) * secs
        return self._wrap(F.timestamp_seconds(rounded.cast("long")))

    def normalize(self):
        return self._wrap(F.date_trunc("day", self._c))

    def strftime(self, fmt: str):
        # translate common C-strftime directives to JVM SimpleDateFormat
        trans = {
            "%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm",
            "%S": "ss", "%y": "yy", "%B": "MMMM", "%b": "MMM", "%A": "EEEE",
            "%a": "EEE", "%j": "DDD", "%U": "ww", "%p": "a",
        }
        out = fmt
        for k, v in trans.items():
            out = out.replace(k, v)
        return self._wrap(F.date_format(self._c, out))

    def to_period(self, freq: str = "M"):
        """``Series.dt.to_period`` -> struct(ordinal, freq) period value
        (reference core/arrays/datetimes.py:1179; representation in
        functions/periods.py)."""
        from pandas_spark.functions.periods import to_period

        return to_period(self._c, freq)

    def tz_localize(self, tz: str):
        return self._wrap(F.to_utc_timestamp(self._c, tz))

    def tz_convert(self, tz: str):
        return self._wrap(F.from_utc_timestamp(self._c, tz))

    # -- duration (DayTimeIntervalType) fields — pandas
    #    TimedeltaProperties (accessors.py:446); same ``.dt`` surface.
    #    Spark can't cast an ANSI interval straight to double, so total
    #    seconds is rebuilt from its extracted components (SECOND keeps
    #    the µs fraction); components are sign-consistent, so the sum
    #    is negative-safe.
    def _interval_seconds(self) -> Column:
        c = self._c
        return (
            F.extract(F.lit("DAY"), c).cast("double") * F.lit(86400.0)
            + F.extract(F.lit("HOUR"), c).cast("double") * F.lit(3600.0)
            + F.extract(F.lit("MINUTE"), c).cast("double") * F.lit(60.0)
            + F.extract(F.lit("SECOND"), c).cast("double")
        )

    def total_seconds(self):
        """pandas ``.dt.total_seconds()`` on a duration column."""
        return self._wrap(self._interval_seconds())

    def days(self):
        """Floor days, pandas ``.dt.days`` (negative-safe floor)."""
        return self._wrap(F.floor(self._interval_seconds() / F.lit(86400.0)).cast("long"))

    def seconds(self):
        """Seconds-within-day component in [0, 86400)."""
        total = self._interval_seconds()
        days = F.floor(total / F.lit(86400.0))
        return self._wrap((total - days * F.lit(86400.0)).cast("long"))


# -- constructors -------------------------------------------------------------

def to_datetime(col, fmt: str | None = None, errors: str = "raise"):
    """``pd.to_datetime`` on a column: errors='coerce' → try_to_timestamp."""
    from pandas_spark.expr import Expr, _unwrap

    c = _unwrap(col)
    if not isinstance(c, Column):
        c = F.lit(c)
    if errors == "coerce":
        out = F.try_to_timestamp(c, F.lit(fmt)) if fmt else F.try_to_timestamp(c)
    else:
        out = F.to_timestamp(c, fmt) if fmt else F.to_timestamp(c)
    return Expr(out)


def to_numeric(col, errors: str = "raise", downcast: str | None = None):
    from pandas_spark.expr import Expr, _unwrap

    c = _unwrap(col)
    target = {"integer": "long", "signed": "long", "unsigned": "long", "float": "double"}.get(
        downcast or "", "double"
    )
    out = c.try_cast(target) if errors == "coerce" else c.cast(target)
    return Expr(out)


_TD_UNITS = {
    # pandas unit aliases → seconds-per-unit (tools/timedeltas.py:54)
    "w": 604800.0, "week": 604800.0, "weeks": 604800.0,
    "d": 86400.0, "day": 86400.0, "days": 86400.0,
    "h": 3600.0, "hr": 3600.0, "hour": 3600.0, "hours": 3600.0,
    "m": 60.0, "min": 60.0, "minute": 60.0, "minutes": 60.0, "t": 60.0,
    "s": 1.0, "sec": 1.0, "second": 1.0, "seconds": 1.0,
    "ms": 1e-3, "milli": 1e-3, "millis": 1e-3, "milliseconds": 1e-3, "l": 1e-3,
    "us": 1e-6, "micro": 1e-6, "micros": 1e-6, "microseconds": 1e-6, "u": 1e-6,
}


def to_timedelta(value, unit: str = "s"):
    """``pd.to_timedelta`` (tools/timedeltas.py:54) → a
    ``DayTimeIntervalType`` expression — Spark's native duration type
    (arrays/timedeltas.py:134 maps the same way in the dtype bridge).

    * numeric column/Expr + ``unit`` → ``make_dt_interval`` seconds
      (µs-exact for any sane span);
    * a Python scalar (number or pandas-style string like
      ``'1 days 02:30:00'`` / ``'90min'``) → an interval literal,
      parsed driver-side by pandas itself.

    Intervals then work with the engine's native arithmetic:
    ``ts + td``, ``td * 2``, ``ts2 - ts1`` (already an interval),
    ``td.dt.total_seconds()``.
    """
    from pandas_spark.expr import Expr, _unwrap

    if isinstance(value, str):
        import pandas as pd

        td = pd.to_timedelta(value)
        return Expr(F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), F.lit(td.total_seconds())))
    if isinstance(value, (int, float)):
        secs = float(value) * _TD_UNITS[unit.lower()]
        return Expr(F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), F.lit(secs)))
    c = _unwrap(value)
    secs = c.cast("double") * F.lit(_TD_UNITS[unit.lower()])
    return Expr(F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), secs))


def timedelta_range(spark: SparkSession, start: str = "0s", periods: int = 10, freq: str = "1h"):
    """``pd.timedelta_range`` (indexes/datetimes.py:422 analog):
    distributed generation via ``spark.range`` — each row's ``td`` is
    start + i*freq as a DayTimeIntervalType column."""
    import pandas as pd

    from pandas_spark.frame import DataFrame

    start_s = pd.to_timedelta(start).total_seconds()
    freq_s = pd.to_timedelta(freq).total_seconds()
    sdf = spark.range(int(periods)).select(
        F.make_dt_interval(
            F.lit(0), F.lit(0), F.lit(0),
            F.lit(start_s) + F.col("id").cast("double") * F.lit(freq_s),
        ).alias("td")
    )
    return DataFrame(sdf)


def period_range(spark: SparkSession, start: str, end: str, freq: str = "M"):
    """``pd.period_range`` (indexes/datetimes.py:772 analog) under the
    trunc representation locked in SURVEY §1.3: a period IS its start
    timestamp plus the frequency tag, so the spine is period starts —
    ``sequence()`` + explode, distributed like ``date_range``. Columns:
    ``period_start`` (timestamp), ``period_end`` (exclusive)."""
    from pandas_spark.frame import DataFrame

    step = {
        "M": "interval 1 month", "Q": "interval 3 months", "Y": "interval 1 year",
        "A": "interval 1 year", "W": "interval 7 days", "D": "interval 1 day",
        "h": "interval 1 hour", "H": "interval 1 hour",
    }.get(freq, f"interval {freq}")
    trunc = {"M": "month", "Q": "quarter", "Y": "year", "A": "year",
             "W": "week", "D": "day", "h": "hour", "H": "hour"}.get(freq)
    s = F.lit(start).cast("timestamp")
    e = F.lit(end).cast("timestamp")
    if trunc:
        s, e = F.date_trunc(trunc, s), F.date_trunc(trunc, e)
    sdf = (
        spark.range(1)
        .select(F.explode(F.sequence(s, e, F.expr(step))).alias("period_start"))
        .select(
            "period_start",
            (F.col("period_start") + F.expr(step)).alias("period_end"),
        )
    )
    return DataFrame(sdf)


def interval_range(
    spark: SparkSession,
    start: float,
    end: float,
    periods: int,
):
    """``pd.interval_range`` numeric flavor (indexes/datetimes.py:1348
    analog): ``periods`` equal-width [left, right) bins as two double
    columns — generated distributed via ``spark.range`` so a
    billion-bin spine never materializes on the driver."""
    from pandas_spark.frame import DataFrame

    width = (float(end) - float(start)) / int(periods)
    sdf = spark.range(int(periods)).select(
        (F.lit(float(start)) + F.col("id").cast("double") * F.lit(width)).alias("left"),
        (F.lit(float(start)) + (F.col("id") + 1).cast("double") * F.lit(width)).alias("right"),
    )
    return DataFrame(sdf)


def date_range(spark: SparkSession, start: str, end: str, freq: str = "D"):
    """``pd.date_range`` → ``sequence()`` + explode — distributed generation."""
    from pandas_spark.frame import DataFrame

    step = {
        "D": "interval 1 day", "h": "interval 1 hour", "H": "interval 1 hour",
        "min": "interval 1 minute", "T": "interval 1 minute",
        "s": "interval 1 second", "W": "interval 7 days", "ME": "interval 1 month",
        "M": "interval 1 month", "YE": "interval 1 year",
    }.get(freq, f"interval {freq}")
    sdf = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("timestamp"),
                F.lit(end).cast("timestamp"),
                F.expr(step),
            )
        ).alias("ts")
    )
    return DataFrame(sdf)
