"""Calendar DateOffset arithmetic: BusinessDay, anchored Month/Quarter
ends, anchored weekdays, bdate_range.

pandas implements these as scalar offset objects with per-element roll
rules (reference: pandas/_libs/tslibs/offsets.pyx:2633 BusinessDay,
:4680 MonthEnd, :4231 QuarterEnd, :5192 Week). The Spark-first design
(SURVEY §2.8) replaces per-element Python with a **generated calendar
dimension + broadcast joins**:

  * the calendar is a ``sequence()``-exploded date spine (~22k rows for
    1990-2050 — kilobytes, always broadcastable) carrying a business-day
    flag and a running business-day rank;
  * ``BusinessDay(n)`` becomes two broadcast hash joins: date → rank,
    rank+n → date. No shuffle of the fact table, no UDF, works for any
    holiday list (holidays just flip the flag before ranking);
  * anchored MonthEnd/QuarterEnd/Week compile to ``last_day`` /
    ``add_months`` / ``next_day`` Catalyst expressions directly.

At 100 TB the only cost is two broadcast joins against a dimension that
fits in L2 cache — the same shape a warehouse date-dimension join takes.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame as SparkDF, SparkSession, Window as W
from pandas_spark import fshim as F  # backtick-safe F.col facade

from pandas_spark.frame import DataFrame

DEFAULT_CAL_START = "1990-01-01"
DEFAULT_CAL_END = "2050-12-31"


def business_calendar(
    spark: SparkSession,
    start: str = DEFAULT_CAL_START,
    end: str = DEFAULT_CAL_END,
    holidays: Iterable[str] | None = None,
    week_mask: Sequence[int] = (2, 3, 4, 5, 6),  # Spark dayofweek: 1=Sun..7=Sat
) -> SparkDF:
    """(cal_date, is_bd, bday_rank) dimension. The running rank is a
    single-partition window — over a ~22k-row dimension, not data."""
    cal = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"), F.lit(end).cast("date"), F.expr("interval 1 day")
            )
        ).alias("cal_date")
    )
    is_bd = F.dayofweek(F.col("cal_date")).isin(list(week_mask))
    if holidays:
        hol = F.array(*[F.lit(h).cast("date") for h in holidays])
        is_bd = is_bd & ~F.array_contains(hol, F.col("cal_date"))
    cal = cal.withColumn("is_bd", is_bd)
    w = W.orderBy("cal_date").rowsBetween(W.unboundedPreceding, 0)
    return cal.withColumn("bday_rank", F.sum(F.col("is_bd").cast("long")).over(w))


def bday_shift(
    frame: DataFrame,
    col: str,
    periods: int,
    alias: str | None = None,
    holidays: Iterable[str] | None = None,
    cal_start: str = DEFAULT_CAL_START,
    cal_end: str = DEFAULT_CAL_END,
) -> DataFrame:
    """``ts + BusinessDay(n)`` (offsets.pyx:2633 semantics: from a
    business day move n business days; from a non-business day, +n
    rolls forward n business days and −n rolls back from the next one).

    Two broadcast joins against the calendar dim: date → (rank, is_bd),
    then target-rank → date."""
    name = alias or f"{col}_bshift"
    cal = business_calendar(frame.spark.sparkSession, cal_start, cal_end, holidays)
    c1 = F.broadcast(cal.select(
        F.col("cal_date").alias("__d1__"),
        F.col("is_bd").alias("__isbd__"),
        F.col("bday_rank").alias("__r1__"),
    ))
    bd_only = F.broadcast(
        cal.filter("is_bd").select(
            F.col("bday_rank").alias("__r2__"), F.col("cal_date").alias("__d2__")
        )
    )
    sdf = frame._sdf.withColumn("__key__", F.to_date(F.col(col)))
    j1 = sdf.join(c1, sdf["__key__"] == c1["__d1__"], "left")
    roll = F.lit(0) if periods >= 0 else F.when(~F.col("__isbd__"), F.lit(1)).otherwise(F.lit(0))
    target = F.col("__r1__") + F.lit(periods) + roll
    j1 = j1.withColumn("__rt__", target)
    out = (
        j1.join(bd_only, F.col("__rt__") == F.col("__r2__"), "left")
        .withColumn(name, F.col("__d2__"))
        .drop("__key__", "__d1__", "__isbd__", "__r1__", "__rt__", "__r2__", "__d2__")
    )
    return frame._with(out)


def bdate_range(
    spark: SparkSession,
    start: str,
    end: str,
    holidays: Iterable[str] | None = None,
) -> DataFrame:
    """``pd.bdate_range`` (indexes/datetimes.py:1810): the business-day
    date spine — generated distributed, filtered on the calendar flag."""
    cal = business_calendar(spark, start, end, holidays)
    return DataFrame(cal.filter("is_bd").select(F.col("cal_date").alias("ts")))


# -- anchored offsets (pure Catalyst expressions) ---------------------------

def month_end(col: Column, n: int = 1) -> Column:
    """``ts + MonthEnd(n)`` (offsets.pyx:4680): roll forward to the
    n-th month end; landing exactly on a month end consumes one step
    (pandas anchor semantics). n ≤ 0 rolls back symmetrically."""
    d = F.to_date(col)
    on_end = d == F.last_day(d)
    if n > 0:
        return F.when(on_end, F.last_day(F.add_months(d, n))).otherwise(
            F.last_day(F.add_months(d, n - 1))
        )
    return F.last_day(F.add_months(d, n))


def quarter_end(col: Column, n: int = 1) -> Column:
    """``ts + QuarterEnd(n)`` (offsets.pyx:4231): anchor to quarter
    ends (Mar/Jun/Sep/Dec month ends)."""
    d = F.to_date(col)
    q_end = F.last_day(F.make_date(F.year(d), F.quarter(d) * 3, F.lit(1)))
    on_end = d == q_end
    if n > 0:
        return F.when(on_end, F.last_day(F.add_months(q_end, 3 * n))).otherwise(
            F.last_day(F.add_months(q_end, 3 * (n - 1)))
        )
    return F.last_day(F.add_months(q_end, 3 * n))


def next_weekday(col: Column, day: str = "Mon") -> Column:
    """``ts + Week(weekday=...)`` roll-forward (offsets.pyx:5192) —
    Catalyst ``next_day``."""
    return F.next_day(F.to_date(col), day)
