"""Statistical expression templates matching pandas' formulas.

pandas and Spark disagree on several estimator conventions
(SURVEY.md §2.4): pandas ``skew``/``kurt`` are the bias-adjusted
sample statistics G1 / excess G2 (reference kernels:
pandas/_libs/groupby.pyx:1069 group_skew, :1139 group_kurt), while
Spark's ``F.skewness``/``F.kurtosis`` are population estimators.
``sem`` is stddev/sqrt(n). All are expressed here as compositions of
built-in aggregates — they stay inside Tungsten hash aggregation
(one pass, partial+final), no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def skew(col: str | Column) -> Column:
    """Bias-adjusted sample skewness G1 = g1 * sqrt(n(n-1))/(n-2).

    Computed from raw moments in one aggregation pass:
    m2 = E[x²]-E[x]², m3 = E[x³]-3E[x]E[x²]+2E[x]³.
    """
    c = (col if isinstance(col, Column) else F.col(col)).cast("double")
    n = F.count(c).cast("double")
    m1 = F.avg(c)
    m2r = F.avg(c * c)
    m3r = F.avg(c * c * c)
    m2 = m2r - m1 * m1
    m3 = m3r - 3 * m1 * m2r + 2 * m1 * m1 * m1
    g1 = m3 / F.pow(m2, 1.5)
    adj = F.sqrt(n * (n - 1)) / (n - 2)
    return F.when((n > 2) & (m2 > 0), adj * g1).otherwise(F.lit(None))


def kurt(col: str | Column) -> Column:
    """Bias-adjusted excess kurtosis G2 (pandas' formula).

    G2 = ((n+1)*g2 + 6) * (n-1)/((n-2)(n-3)) where g2 = m4/m2² - 3.
    """
    c = (col if isinstance(col, Column) else F.col(col)).cast("double")
    n = F.count(c).cast("double")
    m1 = F.avg(c)
    m2r = F.avg(c * c)
    m3r = F.avg(c * c * c)
    m4r = F.avg(c * c * c * c)
    m2 = m2r - m1 * m1
    m4 = m4r - 4 * m1 * m3r + 6 * m1 * m1 * m2r - 3 * m1 * m1 * m1 * m1
    g2 = m4 / (m2 * m2) - 3
    out = ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
    return F.when((n > 3) & (m2 > 0), out).otherwise(F.lit(None))


def sem(col: str | Column, ddof: int = 1) -> Column:
    """Standard error of the mean: std(ddof)/sqrt(count)."""
    c = col if isinstance(col, Column) else F.col(col)
    std = F.stddev_samp(c) if ddof == 1 else F.stddev_pop(c)
    return std / F.sqrt(F.count(c))


def mode_agg(col: str | Column) -> Column:
    """Most frequent value (ties → smallest, matching pandas sort)."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.mode(c)


def product(col: str | Column) -> Column:
    c = col if isinstance(col, Column) else F.col(col)
    return F.product(c)
