"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship TPC-H Q1-shaped query at sf0.001 through
the pandas_spark engine. ``queries()`` / ``oracle_sql()`` — one entry
per implemented operator family from SURVEY.md §2, defined in
``pandas_spark/suite.py`` (engine query + DuckDB oracle side by side).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pandas_spark import suite


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return suite.q1_groupby_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return suite.queries()


def oracle_sql() -> dict[str, str]:
    return suite.oracle_sql()
