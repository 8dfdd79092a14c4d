"""pandas_spark — a PySpark-native analytics engine with pandas' query surface.

A brand-new engine (NOT a port): pandas (reference at /root/reference,
see SURVEY.md) defines WHAT we compute — the operator inventory, the
missing-data semantics, the agg-spec language. HOW is Apache Spark:
every operator compiles to DataFrame/SQL plans that Catalyst optimizes
and Tungsten executes, so the same code that passes the sf0.01 oracle
runs on a 1000-executor cluster against 100 TB.

Design decisions (SURVEY.md §7.0):
  * no implicit index — engine frames are Spark DataFrames plus thin
    metadata (optional ``index_cols``, optional ``order_col``)
  * lazy by default; ``to_pandas()``/``collect()``/writes materialize
  * NaN→NULL at the boundary; ns→µs timestamps; categorical→string
"""

from pandas_spark import _driverpath

_driverpath.install()  # py4j handle caching — before any Column building

from pandas_spark.session import get_spark
from pandas_spark.expr import col, lit
from pandas_spark.frame import DataFrame
from pandas_spark.sources.io import (
    from_pandas,
    read_parquet,
    read_csv,
    read_fwf,
    read_json,
    read_orc,
    read_table,
)
from pandas_spark.operators.joins import merge, merge_asof, merge_ordered
from pandas_spark.operators.setops import concat
from pandas_spark.operators.reshape import (
    cat_codes,
    crosstab,
    cut,
    from_dummies,
    get_dummies,
    json_normalize,
    lreshape,
    melt,
    pivot_table,
    qcut,
    wide_to_long,
)
from pandas_spark.functions.datetimes import (
    date_range,
    interval_range,
    period_range,
    timedelta_range,
    to_datetime,
    to_numeric,
    to_timedelta,
)
from pandas_spark.functions.periods import (
    period_add,
    period_asfreq,
    period_diff,
    period_end_time,
    period_range_struct,
    period_start_time,
    period_str,
    period_to_timestamp,
    to_period,
)

__version__ = "0.1.0"

__all__ = [
    "DataFrame",
    "col",
    "lit",
    "concat",
    "crosstab",
    "cut",
    "date_range",
    "interval_range",
    "period_range",
    "period_range_struct",
    "to_period",
    "period_add",
    "period_asfreq",
    "period_diff",
    "period_end_time",
    "period_start_time",
    "period_str",
    "period_to_timestamp",
    "from_pandas",
    "from_dummies",
    "get_dummies",
    "json_normalize",
    "get_spark",
    "melt",
    "merge",
    "merge_asof",
    "merge_ordered",
    "pivot_table",
    "qcut",
    "read_csv",
    "read_fwf",
    "read_table",
    "read_json",
    "read_orc",
    "read_parquet",
    "timedelta_range",
    "to_datetime",
    "to_timedelta",
    "to_numeric",
    "wide_to_long",
]
