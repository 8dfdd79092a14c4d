"""Arbitrary-callable UDF surface: pandas' escape hatches on Arrow.

pandas lets any Python callable into the engine at five altitudes —
``DataFrame.apply(axis=1)``, ``Series.apply`` / ``Series.map``,
``groupby.agg(callable)``, ``groupby.transform(callable)`` and
``rolling.apply`` (reference: core/apply.py:915 FrameApply, :1654
SeriesApply; series.py:4889 Series.map; window/aggregations.pyx:1696
roll_apply). Spark equivalents, all Arrow-batched (never row-at-a-time
pickling):

  * row-wise apply     → ``mapInPandas`` (one pandas batch per Arrow
    chunk; the callable runs via ``DataFrame.apply`` inside the batch)
  * elementwise apply  → scalar ``pandas_udf`` wrapping ``Series.map``
  * agg(callable)      → GROUPED_AGG ``pandas_udf`` (Series → scalar,
    partial-agg-free but shuffles only the group rows, like pandas)
  * transform(callable)→ ``applyInPandas`` per group, result joined
    back positionally inside the batch (no join-back shuffle)
  * rolling.apply      → JVM ``collect_list`` over the window frame +
    ONE vectorized pandas_udf over the array column — the window
    machinery (rows/range frames, groups, min_periods) stays in
    Catalyst; Python sees one ndarray per row, exactly pandas'
    ``raw=True`` contract.

Result-schema inference mirrors pandas/pyspark.pandas: when ``dtype``
is not given, the callable runs on a small driver-side sample
(``limit(INFER_SAMPLE)``) and the result's pandas dtype maps through
the dtype bridge. Pass ``dtype`` explicitly to skip the sample job —
recommended in production pipelines.
"""

from __future__ import annotations

from typing import Any, Callable

import pandas as pd

from pyspark.sql import Column, DataFrame as SparkDF
from pandas_spark import fshim as F  # backtick-safe F.col facade

from pandas_spark.dtypes import to_spark_type

INFER_SAMPLE = 100


def infer_series_dtype(fn: Callable, sample: pd.Series) -> str:
    """Result dtype of an elementwise callable, from a driver sample."""
    if len(sample) == 0:
        return "double"
    out = sample.map(fn)
    return _pandas_result_dtype(out)


def infer_row_apply_dtype(fn: Callable, sample: pd.DataFrame) -> str:
    if len(sample) == 0:
        return "double"
    out = sample.apply(fn, axis=1)
    return _pandas_result_dtype(out)


def infer_scalar_dtype(fn: Callable, sample: pd.Series) -> str:
    """Result dtype of a Series→scalar reducer, from a driver sample."""
    if len(sample) == 0:
        return "double"
    return _pandas_result_dtype(pd.Series([fn(sample)]))


def _pandas_result_dtype(s: pd.Series) -> str:
    name = str(s.dtype)
    if name == "object":
        non_null = s.dropna()
        if len(non_null) and all(isinstance(v, str) for v in non_null):
            return "string"
        return "string"
    return str(to_spark_type(name).simpleString())


def elementwise_udf(fn: Callable, dtype: str, na_action: str | None = None) -> Callable[[Column], Column]:
    """Series.apply / Series.map(callable) as a scalar pandas_udf."""

    @F.pandas_udf(dtype)
    def _u(s: pd.Series) -> pd.Series:
        return s.map(fn, na_action=na_action)

    return _u


def grouped_agg_udf(fn: Callable, dtype: str):
    """agg(callable): Series → scalar as a GROUPED_AGG pandas_udf.

    The wrapper's type hints (Series → float-like scalar) select
    Spark's grouped-aggregate eval type regardless of how the user's
    callable is annotated.
    """

    def _wrapped(v: pd.Series) -> float:  # hint shape picks GROUPED_AGG
        return fn(v)

    return F.pandas_udf(_wrapped, dtype)


def row_apply(sdf: SparkDF, fn: Callable, alias: str, dtype: str) -> SparkDF:
    """DataFrame.apply(axis=1): mapInPandas keeping every input column
    and appending the callable's result."""
    from pyspark.sql import types as T

    # copy: StructType.add mutates in place, and sdf.schema is cached
    schema = T.StructType(list(sdf.schema.fields)).add(alias, to_spark_type(dtype))

    def gen(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[alias] = pdf.apply(fn, axis=1) if len(pdf) else pd.Series([], dtype="object")
            yield pdf

    from pandas_spark.dtypes import safe_map_in_pandas

    return safe_map_in_pandas(sdf, gen, schema)


def window_array_udf(fn: Callable, dtype: str, raw: bool = True):
    """rolling.apply kernel: one window-array in, one scalar out,
    vectorized over the whole Arrow batch."""
    import numpy as np

    @F.pandas_udf(dtype)
    def _u(arrays: pd.Series) -> pd.Series:
        def one(a):
            if a is None:
                return None
            return fn(np.asarray(a) if raw else pd.Series(a))

        return arrays.map(one)

    return _u
