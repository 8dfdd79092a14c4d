"""Scale diagnostics: key-skew profiling before expensive shuffles.

A 100 TB join or aggregation lives or dies on its key distribution —
one hot key serializes a whole stage (the motivation for
``operators/joins.py salted_join`` and AQE skew splitting). These
helpers measure that distribution AS a Spark plan (one partial-agg
shuffle over the candidate key, then driver-size-bounded reductions),
so a pipeline can decide *before* the big shuffle whether to salt,
broadcast, or repartition.

pandas has no analog (single-process frames don't shuffle); the
closest reference surface is ``value_counts`` (base.py:834), which
``skew_report`` extends with the two ratios that matter for
partitioning decisions.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from pandas_spark.frame import DataFrame


def skew_report(
    frame: DataFrame,
    keys: str | Sequence[str],
    top_n: int = 20,
) -> DataFrame:
    """Heavy-hitter profile of a prospective shuffle/join key.

    Returns the ``top_n`` most frequent key values with:

    * ``cnt``   — rows carrying the key value
    * ``share`` — fraction of all rows (1.0 == every row is this key)
    * ``skew``  — cnt / mean-group-size; a key with ``skew`` ≈ k gets
      a partition k× the average — the number that says "salt this"

    Plan shape: ONE shuffle (partial-count then final over the keys —
    the same cost as ``value_counts``), then a two-row broadcast of the
    (total, n_groups) scalars and a top-n sort that TakeOrderedAndProject
    bounds at ``top_n`` rows per partition. No driver collect.

    Deterministic order: cnt desc, then key asc (ties at the cut line
    resolve identically in any engine).
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    counts = frame.spark.groupBy(*key_list).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("__total__"), F.count(F.lit(1)).alias("__groups__")
    )
    out = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *key_list,
            F.col("cnt"),
            (F.col("cnt") / F.col("__total__")).alias("share"),
            (
                F.col("cnt")
                * F.col("__groups__").cast("double")
                / F.col("__total__")
            ).alias("skew"),
        )
        .orderBy(F.col("cnt").desc(), *[F.col(k).asc() for k in key_list])
        .limit(top_n)
    )
    return DataFrame(out)


def key_distribution(
    frame: DataFrame,
    keys: str | Sequence[str],
    quantiles: Sequence[float] = (0.5, 0.9, 0.99, 1.0),
) -> DataFrame:
    """Group-size distribution summary for a candidate key: one row of
    (n_groups, mean_size, max_size, p50/p90/... of group sizes).

    The quantiles run over the already-reduced per-key counts (n_groups
    rows, not data rows), so the second aggregation is cheap at any
    data scale; ``percentile`` is exact.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    counts = frame.spark.groupBy(*key_list).agg(F.count(F.lit(1)).alias("cnt"))
    aggs = [
        F.count(F.lit(1)).alias("n_groups"),
        F.avg("cnt").alias("mean_size"),
        F.max("cnt").alias("max_size"),
    ]
    for q in quantiles:
        aggs.append(
            F.percentile(F.col("cnt"), F.lit(float(q))).alias(
                f"p{int(round(q * 100)):02d}_size"
            )
        )
    return DataFrame(counts.agg(*aggs))
