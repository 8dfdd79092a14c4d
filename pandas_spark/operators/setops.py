"""Set operations: pandas concat/combine/compare on Spark unions & joins.

``pd.concat(axis=0)`` (reference: pandas/core/reshape/concat.py:163)
aligns by column *name* with outer/inner column logic and dtype
promotion → ``unionByName(allowMissingColumns=True)``. ``axis=1``
aligns rows on the index → a full outer join on the index columns.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pandas_spark import fshim as F  # backtick-safe F.col facade

from pandas_spark.frame import DataFrame


def concat(
    frames: Sequence[DataFrame],
    axis: int = 0,
    join: str = "outer",
    ignore_index: bool = True,
    keys: Sequence | None = None,
    names: Sequence[str] | None = None,
) -> DataFrame:
    frames = list(frames)
    if not frames:
        raise ValueError("concat of empty sequence")
    if keys is not None and axis == 0:
        # concat(keys=) (reshape/concat.py:149): pandas builds an outer
        # MultiIndex level tagging each row's source frame; the no-index
        # analog is a literal label column (names[0] or 'key') — a
        # zero-cost map-side constant, partition-pruning-friendly when
        # the result is written partitioned by it
        if len(keys) != len(frames):
            raise ValueError("concat: len(keys) must equal len(frames)")
        label = (list(names) or ["key"])[0] if names else "key"
        frames = [
            DataFrame(f.spark.select(F.lit(k).alias(label), "*"))
            for k, f in zip(keys, frames)
        ]
    if axis == 0:
        if join == "inner":
            common = [c for c in frames[0].columns if all(c in f.columns for f in frames)]
            sdfs = [f.spark.select(*common) for f in frames]
            return DataFrame(reduce(lambda a, b: a.unionByName(b), sdfs))
        return DataFrame(
            reduce(
                lambda a, b: a.unionByName(b, allowMissingColumns=True),
                [f.spark for f in frames],
            )
        )
    if axis == 1:
        # align on index columns (explicit-index convention, SURVEY §7.0)
        base = frames[0]
        keys = list(base._index_cols)
        if not keys:
            raise ValueError("concat(axis=1) requires set_index() on all frames")
        how = "full" if join == "outer" else "inner"
        out = base.spark
        for f in frames[1:]:
            out = out.join(f.spark, on=keys, how=how)
        return DataFrame(out, index_cols=tuple(keys))
    raise ValueError(f"axis must be 0 or 1, got {axis}")


def combine_first(left: DataFrame, right: DataFrame) -> DataFrame:
    """Coalesce overlay by aligned cells (frame.py:12688)."""
    keys = list(left._index_cols)
    if not keys:
        raise ValueError("combine_first requires set_index()")
    lsdf = left.spark
    rsdf = right.spark.withColumnsRenamed(
        {c: "__r_" + c for c in right.columns if c not in keys}
    )
    j = lsdf.join(rsdf, keys, "full")
    cols = [F.col(k) for k in keys]
    for c in left.columns:
        if c in keys:
            continue
        rc = "__r_" + c
        cols.append(F.coalesce(F.col(c), F.col(rc)).alias(c) if rc in j.columns else F.col(c))
    for c in right.columns:
        if c in keys or c in left.columns:
            continue
        cols.append(F.col("__r_" + c).alias(c))
    return DataFrame(j.select(*cols), index_cols=tuple(keys))


def update(left: DataFrame, right: DataFrame, overwrite: bool = True) -> DataFrame:
    """pandas ``DataFrame.update`` (frame.py:9420): modify ``left`` in
    place with non-NA values from ``right``, aligned on the index.

    Keeps ``left``'s shape exactly (left join — rows only in ``right``
    are ignored, columns only in ``right`` are ignored).
    ``overwrite=True`` (default): right's non-NA values win;
    ``overwrite=False``: only fill holes in ``left``."""
    keys = list(left._index_cols)
    if not keys:
        raise ValueError("update requires set_index()")
    shared = [c for c in left.columns if c not in keys and c in right.columns]
    rsdf = right.spark.select(*keys, *[F.col(c).alias("__r_" + c) for c in shared])
    j = left.spark.join(rsdf, keys, "left")
    cols = []
    for c in left.columns:
        if c in shared:
            rc = F.col("__r_" + c)
            merged = F.coalesce(rc, F.col(c)) if overwrite else F.coalesce(F.col(c), rc)
            cols.append(merged.alias(c))
        else:
            cols.append(F.col(c))
    return DataFrame(j.select(*cols), index_cols=tuple(keys))


def combine(left: DataFrame, right: DataFrame, func, fill_value=None) -> DataFrame:
    """pandas ``DataFrame.combine`` (frame.py:12514): full outer align,
    then merge each shared column pair with ``func``.

    ``func`` takes two Column expressions and returns one (the engine's
    deferred-expression analog of pandas' Series function — e.g.
    ``lambda a, b: F.greatest(a, b)``). Columns present on one side
    only still go through ``func`` with the missing side as NULL
    (pandas applies func with the absent side as NaN). Deviation:
    pandas sorts the column union; we keep left's order then
    right-only columns, since Spark column order is explicit."""
    keys = list(left._index_cols)
    if not keys:
        raise ValueError("combine requires set_index()")
    rsdf = right.spark.withColumnsRenamed(
        {c: "__r_" + c for c in right.columns if c not in keys}
    )
    j = left.spark.join(rsdf, keys, "full")
    fill = (lambda c: F.coalesce(c, F.lit(fill_value))) if fill_value is not None else (lambda c: c)
    cols = [F.col(k) for k in keys]
    for c in left.columns:
        if c in keys:
            continue
        if "__r_" + c in j.columns:
            cols.append(func(fill(F.col(c)), fill(F.col("__r_" + c))).alias(c))
        else:
            cols.append(func(fill(F.col(c)), fill(F.lit(None))).alias(c))
    for c in right.columns:
        if c in keys or c in left.columns:
            continue
        cols.append(func(fill(F.lit(None)), fill(F.col("__r_" + c))).alias(c))
    return DataFrame(j.select(*cols), index_cols=tuple(keys))


def compare(left: DataFrame, right: DataFrame) -> DataFrame:
    """Cell-level diff of two aligned frames (frame.py:12343)."""
    keys = list(left._index_cols)
    if not keys:
        raise ValueError("compare requires set_index()")
    rsdf = right.spark.withColumnsRenamed(
        {c: "__r_" + c for c in right.columns if c not in keys}
    )
    j = left.spark.join(rsdf, keys, "full")
    cols = [F.col(k) for k in keys]
    diff_pred = None
    for c in left.columns:
        if c in keys:
            continue
        ne = ~F.col(c).eqNullSafe(F.col("__r_" + c))
        cols.append(F.when(ne, F.col(c)).alias(c + "_self"))
        cols.append(F.when(ne, F.col("__r_" + c)).alias(c + "_other"))
        diff_pred = ne if diff_pred is None else (diff_pred | ne)
    out = j.select(*cols)
    if diff_pred is not None:
        out = j.filter(diff_pred).select(*cols)
    return DataFrame(out, index_cols=tuple(keys))


def equals(left: DataFrame, right: DataFrame) -> bool:
    """Exact multiset equality via two-sided exceptAll (generic.py:1358)."""
    a, b = left.spark, right.spark
    if sorted(a.columns) != sorted(b.columns):
        return False
    b = b.select(*a.columns)
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
