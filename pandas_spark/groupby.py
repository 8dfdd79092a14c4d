"""GroupBy: pandas' grouped-aggregation surface on Tungsten hash agg.

pandas factorizes keys to dense ids and runs one Cython kernel per
(func, dtype) (reference: pandas/core/groupby/ops.py:127
WrappedCythonOp, kernel table _CYTHON_FUNCTIONS:152). Spark's
``groupBy().agg()`` is the same physical shape — partial (map-side)
hash agg, shuffle on keys, final agg — chosen by Catalyst; our work is
the *spec translation layer* (SURVEY.md §3.1 step 2): pandas agg specs
(string names, dicts, named aggs) → Spark aggregate expressions with
pandas' output naming, plus formula shims (skew/kurt/sem/rank).

Group-wise *transforms* (cumsum, shift, rank, ffill, transform) compile
to window functions over ``partitionBy(keys)`` — no join-back needed.
Order-sensitive members (first/last/nth/cum*/shift) order by the
frame's order key (frame.py ordering layer).
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Sequence

from pyspark.sql import Column, Window as W
from pandas_spark import fshim as F  # backtick-safe F.col facade

from pandas_spark.dtypes import fcol as _fcol
from pandas_spark.dtypes import qi
from pandas_spark.expr import Expr
from pandas_spark.functions import stats

# string func name → builder(Column) -> Column
_AGG_FUNCS: dict[str, Callable[[Column], Column]] = {
    "sum": F.sum,
    "prod": F.product,
    "product": F.product,
    "mean": F.avg,
    "avg": F.avg,
    "median": F.median,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "size": lambda c: F.count(F.lit(1)),
    "nunique": F.countDistinct,
    "approx_nunique": F.approx_count_distinct,
    "var": F.var_samp,
    "std": F.stddev_samp,
    "sem": stats.sem,
    "skew": stats.skew,
    "kurt": stats.kurt,
    "kurtosis": stats.kurt,
    "any": lambda c: F.max(c.cast("boolean")),
    "all": lambda c: F.min(c.cast("boolean")),
    "first": lambda c: F.first(c, ignorenulls=True),
    "last": lambda c: F.last(c, ignorenulls=True),
    "mode": F.mode,
    "collect_list": F.collect_list,
    "collect_set": F.collect_set,
}

_CUM_FUNCS = {"cumsum", "cumprod", "cummin", "cummax", "cumcount"}


def _fname(f) -> str:
    return f if isinstance(f, str) else getattr(f, "__name__", "udf")

# For float/double inputs these aggregates go through the exact
# decimal-moment kernels (stats.exact_*): double summation is
# order-dependent across shuffle merges, so plain F.sum/avg/var are
# nondeterministic in the last bits — enough to flip fixed-decimal
# comparisons at money magnitudes. Integer/decimal inputs keep the
# plain builtins (already exact).
_EXACT_AGG: dict[str, Callable[[Column], Column]] = {
    "sum": stats.exact_sum,
    "mean": stats.exact_mean,
    "avg": stats.exact_mean,
    "var": stats.exact_var,
    "std": stats.exact_std,
    "sem": stats.exact_sem,
}
_FLOAT_TYPES = {"float", "double"}


# pandas identity elements for all-NaN groups (groupby sum/prod skipna
# over an empty set → 0/1; any/all over an empty set → False/True —
# reference core/groupby/groupby.py:3052). Spark aggregates return NULL
# for all-NULL input, so coalesce to the identity.
_AGG_EMPTY_IDENTITY: dict[str, Callable[[], Column]] = {
    "sum": lambda: F.lit(0),
    "prod": lambda: F.lit(1),
    "product": lambda: F.lit(1),
    "any": lambda: F.lit(False),
    "all": lambda: F.lit(True),
}


def resolve_agg(func: str, col: str, dtype: str | None = None,
                bounds: dict | None = None,
                alias: str | None = None) -> Column:
    """One pandas agg name + column → aliased Spark aggregate expression.

    ``dtype`` (Spark simple string) routes float/double columns to the
    deterministic decimal-moment kernels for sum/mean/var/std/sem.
    ``bounds`` (frame._bounds: {col: (lo, hi, nan_free)}, parquet
    footer proofs — see bounds.py) drops the kernels' non-finite
    gating when the column provably contains no ±inf / no NaN.

    The returned Column is a pure function of its arguments (the only
    bounds field read is ``bounds[col]``), so the handle is interned
    per session (_exprmemo): repeated builds of the same agg spec —
    every timed bench run, every call of a long-lived service — skip
    the expression-tree py4j construction entirely. ``alias`` bakes the
    output name into the memoized handle (an .alias() per build is one
    py4j round trip per aggregate).
    """
    from pandas_spark._exprmemo import memo_column

    b = (bounds or {}).get(col)
    return memo_column(
        ("resolve_agg", func, col, dtype, b, alias),
        lambda: (
            _resolve_agg_build(func, col, dtype, b).alias(alias)
            if alias is not None
            else _resolve_agg_build(func, col, dtype, b)
        ),
    )


def _resolve_agg_build(func: str, col: str, dtype: str | None,
                       b: tuple | None) -> Column:
    if dtype is not None and dtype in _FLOAT_TYPES and func in _EXACT_AGG:
        kw = {}
        if b is not None:
            lo, hi, nan_free = b
            if func in ("var", "std", "sem"):
                # these also fold c*c — the proof must cover the square
                m = max(abs(lo), abs(hi))
                if m * m < float("inf"):
                    kw = {"no_inf": True, "no_nan": nan_free}
            else:
                kw = {"no_inf": True, "no_nan": nan_free}
        # pass the NAME, not F.col: the exact kernels compile a plain
        # string column through their SQL-text twin (one F.expr parse
        # instead of ~20 Column-builder py4j round trips per aggregate
        # — measured 40% of resample_1h's plan-construction wall)
        expr = _EXACT_AGG[func](col, **kw)
    else:
        try:
            builder = _AGG_FUNCS[func]
        except KeyError:
            raise ValueError(f"unknown aggregation {func!r}") from None
        expr = builder(F.col(col))
    if func in _AGG_EMPTY_IDENTITY:
        expr = F.coalesce(expr, _AGG_EMPTY_IDENTITY[func]())
    return expr


class GroupBy:
    """Deferred grouped view (pandas' one lazy object — groupby/groupby.py:752)."""

    def __init__(
        self, frame, keys: Sequence[str], dropna: bool = True,
        sort: bool = True,
    ):
        self._frame = frame
        self._keys = list(keys)
        self._dropna = dropna
        # pandas sort= (groupby/groupby.py:——  default True): aggregated
        # results come back ordered by group key. The engine declares
        # that as LAZY order metadata on aggregate-shaped results
        # (_result keyed=True) — no physical sort until a consumption
        # boundary, where the usual footer-proven small-result rules
        # apply. sort=False is pandas' "first occurrence" order; the
        # engine leaves that UNDECLARED (documented divergence: at
        # cluster scale arrival order is partition order, and
        # reproducing first-occurrence order would force an order-id
        # min through every aggregate for a property sort=False users
        # explicitly opted out of caring about).
        self._sort = sort
        self._dtmap: dict[str, str] | None = None

    def rolling(self, window, **kwargs):
        """pandas ``groupby.rolling`` (reference groupby.py:3681) — the
        frame Rolling with this groupby's keys as ``by=``. NULL-key
        rows yield NULL (dropna parity via Rolling._mask_by)."""
        return self._frame.rolling(window, by=self._keys, **kwargs)

    def resample(self, rule: str, on: str):
        """pandas ``groupby().resample()`` (reference groupby.py:3591) —
        the frame Resampler with this groupby's keys as the extra
        grouping dimension. NULL-key rows are excluded first (groupby
        dropna parity; a pushdown-friendly filter, no extra pass)."""
        frame = self._frame
        if self._dropna:
            frame = frame._with(self._filter_dropped(frame._sdf))
        return frame.resample(rule, on, by=self._keys)

    @property
    def ngroups(self) -> int:
        """pandas ``GroupBy.ngroups`` (groupby.py:812) — distinct key
        count; one narrow countDistinct, scalar driver receipt."""
        sdf = self._filter_dropped(self._frame._sdf)
        return sdf.select(*self._keys).distinct().count()

    def get_group(self, key) -> "object":
        """pandas ``GroupBy.get_group`` (groupby.py:846): the rows of
        one group — a pushdown-friendly equality filter, no shuffle."""
        vals = [key] if not isinstance(key, (tuple, list)) else list(key)
        if len(vals) != len(self._keys):
            raise KeyError(f"get_group key arity {len(vals)} != {len(self._keys)} keys")
        cond = None
        for k, v in zip(self._keys, vals):
            t = F.col(k).eqNullSafe(F.lit(v))
            cond = t if cond is None else (cond & t)
        return self._frame._with(self._frame._sdf.filter(cond))

    def expanding(self, **kwargs):
        """pandas ``groupby.expanding`` (reference groupby.py:3720)."""
        return self._frame.expanding(by=self._keys, **kwargs)

    def ewm(self, **kwargs):
        """pandas ``groupby.ewm()`` (reference groupby.py:3743) — the
        frame Ewm accessor with this groupby's keys as ``by=``."""
        from pandas_spark.window import Ewm

        return Ewm(self._frame, by=self._keys, **kwargs)

    def ewm_mean(self, col: str, **kwargs):
        """pandas ``groupby.ewm().mean()`` — keyed ewm (window.ewm_mean
        with this groupby's keys)."""
        from pandas_spark.window import ewm_mean

        return ewm_mean(self._frame, col, by=self._keys, **kwargs)

    def _dt(self, col: str) -> str | None:
        if self._dtmap is None:
            self._dtmap = dict(self._frame.dtypes)
        return self._dtmap.get(col)

    def _resolve(self, func, col: str, alias: str | None = None) -> Column:
        """String agg name → builtin expression; callable → GROUPED_AGG
        pandas_udf (Series → scalar, Arrow-batched; SURVEY §2.11
        agg-UDAF; reference core/apply.py GroupByApply)."""
        if col not in self._frame.columns:
            # pandas KeyError (groupby/generic.py _aggregate) — before
            # r11 this surfaced as a raw Spark AnalysisException
            raise KeyError(f"Column(s) {[col]} do not exist")
        if callable(func) and not isinstance(func, str):
            from pandas_spark.functions import callables as C

            dtype = C.infer_scalar_dtype(func, self._frame._infer_sample()[col])
            out = C.grouped_agg_udf(func, dtype)(F.col(col))
            return out.alias(alias) if alias is not None else out
        return resolve_agg(func, col, self._dt(col), self._frame._bounds,
                           alias=alias)

    # -- plumbing -----------------------------------------------------------
    def _kcols(self) -> list[Column]:
        """Group keys as Columns via the shared literal-label builder
        (quotes dots/backticks) — pyspark's STRING-name APIs
        (groupBy/partitionBy/na.drop) parse attribute paths and
        reject/misread adversarial labels."""
        return [_fcol(k) for k in self._keys]

    def _drop_null_keys(self, sdf):
        """na.drop(subset=keys) twin that survives adversarial names."""
        from pandas_spark._planmemo import plan_memo

        cond = F.lit(True)
        for k in self._keys:
            cond = cond & _fcol(k).isNotNull()
        return plan_memo(
            sdf, "dropna_keys", tuple(self._keys), None,
            lambda: sdf.filter(cond),
        )

    def _source(self):
        sdf = self._frame._sdf
        if self._dropna and not all(
            k in self._frame._nonnull for k in self._keys
        ):
            # pandas drops NA group keys by default (frame.py:12936
            # dropna=); keys footer-PROVEN null-free skip the filter —
            # one fewer eagerly-analyzed Dataset per groupby build, and
            # the executed plan loses a no-op Filter
            sdf = self._drop_null_keys(sdf)
        return sdf

    def _grouped(self):
        return self._source().groupBy(*self._kcols())

    def _value_cols(self, numeric_only: bool = False) -> list[str]:
        num = {"tinyint", "smallint", "int", "bigint", "float", "double"}
        out = []
        for c, t in self._frame.dtypes:
            if c in self._keys:
                continue
            if numeric_only and t.split("(")[0] not in num:
                continue
            out.append(c)
        return out

    def _result(self, sdf, keyed: bool = True):
        """``keyed=True`` (aggregate-shaped results, one row per group)
        declares pandas' sort=True key order as lazy order metadata.
        Row-shaped results (nth/filter/apply) pass ``keyed=False`` —
        they preserve the source frame's own order in pandas, and a
        keys-only declared sort could permute rows WITHIN a group."""
        from pandas_spark.frame import DataFrame

        if keyed and self._sort:
            spec = tuple(
                (k, True, "last") for k in self._keys if k in sdf.columns
            )
            if spec:
                # one row per group ≤ input rows: the input's proven
                # row bound still bounds the result, so a footer-proven
                # small input keeps the NARROW coalesce(1) presentation
                # sort (no range exchange, no sampling job) — at 100 TB
                # the bound is absent/huge and the distributed range
                # sort correctly takes over
                return DataFrame(
                    sdf, sort_spec=spec, rows_max=self._frame._rows_max,
                    order_weak=True,
                )
        return DataFrame(sdf)

    # -- agg spec translation (SURVEY §3.1 step 2) -----------------------------
    def agg(self, spec=None, **named) -> Any:
        """pandas agg specs:

        * ``agg("sum")`` / ``agg(["sum", "max"])`` — apply to all value cols
        * ``agg({"col": "sum", "col2": ["min", "max"]})``
        * ``agg(revenue=("price", "sum"))`` — named aggregation
        """
        exprs: list[Column] = []
        if named:
            for out_name, pair in named.items():
                col, func = pair if isinstance(pair, tuple) else (pair, "sum")
                exprs.append(self._resolve(func, col, alias=out_name))
        elif isinstance(spec, str):
            for c in self._value_cols():
                exprs.append(resolve_agg(spec, c, self._dt(c), self._frame._bounds, alias=c))
        elif isinstance(spec, Mapping):
            for col, funcs in spec.items():
                if isinstance(funcs, str) or callable(funcs):
                    exprs.append(self._resolve(funcs, col, alias=col))
                else:
                    for f_ in funcs:
                        exprs.append(self._resolve(f_, col, alias=f"{col}_{_fname(f_)}"))
        elif isinstance(spec, (list, tuple)):
            for c in self._value_cols():
                for f_ in spec:
                    exprs.append(self._resolve(f_, c, alias=f"{c}_{_fname(f_)}"))
        elif isinstance(spec, (Expr, Column)):
            exprs.append(spec.spark if isinstance(spec, Expr) else spec)
        elif spec is None:
            raise ValueError("agg requires a spec or named aggregations")
        else:
            raise TypeError(f"unsupported agg spec {type(spec).__name__}")
        from pandas_spark._planmemo import plan_memo

        src = self._source()
        kcols = self._kcols()
        sdf = plan_memo(
            src, "groupby_agg", tuple(self._keys),
            kcols + exprs,
            lambda: src.groupBy(*kcols).agg(*exprs),
        )
        return self._result(sdf)

    aggregate = agg

    def rollup(self, spec=None, **named):
        """Hierarchical subtotals (Spark-native superset of pandas'
        ``pivot_table(margins=)`` — SURVEY §2.4 grouping sets): one
        pass computes every prefix level of the keys; NULL key = the
        subtotal row, exactly like SQL ROLLUP."""
        return self._grouping_sets("rollup", spec, named)

    def cube(self, spec=None, **named):
        """All key-combination subtotals (SQL CUBE)."""
        return self._grouping_sets("cube", spec, named)

    def _grouping_sets(self, kind: str, spec, named):
        exprs: list[Column] = []
        for out_name, pair in (named or {}).items():
            col, func = pair if isinstance(pair, tuple) else (pair, "sum")
            exprs.append(resolve_agg(func, col, self._dt(col), self._frame._bounds).alias(out_name))
        if spec:
            for col, funcs in dict(spec).items():
                for fn in [funcs] if isinstance(funcs, str) else list(funcs):
                    exprs.append(resolve_agg(fn, col, self._dt(col), self._frame._bounds).alias(f"{col}_{fn}"))
        src = self._source()
        grouped = src.rollup(*self._keys) if kind == "rollup" else src.cube(*self._keys)
        return self._result(grouped.agg(*exprs))

    # -- simple reductions -----------------------------------------------------
    def _simple(self, func: str, numeric_only: bool = True):
        cols = self._value_cols(numeric_only=numeric_only)
        exprs = [resolve_agg(func, c, self._dt(c), self._frame._bounds).alias(c) for c in cols]
        return self._result(self._grouped().agg(*exprs))

    def _min_count_agg(self, func: str, numeric_only: bool, min_count: int):
        """pandas ``min_count`` (groupby/groupby.py:3052 sum/prod): the
        aggregate is NULL for any group holding fewer than ``min_count``
        non-null values. One extra count per column inside the same
        Tungsten hash-agg pass — no second shuffle."""
        cols = self._value_cols(numeric_only=numeric_only)
        exprs = [
            F.when(
                F.count(F.col(c)) >= F.lit(min_count),
                resolve_agg(func, c, self._dt(c), self._frame._bounds),
            ).alias(c)
            for c in cols
        ]
        return self._result(self._grouped().agg(*exprs))

    def sum(self, numeric_only: bool = True, min_count: int = 0):
        if min_count > 0:
            return self._min_count_agg("sum", numeric_only, min_count)
        return self._simple("sum", numeric_only)

    def prod(self, numeric_only: bool = True, min_count: int = 0):
        if min_count > 0:
            return self._min_count_agg("prod", numeric_only, min_count)
        return self._simple("prod", numeric_only)
    def mean(self, numeric_only: bool = True):     return self._simple("mean", numeric_only)
    def median(self, numeric_only: bool = True):   return self._simple("median", numeric_only)
    def min(self, numeric_only: bool = False):     return self._simple("min", numeric_only)
    def max(self, numeric_only: bool = False):     return self._simple("max", numeric_only)
    def var(self, numeric_only: bool = True):      return self._simple("var", numeric_only)
    def std(self, numeric_only: bool = True):      return self._simple("std", numeric_only)
    def sem(self, numeric_only: bool = True):      return self._simple("sem", numeric_only)
    def skew(self, numeric_only: bool = True):     return self._simple("skew", numeric_only)
    def kurt(self, numeric_only: bool = True):     return self._simple("kurt", numeric_only)
    def count(self):                               return self._simple("count", numeric_only=False)
    def nunique(self):                             return self._simple("nunique", numeric_only=False)
    def any(self):                                 return self._simple("any", numeric_only=False)
    def all(self):                                 return self._simple("all", numeric_only=False)

    def size(self):
        return self._result(self._grouped().agg(F.count(F.lit(1)).alias("size")))

    def quantile(
        self,
        q: float = 0.5,
        numeric_only: bool = True,
        approx: bool = False,
        accuracy: int = 10_000,
    ):
        """Per-group quantile. ``approx=True`` opts into
        ``approx_percentile`` (Greenwald-Khanna sketch, relative error
        1/accuracy) — at 100 TB the exact percentile must buffer every
        group value per partial-agg; the sketch is O(accuracy·log n)
        memory and mergeable, the right default for interactive scans
        of giant groups (pandas has no analog; explicit opt-in keeps
        oracle parity for the default)."""
        cols = self._value_cols(numeric_only=numeric_only)
        if approx:
            exprs = [
                F.approx_percentile(F.col(c), F.lit(q), F.lit(accuracy)).alias(c)
                for c in cols
            ]
        else:
            # exact percentile with linear interpolation — pandas' default
            exprs = [F.percentile(F.col(c), F.lit(q)).alias(c) for c in cols]
        return self._result(self._grouped().agg(*exprs))

    def idxmin(self, value_col: str, index_col: str):
        return self._result(
            self._grouped().agg(F.min_by(index_col, value_col).alias(f"idxmin_{value_col}"))
        )

    def idxmax(self, value_col: str, index_col: str):
        return self._result(
            self._grouped().agg(F.max_by(index_col, value_col).alias(f"idxmax_{value_col}"))
        )

    def first(self, order_by: str | None = None):
        """Order-deterministic first (pandas group_nth kernel, groupby.pyx:1778)."""
        return self._nth_like(order_by, desc=False)

    def last(self, order_by: str | None = None):
        return self._nth_like(order_by, desc=True)

    def _nth_like(self, order_by: str | None, desc: bool):
        # min_by/max_by aggregation fast path (same plan upgrade as
        # drop_duplicates keep=first): partial+final agg with map-side
        # reduction, no per-task (key, order) sort + window pass.
        # Applies when the order is an explicit column (nulls-first
        # asc, Spark's default → encoded (isNotNull, v)) or an
        # all-ascending nulls-last frame sort spec (pandas rule →
        # encoded (isNull, v)). Ties resolve to the smallest full row
        # — deterministic under any partitioning.
        spec = self._frame._sort_spec
        if order_by or (spec and all(a and p == "last" for _, a, p in spec)):
            sdf = self._frame._sdf
            if self._dropna:
                sdf = self._drop_null_keys(sdf)
            cols = [c for c in self._frame.columns]
            if order_by:
                keyparts = [
                    F.struct(F.col(order_by).isNotNull().alias("n"), F.col(order_by).alias("v"))
                ]
                spec_cols = [order_by]
            else:
                keyparts = [
                    F.struct(F.col(c).isNull().alias("n"), F.col(c).alias("v"))
                    for c, _, _ in spec
                ]
                spec_cols = [c for c, _, _ in spec]
            from pandas_spark.dtypes import is_orderable

            tie_cols = [
                f.name
                for f in self._frame._sdf.schema.fields
                if f.name not in spec_cols and is_orderable(f.dataType)
            ]
            ord_key = F.struct(
                *[kp.alias(f"k{i}") for i, kp in enumerate(keyparts)],
                *[
                    F.struct(F.col(c).isNull().alias("n"), F.col(c).alias("v")).alias(f"t{i}")
                    for i, c in enumerate(tie_cols)
                ],
            )
            payload = F.struct(*[F.col(c) for c in cols])
            pick = F.max_by(payload, ord_key) if desc else F.min_by(payload, ord_key)
            out = (
                sdf.groupBy(*self._kcols())
                .agg(pick.alias("__p__"))
                .select("__p__.*")
            )
            return self._result(out)
        frame, order_exprs = self._frame._ordered(desc=desc)
        sdf = frame._sdf
        if self._dropna:
            sdf = self._drop_null_keys(sdf)
        w = W.partitionBy(*self._kcols()).orderBy(*order_exprs)
        out = (
            sdf.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .drop("__rn__")
        )
        from pandas_spark.frame import is_order_col

        internal = [c for c in out.columns if is_order_col(c)]
        return self._result(out.drop(*internal) if internal else out)

    def nth(self, n: int, order_by: str | None = None):
        if order_by:
            frame, order_exprs = self._frame, [F.col(order_by).asc()]
        else:
            frame, order_exprs = self._frame._ordered()
        sdf = frame._sdf
        if self._dropna:
            sdf = self._drop_null_keys(sdf)
        w = W.partitionBy(*self._kcols()).orderBy(*order_exprs)
        ns = [n] if isinstance(n, int) else list(n)
        pos = [k + 1 for k in ns if k >= 0]
        neg = [k for k in ns if k < 0]
        rn = F.row_number().over(w)
        conds = []
        if pos:
            conds.append(F.col("__rn__").isin(pos))
        if neg:
            # pandas negative nth counts from the group's end
            # (reference groupby.py GroupByNthSelector): 1-based row
            # rn matches k<0 when rn == cnt + k + 1
            conds.append(
                (F.col("__rn__") - F.col("__cnt__") - 1).isin(neg)
            )
        cond = conds[0]
        for c_ in conds[1:]:
            cond = cond | c_
        out = sdf.withColumn("__rn__", rn)
        if neg:
            out = out.withColumn(
                "__cnt__", F.count(F.lit(1)).over(self._part())
            )
        out = out.filter(cond).drop("__rn__", "__cnt__")
        from pandas_spark.frame import is_order_col

        internal = [c for c in out.columns if is_order_col(c)]
        return self._result(
            out.drop(*internal) if internal else out, keyed=False
        )

    def ohlc(self, col: str, order_by: str):
        w = W.partitionBy(*self._kcols()).orderBy(order_by)
        sdf = (
            self._source()
            .withColumn("__open__", F.first(col).over(w))
            .withColumn(
                "__close__",
                F.last(col).over(w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)),
            )
        )
        return self._result(
            sdf.groupBy(*self._kcols()).agg(
                F.first("__open__").alias("open"),
                F.max(col).alias("high"),
                F.min(col).alias("low"),
                F.first("__close__").alias("close"),
            )
        )

    def value_counts(self, subset: Sequence[str], normalize: bool = False):
        cols = list(subset)
        out = self._grouped_with(cols).agg(F.count("*").alias("count"))
        if normalize:
            w = W.partitionBy(*self._kcols())
            out = out.withColumn("proportion", F.col("count") / F.sum("count").over(w)).drop("count")
        return self._result(out, keyed=False)

    def _grouped_with(self, extra: list[str]):
        return self._source().groupBy(*self._kcols(), *[_fcol(c) for c in extra])

    def describe(self, col: str):
        c = F.col(col)
        floaty = self._dt(col) in _FLOAT_TYPES
        mean = stats.exact_mean(c) if floaty else F.avg(c)
        std = stats.exact_std(c) if floaty else F.stddev_samp(c)
        return self._result(
            self._grouped().agg(
                F.count(c).alias("count"),
                mean.alias("mean"),
                std.alias("std"),
                F.min(c).alias("min"),
                F.percentile(c, F.lit(0.25)).alias("p25"),
                F.percentile(c, F.lit(0.5)).alias("p50"),
                F.percentile(c, F.lit(0.75)).alias("p75"),
                F.max(c).alias("max"),
            )
        )

    def corr(self, x: str, y: str, method: str = "pearson"):
        """Per-group correlation (groupby.pyx corr analog).
        ``method='spearman'`` ranks within each group first (average
        ranks, pandas' tie rule) then computes Pearson on the ranks —
        the rank windows are KEYED (partitionBy group), so this scales
        to any group count, unlike the frame-level global variant."""
        if method == "spearman":
            sdf = self._source().filter(F.col(x).isNotNull() & F.col(y).isNotNull())
            ranked = {}
            for c in (x, y):
                w = W.partitionBy(*self._kcols()).orderBy(F.col(c).asc())
                ties = F.count(F.lit(1)).over(W.partitionBy(*self._kcols(), _fcol(c)))
                ranked[c] = (
                    F.rank().over(w).cast("double") + (ties.cast("double") - 1.0) / 2.0
                )
            sdf = sdf.select(
                *self._keys, ranked[x].alias("__rx__"), ranked[y].alias("__ry__")
            )
            out = sdf.groupBy(*self._kcols()).agg(
                stats.exact_corr("__rx__", "__ry__").alias("corr")
            )
            return self._result(out)
        if method == "kendall":
            # tau-b via Knight's O(n log n) mergesort kernel (reference
            # frame.py:15791 → nanops kendall; no scipy) — per-group
            # Arrow batches, keyed (scales to any group count; a group
            # fits one task, the same contract as groupby.apply)
            from pandas_spark.functions.stats import kendall_tau_np

            src = self._source().select(*self._keys, x, y)
            dt = dict(src.dtypes)
            schema = ", ".join(
                [f"{qi(k)} {dt[k]}" for k in self._keys] + ["`corr` double"]
            )
            keys = list(self._keys)

            def fn(pdf):
                out = pdf[keys].iloc[:1].copy()
                out["corr"] = kendall_tau_np(
                    pdf[x].to_numpy(dtype=float), pdf[y].to_numpy(dtype=float)
                )
                return out

            return self._result(src.groupBy(*keys).applyInPandas(fn, schema))
        if method != "pearson":
            raise NotImplementedError(f"corr method {method!r}")
        return self._result(self._grouped().agg(stats.exact_corr(x, y).alias("corr")))

    def cov(self, x: str, y: str):
        return self._result(self._grouped().agg(stats.exact_covar(x, y).alias("cov")))

    # -- window-compiled transforms (no join-back; SURVEY §2.4 transform) -------
    def _part(self) -> W:
        return W.partitionBy(*self._kcols())

    def _ordered_part(self, order_by: str | None = None):
        if order_by:
            # NULLS LAST: pandas order-sensitive groupby ops run after a
            # sort_values whose default puts NaN last; plain .asc() is
            # NULLS FIRST and flipped head()/cum* on outer-join residue
            # rows (fuzzer-found)
            return self._frame, W.partitionBy(*self._kcols()).orderBy(
                F.col(order_by).asc_nulls_last()
            )
        frame, order_exprs = self._frame._ordered()
        return frame, W.partitionBy(*self._kcols()).orderBy(*order_exprs)

    def _keys_nonnull(self):
        """All-group-keys-non-null predicate, or None when dropna=False.
        pandas' dropna=True (the default) excludes NULL-key rows from
        the group machinery; transform-shaped ops (cum*/shift/rank/
        fill/ngroup) KEEP those rows but emit NULL for them
        (groupby.ngroup docs; verified against pandas 2.2)."""
        if not self._dropna:
            return None
        cond = None
        for k in self._keys:
            t = F.col(k).isNotNull()
            cond = t if cond is None else (cond & t)
        return cond

    def _mask_dropped(self, val):
        cond = self._keys_nonnull()
        return val if cond is None else F.when(cond, val)

    def _filter_dropped(self, sdf):
        """Row-subset ops (head/tail/sample/topn) EXCLUDE NULL-key
        rows entirely under dropna=True, like their pandas twins."""
        cond = self._keys_nonnull()
        return sdf if cond is None else sdf.filter(cond)

    def transform(self, func, col: str, alias: str | None = None, dtype: str | None = None):
        """Broadcast an aggregate back to rows — a partition window, not
        a join. With a *callable*, runs the pandas-shaped
        ``transform(fn)`` (fn: Series → same-length Series or scalar)
        as ``applyInPandas`` per group — the result lands back on the
        group's own rows positionally, no join-back shuffle
        (reference groupby/groupby.py transform dispatch)."""
        name = alias or col
        if callable(func) and not isinstance(func, str):
            return self._transform_callable(func, col, name, dtype)
        builder = _AGG_FUNCS[func]
        out = self._frame._sdf.withColumn(name, builder(F.col(col)).over(self._part()))
        return self._frame._with(out)

    def _transform_callable(self, fn: Callable, col: str, name: str, dtype: str | None):
        import pandas as pd

        from pandas_spark.dtypes import to_spark_type
        from pandas_spark.frame import ORDER_COL, DataFrame
        from pandas_spark.functions import callables as C

        if dtype is None:
            sample = self._frame._infer_sample()[col]
            res = fn(sample)
            dtype = C._pandas_result_dtype(res if isinstance(res, pd.Series) else pd.Series([res]))
        # keep per-group row order stable for order-sensitive callables
        # (cumsum-like): sort each pandas batch by the frame's order
        sort_spec = self._frame._sort_spec
        frame = self._frame if sort_spec else self._frame._ensure_order()
        sdf = frame._sdf
        if self._dropna:
            sdf = self._drop_null_keys(sdf)
        schema_fields = [
            f for f in sdf.schema.fields if f.name != name
        ]
        from pyspark.sql import types as T

        schema = T.StructType(schema_fields).add(name, to_spark_type(dtype))
        keys = list(self._keys)

        def g(pdf: pd.DataFrame) -> pd.DataFrame:
            if sort_spec:
                cols = [c for c, _, _ in sort_spec]
                asc = [a for _, a, _ in sort_spec]
                pdf = pdf.sort_values(cols, ascending=asc, na_position=sort_spec[0][2])
            else:
                pdf = pdf.sort_values(ORDER_COL)
            out = pdf if name not in pdf.columns else pdf.drop(columns=[name])
            out = out.copy()
            out[name] = fn(pdf[col])
            return out

        out_sdf = sdf.groupBy(*keys).applyInPandas(g, schema)
        res = DataFrame(out_sdf, order_col=frame._order_col, index_cols=frame._index_cols, sort_spec=sort_spec)
        return res

    def cumsum(self, col: str, alias: str | None = None, order_by: str | None = None):
        from pandas_spark._planmemo import plan_memo

        frame, w = self._ordered_part(order_by)
        wf = w.rowsBetween(W.unboundedPreceding, 0)
        # pandas cum* leave NaN at missing rows while the running value
        # skips them (nanops skipna) — mask the window result
        val = self._mask_dropped(F.when(F.col(col).isNotNull(), F.sum(col).over(wf)))
        name = alias or col
        return frame._with(
            plan_memo(
                frame._sdf, "withColumn", name, (val,),
                lambda: frame._sdf.withColumn(name, val),
            )
        )

    def cummax(self, col: str, alias: str | None = None, order_by: str | None = None):
        frame, w = self._ordered_part(order_by)
        wf = w.rowsBetween(W.unboundedPreceding, 0)
        # pandas cum* leave NaN at missing rows while the running value
        # skips them (nanops skipna) — mask the window result
        val = self._mask_dropped(F.when(F.col(col).isNotNull(), F.max(col).over(wf)))
        return frame._with(frame._sdf.withColumn(alias or col, val))

    def cummin(self, col: str, alias: str | None = None, order_by: str | None = None):
        frame, w = self._ordered_part(order_by)
        wf = w.rowsBetween(W.unboundedPreceding, 0)
        # pandas cum* leave NaN at missing rows while the running value
        # skips them (nanops skipna) — mask the window result
        val = self._mask_dropped(F.when(F.col(col).isNotNull(), F.min(col).over(wf)))
        return frame._with(frame._sdf.withColumn(alias or col, val))

    def cumprod(self, col: str, alias: str | None = None, order_by: str | None = None):
        """exp(Σ log|x|) with sign/zero bookkeeping — no recursive expr needed."""
        frame, w = self._ordered_part(order_by)
        wf = w.rowsBetween(W.unboundedPreceding, 0)
        c = F.col(col).cast("double")
        logsum = F.sum(F.log(F.abs(F.nullif(c, F.lit(0))))).over(wf)
        zeros = F.sum(F.when(c == 0, 1).otherwise(0)).over(wf)
        negs = F.sum(F.when(c < 0, 1).otherwise(0)).over(wf)
        sign = F.when(negs % 2 == 0, 1.0).otherwise(-1.0)
        val = F.when(zeros > 0, F.lit(0.0)).otherwise(sign * F.exp(logsum))
        val = self._mask_dropped(F.when(c.isNotNull(), val))
        return frame._with(frame._sdf.withColumn(alias or col, val))

    def cumcount(self, alias: str = "cumcount", order_by: str | None = None,
                 ascending: bool = True):
        frame, w = self._ordered_part(order_by)
        if ascending:
            val = F.row_number().over(w) - 1
        else:
            # pandas cumcount(ascending=False) = cnt - 1 - position
            # (reference groupby.py cumcount) — one extra count over
            # the same partition, same single window pass
            val = (
                F.count(F.lit(1)).over(self._part())
                - F.row_number().over(w)
            )
        val = self._mask_dropped(val)
        return frame._with(frame._sdf.withColumn(alias, val))

    def ngroup(self, alias: str = "ngroup", ascending: bool = True):
        # nulls_last so NULL-key groups (masked to NULL under dropna)
        # never shift the numbering of real groups, matching pandas
        order = [
            (_fcol(k).asc_nulls_last() if ascending else _fcol(k).desc_nulls_last())
            for k in self._keys
        ]
        w = W.orderBy(*order)
        val = self._mask_dropped(F.dense_rank().over(w) - 1)
        return self._frame._with(self._frame._sdf.withColumn(alias, val))

    def shift(self, col: str, periods: int = 1, alias: str | None = None,
              order_by: str | None = None, fill_value=None):
        frame, w = self._ordered_part(order_by)
        # pandas fill_value= (groupby.shift): out-of-window slots take
        # the fill instead of NULL — F.lag's default argument, JVM-side
        val = self._mask_dropped(F.lag(col, periods, fill_value).over(w))
        return frame._with(frame._sdf.withColumn(alias or col, val))

    def diff(self, col: str, periods: int = 1, alias: str | None = None, order_by: str | None = None):
        frame, w = self._ordered_part(order_by)
        val = self._mask_dropped(F.col(col) - F.lag(col, periods).over(w))
        return frame._with(frame._sdf.withColumn(alias or col, val))

    def pct_change(self, col: str, periods: int = 1, alias: str | None = None, order_by: str | None = None):
        frame, w = self._ordered_part(order_by)
        prev = F.lag(col, periods).over(w)
        d = F.col(col) - prev
        # prev == 0: pandas float division gives ±inf (and NaN for 0/0,
        # which the NaN≡NULL data model maps to NULL); Spark's `/`
        # returns NULL on any zero denominator. The general branch is
        # pandas' own v/prev - 1, NOT (v-prev)/prev: for v == prev < 0
        # the difference form yields IEEE -0.0 where pandas yields 0.0
        # (fuzzer-found signed-zero divergence).
        val = F.when(
            prev == 0,
            F.when(d > 0, F.lit(float("inf")))
            .when(d < 0, F.lit(float("-inf")))
            .otherwise(F.lit(None).cast("double")),
        ).otherwise(F.col(col) / prev - 1)
        val = self._mask_dropped(val)
        return frame._with(frame._sdf.withColumn(alias or col, val))

    def ffill(self, col: str, alias: str | None = None, order_by: str | None = None,
              limit: int | None = None):
        """Per-group forward fill (groupby.pyx:545 group_fillna_indexer).
        ``limit`` caps the fill at that many consecutive NULLs after the
        last valid value (pandas limit semantics): the gap's first
        ``limit`` rows fill, the rest stay NULL."""
        frame, w = self._ordered_part(order_by)
        wf = w.rowsBetween(W.unboundedPreceding, 0)
        pv = F.last(col, ignorenulls=True).over(wf)
        if limit is None:
            return frame._with(frame._sdf.withColumn(alias or col, self._mask_dropped(pv)))
        sdf = frame._sdf.withColumn("__rn__", F.row_number().over(w))
        prn = F.last(
            F.when(F.col(col).isNotNull(), F.col("__rn__")), ignorenulls=True
        ).over(wf)
        filled = F.when(F.col(col).isNotNull(), F.col(col)).otherwise(
            F.when(F.col("__rn__") - prn <= F.lit(int(limit)), pv)
        )
        return frame._with(sdf.withColumn(alias or col, self._mask_dropped(filled)).drop("__rn__"))

    def bfill(self, col: str, alias: str | None = None, order_by: str | None = None,
              limit: int | None = None):
        """Per-group backward fill; ``limit`` caps consecutive fills
        before the next valid value (mirror of :meth:`ffill`)."""
        frame, w = self._ordered_part(order_by)
        wf = w.rowsBetween(0, W.unboundedFollowing)
        nv = F.first(col, ignorenulls=True).over(wf)
        if limit is None:
            return frame._with(frame._sdf.withColumn(alias or col, self._mask_dropped(nv)))
        sdf = frame._sdf.withColumn("__rn__", F.row_number().over(w))
        nrn = F.first(
            F.when(F.col(col).isNotNull(), F.col("__rn__")), ignorenulls=True
        ).over(wf)
        filled = F.when(F.col(col).isNotNull(), F.col(col)).otherwise(
            F.when(nrn - F.col("__rn__") <= F.lit(int(limit)), nv)
        )
        return frame._with(sdf.withColumn(alias or col, self._mask_dropped(filled)).drop("__rn__"))

    def rank(self, col: str, method: str = "average", ascending: bool = True,
             pct: bool = False, alias: str | None = None):
        """pandas rank methods (groupby.pyx:1910 group_rank).

        NULL/NaN keep a NULL rank and are excluded from both the rank
        numbering and the pct denominator (pandas na_option='keep'):
        nulls sort LAST in the window so non-null ranks are unaffected,
        and the rank expression itself is NULL for null values.
        """
        order = F.col(col).asc_nulls_last() if ascending else F.col(col).desc_nulls_last()
        w = W.partitionBy(*self._kcols()).orderBy(order)
        part = W.partitionBy(*self._kcols(), _fcol(col))
        if method == "min":
            r = F.rank().over(w).cast("double")
        elif method == "dense":
            r = F.dense_rank().over(w).cast("double")
        elif method == "first":
            r = F.row_number().over(w).cast("double")
        elif method == "max":
            r = (F.rank().over(w) + F.count("*").over(part) - 1).cast("double")
        elif method == "average":
            # min rank + (ties-1)/2
            r = F.rank().over(w) + (F.count("*").over(part) - 1) / 2.0
        else:
            raise ValueError(f"unknown rank method {method!r}")
        if pct:
            n = F.count(col).over(W.partitionBy(*self._kcols()))
            r = r / n
        name = alias or f"{col}_rank"
        r = self._mask_dropped(F.when(F.col(col).isNotNull(), r))
        return self._frame._with(self._frame._sdf.withColumn(name, r))

    def head(self, n: int = 5, order_by: str | None = None):
        frame, w = self._ordered_part(order_by)
        src = self._filter_dropped(frame._sdf).withColumn(
            "__rn__", F.row_number().over(w)
        )
        if n < 0:
            # pandas head(-k): all but the LAST k rows of each group
            # (reference groupby/groupby.py head) — needs the group
            # size alongside the row number, same window partition
            src = src.withColumn("__cnt__", F.count(F.lit(1)).over(self._part()))
            out = src.filter(F.col("__rn__") <= F.col("__cnt__") + n).drop(
                "__rn__", "__cnt__"
            )
        else:
            out = src.filter(F.col("__rn__") <= n).drop("__rn__")
        return frame._with(out)

    def nlargest(self, col: str, n: int = 5, keep: str = "first"):
        """SeriesGroupBy.nlargest (groupby/generic.py) — top-n rows per
        group by ``col``. ``keep='first'``/``'last'`` break value ties
        by the declared row order (row_number, forward/reverse);
        ``keep='all'`` keeps every row tied with the boundary (rank).
        One window over the group partition — the per-group analog of
        TakeOrderedAndProject."""
        return self._group_topn(col, n, keep, desc=True)

    def nsmallest(self, col: str, n: int = 5, keep: str = "first"):
        """SeriesGroupBy.nsmallest — bottom-n rows per group."""
        return self._group_topn(col, n, keep, desc=False)

    def _group_topn(self, col: str, n: int, keep: str, desc: bool):
        """pandas SelectNSeries.compute semantics per group (reference
        core/methods/selectn.py): missing rows — NULL *and* double NaN
        (Spark NaN is not NULL and sorts above every value) — are
        excluded from the value ranking but PAD each group's result in
        forward row order when the group has fewer than n non-null
        values. keep='all' ranks over the VALUE ordering only
        (tie-break exprs would degenerate rank into row_number and
        drop boundary ties) and, when non-null rows run out, returns
        ALL of the group's rows (selectn.py's findex rule)."""
        from pandas_spark.frame import _sort_key

        frame = self._frame
        missing = frame._missing_pred(col)
        raw = F.when(~missing, F.col(col))
        key = raw.desc_nulls_last() if desc else raw.asc_nulls_last()
        if keep in ("first", "last"):
            # one window: non-null block ordered by value (declared row
            # order breaks ties, reversed for 'last'), then the missing
            # block in FORWARD row order (pandas pads positionally
            # regardless of keep) — row_number <= n is exactly
            # concat([selected, nan_index])[:n] per group.
            this, rev_pairs = frame._order_pairs(desc=(keep == "last"))
            _, fwd_pairs = this._order_pairs(False)
            sel_tie = [_sort_key(F.when(~missing, c), a, p) for c, a, p in rev_pairs]
            pad_tie = [_sort_key(F.when(missing, c), a, p) for c, a, p in fwd_pairs]
            w = W.partitionBy(*self._kcols()).orderBy(
                missing.asc(), key, *sel_tie, *pad_tie
            )
            out = (
                self._filter_dropped(this._sdf)
                .withColumn("__rn__", F.row_number().over(w))
                .filter(F.col("__rn__") <= n)
                .drop("__rn__")
            )
            return this._with(out)
        if keep != "all":
            raise ValueError(f"keep must be 'first', 'last' or 'all', got {keep!r}")
        w = W.partitionBy(*self._kcols()).orderBy(missing.asc(), key)
        nonnull = F.sum(F.when(~missing, F.lit(1)).otherwise(F.lit(0))).over(
            W.partitionBy(*self._kcols())
        )
        out = (
            self._filter_dropped(frame._sdf)
            .withColumn("__rk__", F.rank().over(w))
            .withColumn("__nn__", nonnull)
            .filter((~missing & (F.col("__rk__") <= n)) | (F.col("__nn__") < n))
            .drop("__rk__", "__nn__")
        )
        return frame._with(out)

    def sample(
        self,
        n: int | None = None,
        frac: float | None = None,
        seed=None,
        id_col: str | None = None,
        weights: str | None = None,
    ):
        """pandas ``groupby.sample`` (reference groupby.py:5622).

        With ``id_col``, sampling is DETERMINISTIC: rows are ranked
        per group by ``md5(seed || id)`` — an order reproducible
        across reruns, retries, and engines (the oracle recomputes it
        row-for-row), unlike Spark's ``sampleBy`` RNG, whose stream
        depends on partitioning. ``n=`` keeps exactly min(n, group
        size) rows per group via a hash-rank window; ``frac=`` keeps
        an id-hash bucket share, map-only (no shuffle at all).

        Without ``id_col``, falls back to Spark's per-group Bernoulli
        RNG (``frac`` only)."""
        if weights is not None and id_col is None:
            # mirror frame.sample's misuse error instead of silently
            # returning a uniform sample (advisor-found)
            raise ValueError("groupby.sample(weights=) requires id_col=")
        if id_col is not None:
            h = F.md5(F.concat(F.lit(str(seed if seed is not None else "")),
                               F.col(id_col).cast("string")))
            if weights is not None:
                # per-group Efraimidis–Spirakis (same key algebra as
                # frame.sample(weights=)): ln(u)/w rank within group
                if n is None:
                    raise ValueError("groupby.sample(weights=) requires n=")
                u = (
                    F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint").cast("double")
                    + F.lit(0.5)
                ) / F.lit(float(1 << 60))
                wcol = F.col(weights).cast("double")
                key = F.log(u) / wcol
                w = W.partitionBy(*self._kcols()).orderBy(key.desc(), F.col(id_col).asc())
                out = (
                    self._filter_dropped(self._frame._sdf)
                    .filter(wcol.isNotNull() & (wcol > 0))
                    .withColumn("__rn__", F.row_number().over(w))
                    .filter(F.col("__rn__") <= n)
                    .drop("__rn__")
                )
                return self._frame._with(out)
            if n is not None:
                w = W.partitionBy(*self._kcols()).orderBy(h.asc(), F.col(id_col).asc())
                out = (
                    self._filter_dropped(self._frame._sdf)
                    .withColumn("__rn__", F.row_number().over(w))
                    .filter(F.col("__rn__") <= n)
                    .drop("__rn__")
                )
                return self._frame._with(out)
            if frac is not None:
                bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % 10_000
                return self._frame._with(
                    self._filter_dropped(self._frame._sdf).filter(
                        bucket < int(round(frac * 10_000))
                    )
                )
            raise ValueError("sample requires n or frac")
        if frac is None and n is None:
            raise ValueError("sample requires n or frac")
        # RNG path, pandas semantics (exact count per group, without
        # replacement): rank rows by rand(seed) inside each group and
        # keep the first n (or round(frac·group_size)). ONE window
        # shuffle, no driver collect at any key cardinality — the
        # previous sampleBy path collected the DISTINCT KEY SET to the
        # driver, O(groups) memory, the exact unbounded-collect pattern
        # this engine bans. The draw depends on Spark's
        # partition-seeded RNG stream, so it is run-reproducible only
        # under a fixed partitioning; pass id_col for the cross-engine
        # deterministic path.
        part = W.partitionBy(*self._kcols())
        w = part.orderBy(F.rand(seed if seed is not None else 0).asc())
        cap = (
            F.lit(n)
            if n is not None
            # bround = HALF_EVEN, matching pandas' Python round(frac*len)
            # (banker's rounding); F.round's HALF_UP gave groups landing
            # exactly on .5 one extra row vs pandas.
            else F.bround(F.count(F.lit(1)).over(part) * F.lit(float(frac)))
        )
        out = (
            self._filter_dropped(self._frame._sdf)
            .withColumn("__rn__", F.row_number().over(w))
            .withColumn("__cap__", cap)
            .filter(F.col("__rn__") <= F.col("__cap__"))
            .drop("__rn__", "__cap__")
        )
        return self._frame._with(out)

    def tail(self, n: int = 5, order_by: str | None = None):
        if order_by:
            # exact reverse of head's asc_nulls_last (NULL rows are the
            # tail of the pandas sort order, so they lead the reverse)
            frame, order_exprs = self._frame, [F.col(order_by).desc_nulls_first()]
        else:
            frame, order_exprs = self._frame._ordered(desc=True)
        w = W.partitionBy(*self._kcols()).orderBy(*order_exprs)
        src = self._filter_dropped(frame._sdf).withColumn(
            "__rn__", F.row_number().over(w)
        )
        if n < 0:
            # pandas tail(-k): all but the FIRST k rows of each group —
            # under the reversed ordering that is rn <= cnt + n
            src = src.withColumn("__cnt__", F.count(F.lit(1)).over(self._part()))
            out = src.filter(F.col("__rn__") <= F.col("__cnt__") + n).drop(
                "__rn__", "__cnt__"
            )
        else:
            out = src.filter(F.col("__rn__") <= n).drop("__rn__")
        return frame._with(out)

    def filter(self, cond: Column | Expr | str, agg_exprs: Mapping[str, Column] | None = None):
        """Keep groups satisfying a predicate over group aggregates.

        ``gb.filter("cnt > 10", {"cnt": F.count('*')})`` — the aggregates are
        computed as partition windows, then rows filtered (no join-back).
        """
        sdf = self._source()
        w = self._part()
        for name, expr in (agg_exprs or {}).items():
            sdf = sdf.withColumn(name, expr.over(w))
        cond_c = cond.spark if isinstance(cond, Expr) else (F.expr(cond) if isinstance(cond, str) else cond)
        out = sdf.filter(cond_c).drop(*list((agg_exprs or {}).keys()))
        return self._result(out, keyed=False)

    # -- UDF surface (SURVEY §2.11) ----------------------------------------------
    def get_group(self, key):
        """One group as a frame (groupby.py:549) — a key filter."""
        vals = key if isinstance(key, (tuple, list)) else [key]
        cond = None
        for k, v in zip(self._keys, vals):
            term = F.col(k).eqNullSafe(F.lit(v))
            cond = term if cond is None else (cond & term)
        return self._frame.filter(cond)

    def pipe(self, fn: Callable, *args, **kwargs):
        return fn(self, *args, **kwargs)

    def apply_in_pandas(self, fn: Callable, schema):
        """pandas ``groupby.apply`` ≙ Spark ``applyInPandas`` (exact model match)."""
        # keyed=False: pandas apply concatenates group results in key
        # order but PRESERVES the fn's row order within each group — a
        # keys-only declared sort could permute within-group rows
        return self._result(self._grouped().applyInPandas(fn, schema), keyed=False)

    apply = apply_in_pandas

    def pivot(self, pivot_col: str, values: Sequence | None = None):
        g = self._grouped().pivot(pivot_col, list(values) if values else None)
        return _PivotedGroupBy(g)


class _PivotedGroupBy:
    def __init__(self, grouped):
        self._g = grouped

    def agg(self, *exprs):
        from pandas_spark.frame import DataFrame

        return DataFrame(self._g.agg(*[e.spark if isinstance(e, Expr) else e for e in exprs]))

    def sum(self, col: str):
        from pandas_spark.frame import DataFrame

        return DataFrame(self._g.sum(col))
