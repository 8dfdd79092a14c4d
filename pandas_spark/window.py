"""Sliding windows: pandas rolling/expanding/ewm/resample on Spark frames.

pandas computes per-row [start,end) bounds then runs O(n) kernels
(reference: pandas/core/indexers/objects.py FixedWindowIndexer:108 /
VariableWindowIndexer:158; kernels _libs/window/aggregations.pyx).
Spark's window frames are the same model declared declaratively:

  rolling(n)        → rowsBetween(-(n-1), 0)
  rolling('10s')    → rangeBetween(-10s_µs, 0) over orderBy(ts µs)
  expanding()       → rowsBetween(unboundedPreceding, 0)
  groupby rolling   → + partitionBy(keys)

``min_periods`` guards with a count-over-frame when(). ``ewm`` is
recursive — inexpressible as a frame aggregate — so it runs as an
Arrow-batched ``applyInPandas`` per group (SURVEY §2.5 plan (a));
the un-keyed variant documents its single-partition constraint.

resample(freq) is a tumbling event-time window: groupBy(window(ts)).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, Window as W
from pandas_spark import fshim as F  # backtick-safe F.col facade
from pandas_spark.dtypes import qi

from pandas_spark.dtypes import epoch_micros
from pandas_spark.frame import DataFrame

_AGGS = {
    "sum": F.sum,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "median": F.median,
    "std": F.stddev_samp,
    "var": F.var_samp,
    "first": lambda c: F.first(c, ignorenulls=True),
    "last": lambda c: F.last(c, ignorenulls=True),
}

_FREQ_SECONDS = {
    "s": 1, "sec": 1, "second": 1, "seconds": 1,
    "min": 60, "T": 60, "minute": 60, "minutes": 60,
    "h": 3600, "H": 3600, "hour": 3600, "hours": 3600,
    "D": 86400, "day": 86400, "days": 86400,
    "W": 604800,
}


def get_window_weights(win_type: str, m: int, **kwargs) -> list[float]:
    """scipy-style taper generation (reference window/rolling.py:862
    delegates to scipy.signal.get_window; formulas reproduced here with
    numpy so the engine has no scipy dependency — symmetric variants,
    matching scipy's ``sym=True``, which is what pandas requests).

    Supported: boxcar, triang, bartlett, hamming, hann, blackman,
    gaussian (requires ``std=``), exponential (``tau=``, center=...).
    """
    import numpy as np

    wt = win_type.lower()
    if m <= 0:
        return []
    if wt == "boxcar":
        w = np.ones(m)
    elif wt == "triang":
        # scipy.signal.windows.triang sym=True
        n = np.arange(1, (m + 1) // 2 + 1)
        if m % 2 == 0:
            half = (2 * n - 1.0) / m
            w = np.concatenate([half, half[::-1]])
        else:
            half = 2 * n / (m + 1.0)
            w = np.concatenate([half, half[-2::-1]])
    elif wt == "bartlett":
        w = np.bartlett(m)
    elif wt == "hamming":
        w = np.hamming(m)
    elif wt in ("hann", "hanning"):
        w = np.hanning(m)
    elif wt == "blackman":
        w = np.blackman(m)
    elif wt == "gaussian":
        if "std" not in kwargs:
            raise ValueError("win_type='gaussian' requires std=")
        std = float(kwargs["std"])
        n = np.arange(m) - (m - 1) / 2.0
        w = np.exp(-(n**2) / (2.0 * std * std))
    elif wt == "exponential":
        tau = float(kwargs.get("tau", 1.0))
        center = kwargs.get("center")
        c = (m - 1) / 2.0 if center is None else float(center)
        n = np.arange(m)
        w = np.exp(-np.abs(n - c) / tau)
    else:
        raise ValueError(
            f"unsupported win_type {win_type!r}; supported: boxcar, triang, "
            "bartlett, hamming, hann, blackman, gaussian(std=), exponential(tau=)"
        )
    return [float(x) for x in w]


def parse_offset_seconds(freq: str) -> int:
    """'10s' / '5min' / '1h' / '2D' → seconds."""
    import re

    m = re.fullmatch(r"(\d+)?\s*([a-zA-Z]+)", freq.strip())
    if not m:
        raise ValueError(f"cannot parse frequency {freq!r}")
    n = int(m.group(1) or 1)
    unit = m.group(2)
    if unit not in _FREQ_SECONDS:
        raise ValueError(f"unsupported frequency unit {unit!r}")
    return n * _FREQ_SECONDS[unit]


# --- calendar-anchored frequencies (pandas core/resample.py:2402
#     TimeGrouper; _libs/tslibs/offsets.pyx Week:5192 / MonthEnd:4680) ----

_WEEK_DOW = {"MON": 1, "TUE": 2, "WED": 3, "THU": 4, "FRI": 5, "SAT": 6, "SUN": 7}
_MONTH_NUM = {
    "JAN": 1, "FEB": 2, "MAR": 3, "APR": 4, "MAY": 5, "JUN": 6,
    "JUL": 7, "AUG": 8, "SEP": 9, "OCT": 10, "NOV": 11, "DEC": 12,
}


class AnchoredRule:
    """A parsed calendar-anchored resample frequency.

    ``kind`` ∈ {'month_end', 'month_start', 'week'};
    ``p`` = period width in months (1/3/12) for the month kinds;
    ``m`` = anchor month (the period's END month for month_end —
    QE-DEC → 12 — or its START month for month_start — QS-OCT → 10);
    ``dow`` = ISO day-of-week (Mon=1..Sun=7) for week rules.
    ``end_anchored`` drives the pandas closed/label defaults
    (right/right for ME/QE/YE/W, left/left otherwise —
    reference core/resample.py:2404)."""

    __slots__ = ("kind", "p", "m", "dow", "end_anchored")

    def __init__(self, kind: str, p: int = 1, m: int = 12, dow: int = 7):
        self.kind = kind
        self.p = p
        self.m = m
        self.dow = dow
        self.end_anchored = kind in ("month_end", "week")


_ANCHOR_BASE = {
    # alias → (kind, months-per-period, default anchor month).
    # Deprecated aliases M/Q/Y/A are NOT accepted: current pandas
    # raises "Invalid frequency: M" for resample (reference
    # tests/resample test_resample_M_Q_Y_raises) — they fall through
    # to the fixed-width parser, which raises the same way.
    "ME": ("month_end", 1, 1),
    "QE": ("month_end", 3, 12),
    "YE": ("month_end", 12, 12),
    "MS": ("month_start", 1, 1),
    "QS": ("month_start", 3, 1),
    "YS": ("month_start", 12, 1),
}


def parse_anchored(freq: str) -> "AnchoredRule | None":
    """'ME' / 'QS-OCT' / 'W' / 'W-WED' → AnchoredRule; None if the rule
    is not calendar-anchored (fixed-width rules fall through to
    ``parse_offset_seconds``). Multiples ('2W', '3ME') raise — their
    bins are origin-dependent and out of scope (loud, not silent)."""
    import re

    mm = re.fullmatch(r"(\d+)?\s*([A-Za-z]+)(?:-([A-Za-z]{3}))?", freq.strip())
    if not mm:
        return None
    n, base, suffix = int(mm.group(1) or 1), mm.group(2), mm.group(3)
    # exact-case alias match: 'ms' is MILLISECONDS, 'MS' is month-start
    is_week = base == "W"
    if base not in _ANCHOR_BASE and not is_week:
        return None
    if n != 1:
        raise NotImplementedError(
            f"resample({freq!r}): multiples of calendar-anchored frequencies "
            "are not supported (origin-dependent bins); use n=1 anchored or a "
            "fixed-width rule"
        )
    if is_week:
        # pandas 'W' == 'W-SUN' (offsets.pyx:5192 Week). The rolling
        # path still treats 'W' as a fixed 7-day width
        # (pd.Timedelta('W') semantics) — only resample routes here.
        if suffix is None:
            return AnchoredRule("week", dow=7)
        if suffix.upper() not in _WEEK_DOW:
            raise ValueError(f"unknown weekday anchor in {freq!r}")
        return AnchoredRule("week", dow=_WEEK_DOW[suffix.upper()])
    kind, p, m = _ANCHOR_BASE[base]
    if suffix is not None:
        if suffix.upper() not in _MONTH_NUM:
            raise ValueError(f"unknown month anchor in {freq!r}")
        if p == 1:
            raise ValueError(f"month anchor suffix invalid on {base!r} ({freq!r})")
        m = _MONTH_NUM[suffix.upper()]
    return AnchoredRule(kind, p=p, m=m)


class Rolling:
    """pandas ``rolling`` (reference window/rolling.py). Documented
    divergence: pandas' online rolling kernels treat ±inf as missing
    (a numerical-stability artifact of the subtract-add streaming
    sum — rolling.mean over a window containing -inf yields NaN and
    rolling.apply never sees the row); the engine's window aggregates
    follow IEEE (-inf propagates), which is the exact result."""

    def __init__(
        self,
        frame: DataFrame,
        window,
        on: str | None = None,
        by: Sequence[str] | None = None,
        min_periods: int | None = None,
        center: bool = False,
        closed: str | None = None,
        win_type: str | None = None,
        step: int | None = None,
        forward: bool = False,
    ):
        self._frame = frame
        self._window = window
        self._on = on
        self._by = list(by or [])
        self._center = center
        # Custom BaseIndexer escape hatch (reference
        # core/indexers/objects.py:21, round-9 verdict #4): a
        # user-pluggable bound generator is row-at-a-time Python BY
        # CONSTRUCTION (pandas runs get_window_bounds over the whole
        # array), so it executes as per-group pandas via applyInPandas
        # — bit-exact pandas semantics, with an explicit scale
        # warning. Library-served shapes stay declarative: pandas'
        # only stdlib subclass, FixedForwardWindowIndexer, is the
        # `forward=` Catalyst path (objects.py:429).
        self._indexer = window if hasattr(window, "get_window_bounds") else None
        if self._indexer is not None:
            if win_type or forward:
                raise ValueError(
                    "a BaseIndexer window cannot combine with win_type=/forward="
                )
            if step is not None:
                raise NotImplementedError(
                    "step= with a BaseIndexer window is not supported; "
                    "filter positions after the rolling instead"
                )
            self._mp_arg, self._closed_arg = min_periods, closed
        # pandas rolling(step=k): evaluate at every k-th FRAME position
        # (reference window/rolling.py:158 validates step; groupby
        # rolling rejects it — same here). Positional by definition.
        if step is not None and (not isinstance(step, int) or step < 1):
            raise ValueError(f"step must be a positive int, got {step!r}")
        if step is not None and by:
            raise NotImplementedError("step= is not supported with by= (pandas parity)")
        self._step = step
        # forward=True is the engine spelling of pandas'
        # FixedForwardWindowIndexer(window_size=n): frame [i, i+n-1]
        # (reference indexers/objects.py:205). Only fixed int windows.
        if forward and (not isinstance(window, int) or center or win_type):
            raise ValueError("forward=True needs a plain fixed int window")
        self._forward = forward
        if win_type is not None and not isinstance(window, int):
            raise ValueError("win_type requires a fixed int window")
        self._win_type = win_type
        if closed not in (None, "right", "left", "both", "neither"):
            raise ValueError(f"closed must be right/left/both/neither, got {closed!r}")
        self._closed = closed or "right"

        if self._closed == "neither" and window == 1:
            # pandas returns all-NaN here (an empty window every row);
            # Spark cannot declare an empty rows frame — fail loudly
            # rather than with an opaque AnalysisException
            raise ValueError(
                "window=1 with closed='neither' selects no rows "
                "(pandas yields all-NaN); use a larger window"
            )
        if isinstance(window, int):
            self._min_periods = min_periods if min_periods is not None else window
        else:
            self._min_periods = min_periods if min_periods is not None else 1

    def _spec(self, frame: DataFrame):
        if isinstance(self._window, int):
            n = self._window
            if self._forward:
                # FixedForwardWindowIndexer: [i, i+n-1]
                lo, hi = 0, n - 1
            elif self._center:
                lo, hi = -(n // 2), n - 1 - n // 2
            else:
                # pandas closed= endpoint rules for fixed windows
                # (window/rolling.py:140 area; indexers/objects.py:108):
                # right (default) [i-n+1, i]; left [i-n, i-1];
                # both [i-n, i] (n+1 rows); neither [i-n+1, i-1]
                lo, hi = -(n - 1), 0
                if self._closed in ("left", "both"):
                    lo -= 1
                if self._closed in ("left", "neither"):
                    hi -= 1
            base = W.partitionBy(*self._by) if self._by else W.partitionBy()
            if self._on:
                return base.orderBy(F.col(self._on).asc()).rowsBetween(lo, hi)
            _, order_exprs = frame._ordered()
            return base.orderBy(*order_exprs).rowsBetween(lo, hi)
        # time-offset window over the timestamp in microseconds
        if not self._on:
            raise ValueError("time-based rolling requires on=<timestamp col>")
        span = parse_offset_seconds(self._window) * 1_000_000
        base = W.partitionBy(*self._by) if self._by else W.partitionBy()
        # closed= on the range frame: endpoints in µs around
        # [t-span, t]; right (default) excludes the left edge, both
        # includes both, left excludes the current-time edge, neither
        # excludes both edges (window/rolling.py closed semantics)
        lo = -span + 1 if self._closed in ("right", "neither") else -span
        hi = 0 if self._closed in ("right", "both") else -1
        return base.orderBy(epoch_micros(F.col(self._on))).rangeBetween(lo, hi)


    def _mask_by(self, val):
        """NULL-key rows yield NULL under per-group rolling — pandas
        groupby(dropna=True) excludes the NaN group, so its transforms
        are NaN there (fuzzer-found parity; same rule as
        groupby._mask_dropped)."""
        if not self._by:
            return val
        cond = F.lit(True)
        for k in self._by:
            cond = cond & F.col(k).isNotNull()
        return F.when(cond, val)

    def _apply(self, func: str, col: str, alias: str | None):
        if self._indexer is not None:
            return self._apply_indexer(func, col, alias)
        frame = self._frame if (self._on or isinstance(self._window, str)) else self._frame._ensure_order()
        w = self._spec(frame)
        name = alias or f"{col}_{func}"
        if func == "median":
            # median is not frame-legal in Spark windows; compose it
            # from the sorted frame values (pandas skiplist kernel
            # analog, O(w log w) per row — SURVEY §4 caveat)
            arr = F.sort_array(F.collect_list(F.col(col)).over(w))
            n = F.size(arr)
            lo = F.element_at(arr, F.floor((n + 1) / 2).cast("int"))
            hi = F.element_at(arr, F.floor((n + 2) / 2).cast("int"))
            val = F.when(n > 0, (lo + hi) / 2.0)
        elif func == "sem":
            # std error of the mean (window/rolling.py sem): s / sqrt(n),
            # both frame-legal aggregates — one window pass
            val = F.stddev_samp(F.col(col)).over(w) / F.sqrt(
                F.count(F.col(col)).over(w)
            )
        else:
            val = _AGGS[func](F.col(col)).over(w)
        if self._min_periods and self._min_periods > 1:
            cnt = F.count(F.col(col)).over(w)
            val = F.when(cnt >= self._min_periods, val)
        from pandas_spark._planmemo import plan_memo

        mval = self._mask_by(val)
        out = frame._with(
            plan_memo(
                frame._sdf, "withColumn", name, (mval,),
                lambda: frame._sdf.withColumn(name, mval),
            )
        )
        if self._step:
            # keep frame positions 0, step, 2·step, … (pandas step=
            # semantics — positional, so this is a whole-frame ordered
            # pass, the same documented class as take/iloc)
            from pandas_spark.dtypes import free_name
            from pandas_spark.frame import _warn_unkeyed_window

            _warn_unkeyed_window("rolling(step=)")
            # _ordered() may materialize the order key into a NEW
            # frame (on=/time-offset windows never ran _ensure_order);
            # build the stepped plan from THAT frame, or the order
            # expressions reference a column the plan doesn't have
            src, order_exprs = out._ordered()
            pos_tag = free_name(src._sdf.columns, "__pos__")
            stepped = (
                src._sdf.withColumn(
                    pos_tag, F.row_number().over(W.orderBy(*order_exprs)) - 1
                )
                .filter((F.col(pos_tag) % self._step) == 0)
                .drop(pos_tag)
            )
            out = src._with(stepped)
        return out

    def _apply_indexer(self, func: str, col: str, alias: str | None):
        """Arbitrary ``BaseIndexer`` windows (reference
        core/indexers/objects.py:21): per-group pandas rolling via
        applyInPandas — the indexer's ``get_window_bounds`` runs
        inside pandas itself, so semantics are bit-exact by
        construction. Scale: with ``by=`` each group is one pandas
        frame (parallel across groups, group must fit a worker);
        without ``by=`` the WHOLE frame gathers to one task — the
        documented whole-frame-ordered class (same as take/iloc),
        escalated by strict-scale mode."""
        import pandas as pd

        from pandas_spark.dtypes import fcol as _fc
        from pandas_spark.frame import (
            DataFrame, ORDER_COL, _warn_unkeyed_window,
        )

        if not self._by:
            _warn_unkeyed_window("rolling(BaseIndexer)")
        name = alias or f"{col}_{func}"
        frame = self._frame if self._frame._sort_spec else self._frame._ensure_order()
        sort_spec = frame._sort_spec
        sdf = frame._sdf
        out_fields = [f for f in sdf.schema.fields if f.name != name]
        from pyspark.sql import types as T

        out_schema = T.StructType(list(out_fields)).add(name, T.DoubleType())
        indexer, mp, center = self._indexer, self._mp_arg, self._center
        closed, by = self._closed_arg, list(self._by)

        def g(pdf: pd.DataFrame) -> pd.DataFrame:
            if sort_spec:
                cols = [c for c, _, _ in sort_spec]
                asc = [a for _, a, _ in sort_spec]
                pdf = pdf.sort_values(cols, ascending=asc,
                                      na_position=sort_spec[0][2])
            else:
                pdf = pdf.sort_values(ORDER_COL)
            out = pdf if name not in pdf.columns else pdf.drop(columns=[name])
            out = out.copy()
            r = pdf[col].rolling(indexer, min_periods=mp, center=center,
                                 closed=closed)
            vals = getattr(r, func)()
            if by and len(pdf) and any(pd.isna(pdf.iloc[0][k]) for k in by):
                # pandas groupby(dropna=True) parity: NULL-key group
                # rows transform to NaN (Rolling._mask_by twin)
                vals = vals * float("nan")
            out[name] = vals.astype("float64")
            return out

        if by:
            out_sdf = sdf.groupBy(*[_fc(k) for k in by]).applyInPandas(g, out_schema)
        else:
            # one synthetic constant group = the whole frame in one
            # pandas batch (Spark 4 rejects a bare literal in groupBy
            # as an unresolved ordinal — use a materialized column)
            from pandas_spark.dtypes import free_name

            tag = free_name(sdf.columns, "__g__")

            def g_all(pdf: pd.DataFrame) -> pd.DataFrame:
                return g(pdf.drop(columns=[tag]))

            out_sdf = (
                sdf.withColumn(tag, F.lit(1))
                .groupBy(tag)
                .applyInPandas(g_all, out_schema)
            )
        return DataFrame(out_sdf, order_col=frame._order_col,
                         index_cols=frame._index_cols, sort_spec=sort_spec)

    def weighted_mean(self, col: str, weights, alias: str | None = None):
        """Weighted rolling mean (pandas ``win_type`` windows,
        window/rolling.py:862 — scipy supplies the weight shape there;
        here the caller passes the weight vector explicitly, or uses
        ``rolling(win_type=...)`` to have the engine generate it via
        ``get_window_weights``). Σw_i·x_i / Σw_i over FULL windows only
        (pandas' default min_periods == window emits NaN until the
        frame fills) — a dot-product via array HOFs over the collected
        frame, no UDF."""
        return self._weighted_dot(col, list(weights), alias or f"{col}_wmean", True)

    def _weighted_dot(self, col: str, weights: list, name: str, normalize: bool):
        if not isinstance(self._window, int) or len(weights) != self._window:
            raise ValueError("weighted window needs an int window matching len(weights)")
        frame = self._frame if self._on else self._frame._ensure_order()
        w = self._spec(frame)
        warr = F.array(*[F.lit(float(x)) for x in weights])
        arr = F.collect_list(F.col(col)).over(w)
        dot = F.aggregate(
            F.zip_with(arr, warr, lambda x, wt: x * wt),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        val = dot / F.lit(float(sum(weights))) if normalize else dot
        val = F.when(F.size(arr) == self._window, val)
        return frame._with(frame._sdf.withColumn(name, self._mask_by(val)))

    def _win_type_agg(self, col: str, alias: str | None, func: str, win_kwargs):
        weights = get_window_weights(self._win_type, self._window, **win_kwargs)
        return self._weighted_dot(
            col, weights, alias or f"{col}_{func}", normalize=(func == "mean")
        )

    def apply(self, fn, col: str, alias: str | None = None, dtype: str = "double", raw: bool = True):
        """``rolling.apply(fn)`` — arbitrary callable over each window
        (reference window/aggregations.pyx:1696 roll_apply; pandas
        always returns float64, hence the ``double`` default).

        The window machinery stays in Catalyst: ``collect_list`` over
        the declared frame materializes each row's window array
        JVM-side (rows/range frames, groups, min_periods all reuse the
        same specs as the builtin aggs), then ONE vectorized pandas_udf
        maps ``fn`` over the array column — Python sees an ndarray per
        row (``raw=True``) or a Series (``raw=False``), exactly
        pandas' contract. Nulls are absent from the array
        (collect_list skips them — fillna first if ``fn`` must see
        them); min_periods counts non-null, like pandas.

        Scale note: cost is O(window) array per row — same asymptotics
        as pandas' roll_apply; partitioning follows ``by=`` keys, so
        the plan parallelizes per group exactly like the builtin path.
        """
        frame = self._frame if (self._on or isinstance(self._window, str)) else self._frame._ensure_order()
        w = self._spec(frame)
        from pandas_spark.functions import callables as C

        name = alias or f"{col}_apply"
        arr = F.collect_list(F.col(col)).over(w)
        val = C.window_array_udf(fn, dtype, raw)(arr)
        if self._min_periods and self._min_periods > 1:
            cnt = F.count(F.col(col)).over(w)
            val = F.when(cnt >= self._min_periods, val)
        return frame._with(frame._sdf.withColumn(name, self._mask_by(val)))

    def quantile(
        self,
        col: str,
        q: float,
        alias: str | None = None,
        interpolation: str = "linear",
    ):
        """``rolling.quantile(q)`` (reference
        _libs/window/aggregations.pyx:1404 roll_quantile; API
        window/rolling.py:1955 area): quantile of the non-null window
        values with pandas' interpolation modes.

        Spark has no frame-legal exact-quantile aggregate, so this
        composes it from the sorted frame array (the same pattern as
        rolling median above): O(w log w) per row — identical
        asymptotics to pandas' skiplist kernel. Stays fully JVM-side
        (sort_array + element_at), no UDF."""
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile q must be in [0, 1], got {q}")
        frame = self._frame if (self._on or isinstance(self._window, str)) else self._frame._ensure_order()
        w = self._spec(frame)
        name = alias or f"{col}_q{q}"
        arr = F.sort_array(F.collect_list(F.col(col)).over(w))
        n = F.size(arr)
        h = (n - 1).cast("double") * F.lit(float(q))
        lo_i = F.floor(h).cast("int")
        hi_i = F.ceil(h).cast("int")
        lo = F.element_at(arr, lo_i + 1).cast("double")
        hi = F.element_at(arr, hi_i + 1).cast("double")
        if interpolation == "linear":
            val = lo + (h - lo_i.cast("double")) * (hi - lo)
        elif interpolation == "lower":
            val = lo
        elif interpolation == "higher":
            val = hi
        elif interpolation == "midpoint":
            val = (lo + hi) / 2.0
        elif interpolation == "nearest":
            val = F.when(h - lo_i.cast("double") < 0.5, lo).otherwise(hi)
        else:
            raise ValueError(f"unsupported interpolation {interpolation!r}")
        val = F.when(n > 0, val)
        if self._min_periods and self._min_periods > 1:
            cnt = F.count(F.col(col)).over(w)
            val = F.when(cnt >= self._min_periods, val)
        return frame._with(frame._sdf.withColumn(name, self._mask_by(val)))

    def rank(
        self,
        col: str,
        alias: str | None = None,
        method: str = "average",
        ascending: bool = True,
        pct: bool = False,
    ):
        """``rolling.rank()`` (reference aggregations.pyx:1528
        roll_rank): rank of the CURRENT row's value among the non-null
        window values, ties by ``method`` (average/min/max), optional
        percentile form.

        A frame aggregate can't see the current row, so the window
        array is collected once and the comparisons run as array HOFs
        against the current value — lt/le counts give all three tie
        methods in closed form. JVM-side, no UDF, O(w) per row (vs
        pandas' O(log w) skiplist — fine: w is a constant)."""
        frame = self._frame if (self._on or isinstance(self._window, str)) else self._frame._ensure_order()
        w = self._spec(frame)
        name = alias or f"{col}_rank"
        x = F.col(col)
        arr = F.collect_list(x).over(w)  # nulls absent, like pandas
        if ascending:
            lt = F.size(F.filter(arr, lambda v: v < x))
            le = F.size(F.filter(arr, lambda v: v <= x))
        else:
            lt = F.size(F.filter(arr, lambda v: v > x))
            le = F.size(F.filter(arr, lambda v: v >= x))
        if method == "average":
            r = (lt + le + 1).cast("double") / F.lit(2.0)
        elif method == "min":
            r = (lt + 1).cast("double")
        elif method == "max":
            r = le.cast("double")
        else:
            raise ValueError(f"unsupported rank method {method!r}")
        if pct:
            r = r / F.size(arr).cast("double")
        val = F.when(x.isNotNull(), r)
        if self._min_periods and self._min_periods > 1:
            cnt = F.count(x).over(w)
            val = F.when(cnt >= self._min_periods, val)
        return frame._with(frame._sdf.withColumn(name, self._mask_by(val)))

    def nunique(self, col: str, alias: str | None = None):
        """``rolling.nunique()`` (reference aggregations.pyx:1636
        roll_nunique, new in pandas 3.x): count of distinct non-null
        values in the window — size(array_distinct(frame array)).
        O(w) state per row, JVM-side."""
        frame = self._frame if (self._on or isinstance(self._window, str)) else self._frame._ensure_order()
        w = self._spec(frame)
        name = alias or f"{col}_nunique"
        x = F.col(col)
        val = F.size(F.array_distinct(F.collect_list(x).over(w))).cast("long")
        if self._min_periods and self._min_periods > 1:
            cnt = F.count(x).over(w)
            val = F.when(cnt >= self._min_periods, val)
        return frame._with(frame._sdf.withColumn(name, self._mask_by(val)))

    def sum(self, col: str, alias: str | None = None, **win_kwargs):
        # pandas win_type sum = Σw_i·x_i (no normalization); taper
        # params (std=, tau=) arrive as agg kwargs, like pandas
        if self._win_type:
            return self._win_type_agg(col, alias, "sum", win_kwargs)
        return self._apply("sum", col, alias)

    def mean(self, col: str, alias: str | None = None, **win_kwargs):
        if self._win_type:
            return self._win_type_agg(col, alias, "mean", win_kwargs)
        return self._apply("mean", col, alias)
    def min(self, col: str, alias: str | None = None):    return self._apply("min", col, alias)
    def max(self, col: str, alias: str | None = None):    return self._apply("max", col, alias)
    def count(self, col: str, alias: str | None = None):  return self._apply("count", col, alias)
    def median(self, col: str, alias: str | None = None): return self._apply("median", col, alias)
    def std(self, col: str, alias: str | None = None):    return self._apply("std", col, alias)
    def var(self, col: str, alias: str | None = None):    return self._apply("var", col, alias)
    def sem(self, col: str, alias: str | None = None):    return self._apply("sem", col, alias)

    def _pairwise(self, kind: str, x: str, y: str, alias: str | None):
        """rolling.cov/.corr (window/rolling.py:1715,1780): Spark's
        covar_samp/corr are frame-legal window aggregates — one window
        pass, no UDF. min_periods counts complete (x, y) pairs, pandas'
        rule."""
        frame = self._frame if (self._on or isinstance(self._window, str)) else self._frame._ensure_order()
        w = self._spec(frame)
        name = alias or f"{x}_{y}_{kind}"
        fn = F.covar_samp if kind == "cov" else F.corr
        val = fn(F.col(x), F.col(y)).over(w)
        minp = self._min_periods if self._min_periods else 1
        pair = F.when(F.col(x).isNotNull() & F.col(y).isNotNull(), F.lit(1))
        cnt = F.count(pair).over(w)
        val = F.when(cnt >= max(minp, 2), val)
        return frame._with(frame._sdf.withColumn(name, self._mask_by(val)))

    def skew(self, col: str, alias: str | None = None):
        return self._moment("skew", col, alias)

    def kurt(self, col: str, alias: str | None = None):
        return self._moment("kurt", col, alias)

    def _moment(self, kind: str, col: str, alias: str | None):
        """rolling.skew/.kurt (aggregations.pyx:529,686): the same
        G1/G2 composites the groupby path uses, with every component
        aggregate windowed — one pass, no UDF."""
        from pandas_spark.functions import stats

        frame = self._frame if (self._on or isinstance(self._window, str)) else self._frame._ensure_order()
        w = self._spec(frame)
        name = alias or f"{col}_{kind}"
        fn = stats.skew if kind == "skew" else stats.kurt
        val = fn(F.col(col), over=w)
        minp = self._min_periods
        if minp and minp > 1:
            cnt = F.count(F.col(col)).over(w)
            val = F.when(cnt >= minp, val)
        return frame._with(frame._sdf.withColumn(name, self._mask_by(val)))

    def cov(self, x: str, y: str, alias: str | None = None):
        return self._pairwise("cov", x, y, alias)

    def corr(self, x: str, y: str, alias: str | None = None):
        return self._pairwise("corr", x, y, alias)


class Expanding(Rolling):
    def __init__(self, frame: DataFrame, on: str | None = None, by: Sequence[str] | None = None, min_periods: int = 1):
        super().__init__(frame, window=0, on=on, by=by, min_periods=min_periods)

    def _spec(self, frame: DataFrame):
        base = W.partitionBy(*self._by) if self._by else W.partitionBy()
        if self._on:
            return base.orderBy(F.col(self._on).asc()).rowsBetween(W.unboundedPreceding, 0)
        _, order_exprs = frame._ordered()
        return base.orderBy(*order_exprs).rowsBetween(W.unboundedPreceding, 0)

    def _apply(self, func: str, col: str, alias: str | None):
        frame = self._frame if self._on else self._frame._ensure_order()
        w = self._spec(frame)
        name = alias or f"{col}_{func}"
        if func == "sem":
            val = F.stddev_samp(F.col(col)).over(w) / F.sqrt(
                F.count(F.col(col)).over(w)
            )
        else:
            val = _AGGS[func](F.col(col)).over(w)
        if self._min_periods and self._min_periods > 1:
            cnt = F.count(F.col(col)).over(w)
            val = F.when(cnt >= self._min_periods, val)
        return frame._with(frame._sdf.withColumn(name, self._mask_by(val)))


class Resampler:
    """Tumbling event-time bucketing (pandas resample → F.window).

    Reference: pandas/core/resample.py:119; the same groupBy(window())
    plan runs under Structured Streaming with a watermark
    (pandas_spark/streaming) — batch and stream share semantics.
    """

    def __init__(
        self,
        frame: DataFrame,
        rule: str,
        on: str,
        by: Sequence[str] | None = None,
        origin: str | None = None,
        offset: str | None = None,
        closed: str | None = None,
        label: str | None = None,
    ):
        self._frame = frame
        self._rule = rule
        self._on = on
        self._by = list(by or [])
        # pandas' DEFAULT origin is 'start_day' (core/resample.py:2441),
        # NOT epoch. For widths that evenly divide a day the two anchor
        # identical bins (any midnight ≡ 0 mod width), so the engine
        # keeps the free epoch shortcut there; otherwise (2D, 7D,
        # 7min, ...) origin=None resolves to a true 'start_day' — one
        # bounded min(ts) scalar job — for pandas parity (r11 sweep;
        # previously these bins were silently epoch-anchored).
        self._origin = origin
        self._offset = offset
        # Calendar-anchored rules (ME/MS/QE/QS/YE/YS/W[-DOW]) bucket by
        # calendar periods, not fixed widths (pandas core/resample.py:2402).
        self._anchored = parse_anchored(rule)
        if self._anchored is None:
            try:
                parse_offset_seconds(rule)  # validate eagerly (loud, not at agg)
            except ValueError as e:
                # pandas message shape (test_resample_M_Q_Y_raises):
                # deprecated/business aliases M/Q/Y/A/BME/BQE/B/C raise
                raise ValueError(f"Invalid frequency: {rule} ({e})") from None
        elif (origin is not None and origin != "epoch") or self._offset:
            raise NotImplementedError(
                f"resample({rule!r}): origin=/offset= with calendar-anchored "
                "frequencies is not supported (pandas anchors these to the "
                "calendar and only warns; here it raises loudly)"
            )
        # pandas closed=/label= (core/resample.py:2404): closed='right'
        # buckets (start, end] — a boundary point belongs to the
        # EARLIER bucket; label='right' reports the bucket's end.
        # Defaults: right/right for END-anchored freqs (ME/QE/YE/W) AND
        # for origin='end'/'end_day' (backward resample, resample.py:2495);
        # left/left for everything else — exactly pandas' rule.
        end_default = (
            self._anchored is not None and self._anchored.end_anchored
        ) or origin in ("end", "end_day")
        if closed is None:
            closed = "right" if end_default else "left"
        if label is None:
            label = "right" if end_default else "left"
        if closed not in ("left", "right"):
            raise ValueError(f"closed must be 'left'|'right', got {closed!r}")
        if label not in ("left", "right"):
            raise ValueError(f"label must be 'left'|'right', got {label!r}")
        self._closed = closed
        self._label = label

    _DAY_US = 86_400_000_000

    def _start_micros(self) -> int:
        """Bucket-boundary shift in MICROSECONDS (pandas ``origin``/
        ``offset``, core/resample.py:3093 _get_timestamp_range_edges →
        Spark ``F.window(..., startTime=)``).

        ``origin=None`` (default) = pandas 'start_day' semantics: free
        epoch anchoring when the width divides a day (identical bins),
        else the data's first midnight. ``'start'``/``'start_day'`` /
        ``'end'``/``'end_day'`` anchor to min(ts)/max(ts) (± day
        normalize/ceil) — ONE bounded scalar agg collected before
        planning (any data size); an ISO timestamp string anchors
        without any job. ``offset`` adds on top, as in pandas."""
        w_us = parse_offset_seconds(self._rule) * 1_000_000
        origin = self._origin
        if origin is None:
            origin = "epoch" if self._DAY_US % w_us == 0 else "start_day"
        base = 0
        if origin == "epoch":
            base = 0
        elif origin in ("start", "start_day", "end", "end_day"):
            agg = F.min if origin.startswith("start") else F.max
            row = self._frame.spark.agg(
                agg(epoch_micros(F.col(self._on))).alias("m")
            ).collect()[0]
            edge_us = row["m"] or 0
            if origin == "start_day":
                edge_us -= edge_us % self._DAY_US
            elif origin == "end_day":
                edge_us = -(-edge_us // self._DAY_US) * self._DAY_US
            base = edge_us % w_us
        else:
            import datetime as _dt

            ts = _dt.datetime.fromisoformat(origin)
            base = int(
                ts.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000
            ) % w_us
        if self._offset:
            base += parse_offset_seconds(self._offset) * 1_000_000
        return base % w_us

    def _tcol(self):
        """The bucketing timestamp: closed='right' shifts every stamp
        back 1µs so an exact boundary point lands in the EARLIER
        bucket — interior points are unaffected and the reported
        window bounds stay those of the original buckets."""
        c = F.col(self._on)
        if self._closed == "right":
            return F.timestamp_micros(epoch_micros(c) - 1)
        return c

    def _anchored_edges(self, c):
        """(start, end) DATE exprs of the calendar bucket holding
        timestamp column ``c``.

        End-anchored freqs (ME/QE/YE/W) use pandas' day-end-adjusted
        edges (core/resample.py _adjust_bin_edges): membership is
        decided at DAY granularity — Jan 31 23:59 is still January,
        Sunday 05:00 still ends that Sunday's week — so closed='left'
        shifts the DATE by +1 day (edge day opens the next bin).
        Start-anchored freqs (MS/QS/YS) keep plain midnight edges, so
        closed='right' is the engine's usual −1 µs timestamp shift.
        Verified against pandas on boundary-heavy stamps for all four
        closed×label combinations (tests/test_resample_anchored.py)."""
        a = self._anchored
        if a.kind == "week":
            d = F.to_date(c)
            dd = F.date_add(d, 1) if self._closed == "left" else d
            iso = F.weekday(dd) + F.lit(1)  # weekday(): Mon=0..Sun=6
            end = F.date_add(dd, F.pmod(F.lit(a.dow) - iso, F.lit(7)))
            return F.date_sub(end, 7), end
        if a.kind == "month_end":
            d = F.to_date(c)
            dd = F.date_add(d, 1) if self._closed == "left" else d
            off = F.pmod(F.lit(a.m) - F.month(dd), F.lit(a.p))
            end = F.last_day(F.add_months(F.trunc(dd, "MM"), off))
            return F.last_day(F.add_months(F.trunc(end, "MM"), -a.p)), end
        # month_start
        tsx = F.timestamp_micros(epoch_micros(c) - 1) if self._closed == "right" else c
        d0 = F.trunc(F.to_date(tsx), "MM")
        start = F.add_months(d0, -F.pmod(F.month(d0) - F.lit(a.m), F.lit(a.p)))
        return start, F.add_months(start, a.p)

    def _win(self):
        if self._anchored is not None:
            start, end = self._anchored_edges(F.col(self._on))
            return F.struct(
                start.cast("timestamp").alias("start"),
                end.cast("timestamp").alias("end"),
            )
        secs = parse_offset_seconds(self._rule)
        start_us = self._start_micros()
        if start_us:
            return F.window(
                self._tcol(), f"{secs} seconds", f"{secs} seconds",
                f"{start_us} microseconds",
            )
        return F.window(self._tcol(), f"{secs} seconds")

    def _label_col(self):
        return F.col("__win__.end" if self._label == "right" else "__win__.start")

    def _bucket_src(self):
        # pandas drops NaT index rows before binning (resample tests
        # test_resample_with_nat) — a NULL ts must not become a
        # NULL-labeled bucket
        from pandas_spark._planmemo import plan_memo

        base = self._frame.spark
        cond = F.col(self._on).isNotNull()
        return plan_memo(
            base, "filter", None, (cond,), lambda: base.where(cond)
        )

    def _bucketed(self):
        return self._bucket_src().groupBy(
            *self._by, self._win().alias("__win__")
        )

    def agg(self, spec) -> DataFrame:
        from pandas_spark.groupby import resolve_agg

        dtmap = dict(self._frame.dtypes)
        bounds = self._frame._bounds  # footer proofs ungate exact kernels
        exprs = []
        if isinstance(spec, dict):
            for col, funcs in spec.items():
                if isinstance(funcs, str):
                    exprs.append(
                        resolve_agg(funcs, col, dtmap.get(col), bounds, alias=col)
                    )
                else:
                    for fn in funcs:
                        exprs.append(
                            resolve_agg(fn, col, dtmap.get(col), bounds,
                                        alias=f"{col}_{fn}")
                        )
        elif isinstance(spec, str):
            num = {"tinyint", "smallint", "int", "bigint", "float", "double"}
            for c, t in self._frame.dtypes:
                if c != self._on and c not in self._by and t in num:
                    exprs.append(resolve_agg(spec, c, t, bounds, alias=c))
        from pandas_spark._planmemo import plan_memo

        src = self._bucket_src()
        gcols = [F.col(c) for c in self._by] + [self._win().alias("__win__")]
        out = plan_memo(
            src, "groupby_agg", tuple(self._by),
            gcols + exprs,
            lambda: src.groupBy(*gcols).agg(*exprs),
        )
        sel = [
            *self._by,
            self._label_col().alias(self._on),
            *[c for c in out.columns if c not in (*self._by, "__win__")],
        ]
        # key keeps positions: static names at their indices, Columns
        # fingerprint-matched in order
        out2 = plan_memo(
            out, "select",
            tuple(c if isinstance(c, str) else i for i, c in enumerate(sel)),
            [c for c in sel if not isinstance(c, str)],
            lambda: out.select(*sel),
        )
        return DataFrame(out2)

    def sum(self):   return self.agg("sum")
    def mean(self):  return self.agg("mean")
    def count(self): return self.agg("count")
    def min(self):   return self.agg("min")
    def max(self):   return self.agg("max")

    def ohlc(self, col: str) -> DataFrame:
        w = (
            W.partitionBy(*self._by, self._win())
            .orderBy(F.col(self._on).asc())
        )
        sdf = (
            self._frame.spark
            .where(F.col(self._on).isNotNull())  # pandas drops NaT rows
            .withColumn("__first__", F.first(col).over(w))
            .withColumn("__last__", F.last(col).over(w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
        )
        out = (
            sdf.groupBy(*self._by, self._win().alias("__win__"))
            .agg(
                F.first("__first__").alias("open"),
                F.max(col).alias("high"),
                F.min(col).alias("low"),
                F.first("__last__").alias("close"),
            )
            .select(*self._by, self._label_col().alias(self._on), "open", "high", "low", "close")
        )
        return DataFrame(out)

    def interpolate(self, subset=None, method: str = "linear", **kwargs) -> DataFrame:
        """pandas ``Resampler.interpolate`` (reference core/resample.py:851)
        = ``.asfreq()`` onto the bucket-floored rule grid (values kept
        only at EXACT grid stamps — pandas drops off-grid originals)
        then frame ``interpolate`` over the grid. One bounded 2-scalar
        receipt for the spine bounds, one exact-stamp left equi-join;
        the interpolation itself is the existing window compilation.
        With ``by=`` groups the spine is PER GROUP (each group's own
        min/max bucket — pandas ``groupby().resample().interpolate()``
        builds one index per group) and the fill runs per group."""
        spine = self.asfreq_spine().spark
        keys = [*self._by, self._on]
        joined = spine.join(
            self._frame._drop_internal(self._frame._sdf), on=keys, how="left"
        )
        out = DataFrame(joined, sort_spec=tuple((k, True, "last") for k in keys))
        return out.interpolate(
            subset=subset,
            method=method,
            on=self._on,
            by=list(self._by) or None,
            **kwargs,
        )

    def asfreq(self) -> DataFrame:
        """pandas ``Resampler.asfreq()`` (core/resample.py:851 family):
        the dense rule grid, with each column's value taken from rows
        whose stamp EXACTLY hits a grid point (off-grid originals are
        dropped, pandas rule); everything else NULL. One bounded
        spine-bounds agg + one exact-stamp left equi-join."""
        spine = self.asfreq_spine().spark
        keys = [*self._by, self._on]
        joined = spine.join(
            self._frame._drop_internal(self._frame._sdf), on=keys, how="left"
        )
        return DataFrame(joined, sort_spec=tuple((k, True, "last") for k in keys))

    def ffill(self, limit: int | None = None) -> DataFrame:
        """pandas ``Resampler.ffill(limit=)``: each grid stamp takes the
        LAST original row at-or-before it (including OFF-grid
        originals — pandas reindex-ffill semantics, not asfreq+ffill),
        with ``limit`` capping the number of consecutive grid slots
        filled past an exactly-hit slot. One merge_asof backward of
        the spine against the frame; the limit mask is a grid-side
        window over occupied-slot runs."""
        return self._upsample_fill("backward", limit)

    def bfill(self, limit: int | None = None) -> DataFrame:
        """pandas ``Resampler.bfill(limit=)`` — mirror of ffill: each
        grid stamp takes the FIRST original row at-or-after it;
        ``limit`` fills only the last ``limit`` slots of each empty
        run (the ones nearest the next original)."""
        return self._upsample_fill("forward", limit)

    def nearest(self) -> DataFrame:
        """pandas ``Resampler.nearest()``: each grid stamp takes the
        nearest original row (either side; backward wins exact ties,
        pandas rule via merge_asof nearest). ``limit=`` is not
        supported — raise loudly rather than approximate."""
        return self._upsample_fill("nearest", None)

    def _upsample_fill(self, direction: str, limit: int | None) -> DataFrame:
        from pandas_spark.operators.joins import merge_asof

        if limit is not None and direction == "nearest":
            raise NotImplementedError("nearest(limit=) is not supported")
        if limit is not None and self._anchored is not None:
            raise NotImplementedError(
                "ffill/bfill(limit=) with calendar-anchored rules is not "
                "supported; use a fixed-width rule or limit=None"
            )
        spine = self.asfreq_spine()
        src = self._frame
        rts = "__rts_limit__"
        if limit is not None:
            # carry the matched ORIGINAL stamp through the asof join so
            # the limit mask can measure grid-slot distance to it
            src = src._with(src._sdf.withColumn(rts, F.col(self._on)))
        out = merge_asof(
            spine,
            src,
            on=self._on,
            by=self._by or None,
            direction=direction,
        )
        if limit is None:
            return out
        # pandas reindex-fill limit semantics (verified differentially:
        # the fill VALUE is the plain asof match, but each ORIGINAL row
        # may fill at most `limit` consecutive grid slots — the gate is
        # the number of grid stamps strictly between the original and
        # the target (0 when the original hits the grid exactly):
        #   ffill: idx(target) − idx(original)        ≤ limit
        #   bfill: ceil_idx(original) − idx(target)   ≤ limit
        # where idx(x) = floor((x − anchor)/width) on the rule grid.
        w_us = parse_offset_seconds(self._rule) * 1_000_000
        start_us = self._start_micros()

        def idx(c):
            return F.floor((epoch_micros(c) - start_us) / w_us)

        def ceil_idx(c):
            return -F.floor(-(epoch_micros(c) - start_us) / w_us)

        t = F.col(self._on)
        o = F.col(rts)
        if direction == "backward":
            keep = (idx(t) - idx(o)) <= limit
        else:
            keep = (ceil_idx(o) - idx(t)) <= limit
        sdf = out.spark
        value_cols = [
            c for c in sdf.columns if c not in (*self._by, self._on, rts)
        ]
        sdf = sdf.select(
            *self._by,
            self._on,
            *[F.when(keep, F.col(qi(c))).alias(c) for c in value_cols],
        )
        keys = [*self._by, self._on]
        return DataFrame(sdf, sort_spec=tuple((k, True, "last") for k in keys))

    def asfreq_spine(self) -> DataFrame:
        """Dense time spine for upsampling (F.sequence + explode).

        Bounds floor to the bucket grid (epoch-aligned, like
        ``F.window``/``date_trunc`` buckets) so spine keys join exactly
        against resampled aggregates. With ``by=`` groups: one spine
        per group over THAT group's bounds (a groupBy agg, then a
        per-row sequence explode — no global bounds, no cross join).

        Calendar-anchored rules build the spine over canonical period
        STARTS (always day-1 dates, so month-interval stepping never
        clamps mid-sequence) and map each to the bucket LABEL (per
        ``label=``)."""
        if self._anchored is not None:
            return self._asfreq_spine_anchored()
        secs = parse_offset_seconds(self._rule)
        w_us = secs * 1_000_000
        start_us = self._start_micros()

        def bucket(c):
            return F.timestamp_micros(
                F.floor((epoch_micros(c) - start_us) / w_us).cast("long") * w_us
                + start_us
            )

        agg_cols = [
            bucket(F.min(self._on)).alias("lo"),
            bucket(F.max(self._on)).alias("hi"),
        ]
        if self._by:
            bounds = self._frame.spark.groupBy(*self._by).agg(*agg_cols)
        else:
            bounds = self._frame.spark.agg(*agg_cols)
        spine = bounds.select(
            *self._by,
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL {secs} seconds"))
            ).alias(self._on),
        )
        return DataFrame(spine)

    def _asfreq_spine_anchored(self) -> DataFrame:
        """Anchored-frequency spine: one bounds agg (min/max ts →
        bucket edges via the SAME expressions agg() buckets with),
        then a month-start / week-edge sequence mapped to labels."""
        a = self._anchored

        def label_of(c):
            start, end = self._anchored_edges(c)
            return end if self._label == "right" else start

        agg_cols = [
            label_of(F.min(self._on)).alias("lo"),
            label_of(F.max(self._on)).alias("hi"),
        ]
        if self._by:
            bounds = self._frame.spark.groupBy(*self._by).agg(*agg_cols)
        else:
            bounds = self._frame.spark.agg(*agg_cols)
        if a.kind == "week":
            seq = F.sequence("lo", "hi", F.expr("INTERVAL 7 days"))
            lab = F.explode(seq)
        else:
            # step over period STARTS (day-1 dates: month arithmetic
            # is exact), then re-derive the label from each start
            step = F.expr(f"INTERVAL {a.p} months")
            seq = F.sequence(F.trunc("lo", "MM"), F.trunc("hi", "MM"), step)
            lab = F.explode(seq)
        spine = bounds.select(*self._by, lab.alias("__p__"))
        # lo/hi are the LABEL dates themselves, so the sequence element
        # (its month start / the week edge) maps back uniformly:
        # month_end labels are month-ends, month_start labels are
        # month starts, week labels are the edges.
        if a.kind == "month_end":
            label = F.last_day(F.col("__p__"))
        else:
            label = F.col("__p__")
        spine = spine.select(
            *self._by, label.cast("timestamp").alias(self._on)
        )
        return DataFrame(spine)


def ewm_mean(
    frame: DataFrame,
    col: str,
    alpha: float | None = None,
    span: float | None = None,
    halflife: float | str | None = None,
    adjust: bool = True,
    times: str | None = None,
    by: Sequence[str] | None = None,
    order_by: str | None = None,
    alias: str | None = None,
    stat: str = "mean",
) -> DataFrame:
    """Exponentially-weighted mean (pandas ewm.mean, window/ewm.py:127).

    Recursive, so it crosses into Python — but via partition-level
    ``mapInPandas`` over key-repartitioned, key-sorted data, NOT
    per-group applyInPandas: one Arrow stream per partition instead of
    one tiny batch per group, which matters when groups are small and
    numerous (the common case). Each partition holds whole groups
    (repartition on the key), so the per-partition pandas groupby is
    exact. Without ``by`` the whole series lands in one task
    (documented pandas-parity constraint; use a key for scale).

    Full decay surface (window/ewm.py:127): ``alpha`` / ``span`` /
    ``halflife`` (scalar → α = 1−exp(ln½/hl)); ``adjust=False`` for
    the recursive form yₜ = (1−α)yₜ₋₁ + αxₜ (the streaming-friendly
    recurrence — pandas' adjust=True divides by the weight sum
    instead); ``times=<ts column>`` with a timedelta-string
    ``halflife`` for irregularly-spaced decay (pandas restricts
    times= to mean/sum)."""
    import pandas as pd  # noqa: F401 (worker-side)

    if times is not None:
        if halflife is None or not isinstance(halflife, str):
            raise ValueError(
                "times= requires halflife as a timedelta string, e.g. '2s' "
                "(pandas window/ewm.py times semantics)"
            )
        if stat not in ("mean", "sum"):
            raise ValueError(f"times= supports mean/sum only (pandas parity), got {stat!r}")
        alpha = None
    elif alpha is None:
        if span is not None:
            alpha = 2.0 / (span + 1.0)
        elif halflife is not None:
            import math as _math

            alpha = 1.0 - _math.exp(_math.log(0.5) / float(halflife))
        else:
            raise ValueError("need alpha, span, or halflife")
    keys = list(by or [])
    name = alias or f"{col}_ewm"
    sdf = frame.spark
    if not keys:
        sdf = sdf.withColumn("__g__", F.lit(0))
        keys_eff = ["__g__"]
    else:
        keys_eff = keys

    if order_by:
        sort_cols, sort_asc = [order_by], [True]
    elif frame._sort_spec:
        sort_cols = [c for c, _, _ in frame._sort_spec]
        sort_asc = [a for _, a, _ in frame._sort_spec]
    else:
        frame2 = frame._ensure_order()
        sdf = frame2._sdf
        if not keys:
            sdf = sdf.withColumn("__g__", F.lit(0))
        sort_cols, sort_asc = [frame2._order_col], [True]

    out_fields = sdf.schema.fields
    # alias may NAME AN EXISTING COLUMN (e.g. overwrite v in place): the
    # kernel's pdf[name]= replaces it, so the declared schema must too —
    # appending a duplicate field made Arrow expect one more column than
    # the kernel returns (fuzzer-found RESULT_COLUMN_SCHEMA_MISMATCH)
    if name in {f.name for f in out_fields}:
        schema = ", ".join(
            f"{qi(f.name)} {'double' if f.name == name else f.dataType.simpleString()}"
            for f in out_fields
        )
    else:
        schema = ", ".join(
            f"{qi(f.name)} {f.dataType.simpleString()}" for f in out_fields
        ) + f", {qi(name)} double"
    a = alpha
    # pandas sort convention is NULLS LAST (na_position='last' default;
    # frame.py _sort_key) — Spark's bare .asc() is nulls-FIRST, which
    # would move NULL-order_by rows to the head of every group's decay
    # sequence and shift every subsequent value
    order_spark = [
        F.col(c).asc_nulls_last() if asc else F.col(c).desc_nulls_last()
        for c, asc in zip(sort_cols, sort_asc)
    ]

    stat_ = stat
    adjust_ = bool(adjust)
    times_ = times
    halflife_ = halflife

    def fn(batches):
        # whole partition → one pandas frame (groups never span
        # partitions thanks to the keyed repartition)
        batches = list(batches)
        if not batches:
            # empty partition / empty frame: mapInPandas may hand the
            # kernel ZERO batches — yielding nothing is the valid empty
            # result (pd.concat([]) raises; fuzzer-found on empty input)
            return
        pdf = pd.concat(batches, ignore_index=True)
        if pdf.empty:
            yield pdf.assign(**{name: pd.Series(dtype="float64")})
            return
        # rows arrive ALREADY sorted — sortWithinPartitions upstream,
        # and Arrow batches preserve partition row order through
        # mapInPandas. The old in-kernel re-sort was pure O(n log n)
        # waste that dominated at the 1000x decade (r8: removing it
        # plus the Cython grouped-ewm cut 1000x from 57.0 to 47.1 s).
        # A mapInArrow variant (zero-copy passthrough of non-key
        # columns) was MEASURED SLOWER on this pyspark build — the
        # mapInArrow transport itself ran 2x behind mapInPandas at the
        # 1000x decade (141.8 vs 68.0 s identity crossing, SCALE.md) —
        # so the pandas path stays.
        if times_ is not None:
            parts = []
            for _, g in pdf.groupby(keys_eff, sort=False):
                ew = g[col].ewm(
                    halflife=pd.Timedelta(halflife_),
                    times=pd.DatetimeIndex(g[times_]),
                    adjust=adjust_,
                )
                parts.append(getattr(ew, stat_)())
            pdf[name] = pd.concat(parts)
        elif stat_ == "mean":
            # lockstep numpy kernel (functions/ewm_np): pandas' exact
            # ewma arithmetic, one lane per group, vectorized ACROSS
            # groups — bit-equal to pandas (the chain fuzzer rejected a
            # faster closed-form scan over a 1-ulp divergence) and
            # measured ~3× faster at the 1000× decade than both
            # per-group transform(lambda) and the grouped-ewm accessor,
            # which choke on ~1.5M tiny groups/task.
            from pandas_spark.functions.ewm_np import ewm_mean_segmented

            if len(keys_eff) == 1:
                u = pdf[keys_eff[0]].to_numpy()
                changed = u[1:] != u[:-1]
                null_key = pdf[keys_eff[0]].isna().to_numpy()
            else:
                changed = None
                null_key = None
                for k in keys_eff:
                    u = pdf[k].to_numpy()
                    d = u[1:] != u[:-1]
                    changed = d if changed is None else (changed | d)
                    nk = pdf[k].isna().to_numpy()
                    null_key = nk if null_key is None else (null_key | nk)
            vals = ewm_mean_segmented(
                pdf[col].to_numpy(dtype="float64"), changed, a, adjust_
            )
            if null_key.any():
                # pandas groupby drops NA-key groups: transform emits
                # NaN for those rows (the transform path inherits this
                # from pandas; the numpy path must impose it)
                import numpy as _np

                vals = _np.where(null_key, _np.nan, vals)
            pdf[name] = vals
        else:
            # per-group pandas ewm (Cython inner kernel) — sum/std/var
            # keep the reference implementation (mean, any adjust=,
            # routes to the lockstep kernel above)
            pdf[name] = (
                pdf.groupby(keys_eff, sort=False)[col]
                .transform(lambda s: getattr(s.ewm(alpha=a, adjust=adjust_), stat_)())
            )
        yield pdf

    from pandas_spark.dtypes import safe_map_in_pandas
    from pandas_spark._planmemo import plan_memo

    part = plan_memo(
        sdf, "repartition", tuple(keys_eff), None,
        lambda: sdf.repartition(*keys_eff),
    )
    sort_all = [F.col(k) for k in keys_eff] + order_spark
    base = plan_memo(
        part, "sortWithin", None, sort_all,
        lambda: part.sortWithinPartitions(*sort_all),
    )
    # the kernel closure is rebuilt per call but is a pure function of
    # these params — key on them so a repeated build replays the same
    # MapInPandas Dataset (same semantics, same schema)
    out = plan_memo(
        base, "ewm_map",
        (col, a, adjust_, stat_, tuple(keys_eff), times_, str(halflife_),
         name, schema),
        None,
        lambda: safe_map_in_pandas(base, fn, schema),
    )
    from pandas_spark.frame import is_order_col
    drop = [c for c in out.columns if (c == "__g__" or is_order_col(c)) and c not in frame.columns]
    out2 = (
        plan_memo(out, "drop", tuple(drop), None, lambda: out.drop(*drop))
        if drop
        else out
    )
    return DataFrame(out2)


def ewm_std(frame, col, alpha=None, span=None, halflife=None, adjust=True,
            by=None, order_by=None, alias=None):
    """ewm.std (window/ewm.py bias-corrected) — same partition-level
    mapInPandas path as ewm_mean."""
    return ewm_mean(frame, col, alpha=alpha, span=span, halflife=halflife,
                    adjust=adjust, by=by,
                    order_by=order_by, alias=alias or f"{col}_ewm_std", stat="std")


def ewm_var(frame, col, alpha=None, span=None, halflife=None, adjust=True,
            by=None, order_by=None, alias=None):
    """ewm.var (window/ewm.py:473) — same kernel, ``stat='var'``."""
    return ewm_mean(frame, col, alpha=alpha, span=span, halflife=halflife,
                    adjust=adjust, by=by,
                    order_by=order_by, alias=alias or f"{col}_ewm_var", stat="var")


def ewm_sum(frame, col, alpha=None, span=None, halflife=None, adjust=True,
            times=None, by=None, order_by=None, alias=None):
    """ewm.sum (window/ewm.py:590) — same kernel, ``stat='sum'``."""
    return ewm_mean(frame, col, alpha=alpha, span=span, halflife=halflife,
                    adjust=adjust, times=times, by=by,
                    order_by=order_by, alias=alias or f"{col}_ewm_sum", stat="sum")


def ewm_cov(
    frame: DataFrame,
    col: str,
    col2: str,
    alpha: float | None = None,
    span: float | None = None,
    by: Sequence[str] | None = None,
    order_by: str | None = None,
    alias: str | None = None,
    stat: str = "cov",
) -> DataFrame:
    """Pairwise ewm.cov / ewm.corr (window/ewm.py:658,:747) — the same
    partition-level mapInPandas kernel as ``ewm_mean`` (one Arrow
    stream per keyed partition, whole groups per partition), with the
    second series riding along."""
    import pandas as pd  # noqa: F401 (worker-side)

    if alpha is None:
        if span is None:
            raise ValueError("need alpha or span")
        alpha = 2.0 / (span + 1.0)
    keys = list(by or [])
    name = alias or f"{col}_{col2}_ewm_{stat}"
    sdf = frame.spark
    keys_eff = keys or ["__g__"]
    if not keys:
        sdf = sdf.withColumn("__g__", F.lit(0))

    if order_by:
        sort_cols, sort_asc = [order_by], [True]
    elif frame._sort_spec:
        sort_cols = [c for c, _, _ in frame._sort_spec]
        sort_asc = [a for _, a, _ in frame._sort_spec]
    else:
        frame2 = frame._ensure_order()
        sdf = frame2._sdf
        if not keys:
            sdf = sdf.withColumn("__g__", F.lit(0))
        sort_cols, sort_asc = [frame2._order_col], [True]

    if name in {f.name for f in sdf.schema.fields}:
        schema = ", ".join(
            f"{qi(f.name)} {'double' if f.name == name else f.dataType.simpleString()}"
            for f in sdf.schema.fields
        )
    else:
        schema = ", ".join(
            f"{qi(f.name)} {f.dataType.simpleString()}" for f in sdf.schema.fields
        ) + f", {qi(name)} double"
    a, stat_ = alpha, stat
    # pandas sort convention is NULLS LAST (na_position='last' default;
    # frame.py _sort_key) — Spark's bare .asc() is nulls-FIRST, which
    # would move NULL-order_by rows to the head of every group's decay
    # sequence and shift every subsequent value
    order_spark = [
        F.col(c).asc_nulls_last() if asc else F.col(c).desc_nulls_last()
        for c, asc in zip(sort_cols, sort_asc)
    ]

    def fn(batches):
        batches = list(batches)
        if not batches:
            # empty partition / empty frame: mapInPandas may hand the
            # kernel ZERO batches — yielding nothing is the valid empty
            # result (pd.concat([]) raises; fuzzer-found on empty input)
            return
        pdf = pd.concat(batches, ignore_index=True)
        if pdf.empty:
            yield pdf.assign(**{name: pd.Series(dtype="float64")})
            return
        pdf = pdf.sort_values(keys_eff + sort_cols,
                              ascending=[True] * len(keys_eff) + list(sort_asc),
                              kind="stable")
        parts = []
        for _, g in pdf.groupby(keys_eff, sort=False):
            parts.append(getattr(g[col].ewm(alpha=a, adjust=True), stat_)(g[col2]))
        pdf[name] = pd.concat(parts)
        yield pdf

    from pandas_spark.dtypes import safe_map_in_pandas

    out = safe_map_in_pandas(
        sdf.repartition(*keys_eff)
        .sortWithinPartitions(*[F.col(k) for k in keys_eff], *order_spark),
        fn,
        schema,
    )
    from pandas_spark.frame import is_order_col
    drop = [c for c in out.columns if (c == "__g__" or is_order_col(c)) and c not in frame.columns]
    return DataFrame(out.drop(*drop))


def ewm_corr(frame, col, col2, alpha=None, span=None, by=None, order_by=None, alias=None):
    """ewm.corr (window/ewm.py:747) — pairwise kernel, ``stat='corr'``."""
    return ewm_cov(frame, col, col2, alpha=alpha, span=span, by=by, order_by=order_by,
                   alias=alias or f"{col}_{col2}_ewm_corr", stat="corr")


def sessionize(
    frame: DataFrame,
    on: str,
    gap: str = "30min",
    by: Sequence[str] | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Batch gap-based sessionization (the classic gaps-and-islands):
    a new session starts when the time since the previous event (per
    ``by`` key) is >= ``gap``; ``session_col`` is the 0-based session
    ordinal within the key. The batch twin of
    ``streaming.session_window_stream`` — same break condition
    (``>= gap``, matching Spark's session_window merge rule), so a
    pipeline can sessionize history in batch and the live tail in
    streaming and the ids line up per key.

    One window over (by, ts): lag → break flag → running sum. Single
    shuffle on the key; per-row state is O(1), any per-key cardinality.
    """
    gap_us = parse_offset_seconds(gap) * 1_000_000
    keys = list(by) if by else []
    if not keys:
        from pandas_spark.frame import _warn_unkeyed_window

        _warn_unkeyed_window("sessionize")
    w = (W.partitionBy(*keys) if keys else W.partitionBy()).orderBy(
        epoch_micros(F.col(on))
    )
    ts = epoch_micros(F.col(on))
    prev = F.lag(ts).over(w)
    brk = F.when(prev.isNull() | (ts - prev >= F.lit(gap_us)), 1).otherwise(0)
    run = W.partitionBy(*keys).orderBy(ts).rowsBetween(W.unboundedPreceding, 0) if keys else (
        W.partitionBy().orderBy(ts).rowsBetween(W.unboundedPreceding, 0)
    )
    sdf = frame._sdf.withColumn("__brk__", brk)
    out = sdf.withColumn(
        session_col, (F.sum("__brk__").over(run) - 1).cast("long")
    ).drop("__brk__")
    return frame._with(out)


class Ewm:
    """``df.ewm(...)`` accessor (reference window/ewm.py:127
    ExponentialMovingWindow) — thin sugar over the ewm_* functions,
    carrying the decay/grouping config so call sites read like pandas:
    ``df.ewm(span=5).mean("v")``."""

    def __init__(self, frame, alpha=None, span=None, halflife=None,
                 adjust=True, times=None, by=None, order_by=None):
        self._f = frame
        self._kw = dict(alpha=alpha, span=span, halflife=halflife,
                        adjust=adjust, by=by, order_by=order_by)
        self._times = times

    def mean(self, col: str, alias: str | None = None):
        return ewm_mean(self._f, col, times=self._times, alias=alias, **self._kw)

    def sum(self, col: str, alias: str | None = None):
        return ewm_sum(self._f, col, times=self._times, alias=alias, **self._kw)

    def std(self, col: str, alias: str | None = None):
        return ewm_std(self._f, col, alias=alias, **self._kw)

    def var(self, col: str, alias: str | None = None):
        return ewm_var(self._f, col, alias=alias, **self._kw)

    def cov(self, col: str, col2: str, alias: str | None = None):
        kw = {k: v for k, v in self._kw.items()
              if k in ("alpha", "span", "by", "order_by")}
        return ewm_cov(self._f, col, col2, alias=alias, **kw)

    def corr(self, col: str, col2: str, alias: str | None = None):
        kw = {k: v for k, v in self._kw.items()
              if k in ("alpha", "span", "by", "order_by")}
        return ewm_corr(self._f, col, col2, alias=alias, **kw)
