"""Deferred column expressions — the engine's primary idiom.

pandas 3.x grew ``pd.col`` (reference: pandas/core/col.py:370), a
deferred expression tree — exactly Spark's ``F.col`` model. ``Expr``
wraps a ``pyspark.sql.Column`` and adds the pandas accessor surface
(``.str``, ``.dt``) plus pandas arithmetic semantics (floor division /
modulo follow Python's floor convention, division by zero yields
±inf — reference: pandas/core/ops/array_ops.py:242).

Everything here compiles to built-in Catalyst expressions (JVM-side,
whole-stage-codegen'd) — no Python UDFs in this module.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import Column
from pandas_spark import fshim as F  # backtick-safe F.col facade


def _unwrap(v: Any) -> Any:
    return v._col if isinstance(v, Expr) else v


def _wrap(c: Column) -> "Expr":
    return Expr(c)


class Expr:
    """A deferred column expression (pandas ``pd.col`` ≙ Spark ``F.col``)."""

    __slots__ = ("_col",)

    def __init__(self, col: Column):
        self._col = col

    # -- conversion ---------------------------------------------------
    @property
    def spark(self) -> Column:
        return self._col

    def alias(self, name: str) -> "Expr":
        return _wrap(self._col.alias(name))

    # -- NumPy ufunc façade (SURVEY §2.8: np.sqrt(col) etc. compile to
    #    Catalyst expressions — reference: pandas' __array_ufunc__
    #    protocol, arraylike.py) ---------------------------------------
    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        if method != "__call__" or kwargs.get("out") is not None:
            return NotImplemented
        name = ufunc.__name__
        unary = _UFUNC_UNARY.get(name)
        if unary is not None and len(inputs) == 1:
            return _wrap(unary(self._col))
        binary = _UFUNC_BINARY.get(name)
        if binary is not None and len(inputs) == 2:
            a, b = inputs
            return binary(a if isinstance(a, Expr) else _wrap(_lit_col(a)),
                          b if isinstance(b, Expr) else _wrap(_lit_col(b)))
        return NotImplemented

    # -- arithmetic (pandas semantics) ---------------------------------
    def __add__(self, o):  return _wrap(self._col + _unwrap(o))
    def __radd__(self, o): return _wrap(_unwrap(o) + self._col)
    def __sub__(self, o):  return _wrap(self._col - _unwrap(o))
    def __rsub__(self, o): return _wrap(_unwrap(o) - self._col)
    def __mul__(self, o):  return _wrap(self._col * _unwrap(o))
    def __rmul__(self, o): return _wrap(_unwrap(o) * self._col)

    def __truediv__(self, o):
        # pandas: 1/0 = inf, -1/0 = -inf, 0/0 = NaN; Spark: NULL.
        num, den = self._col, F.lit(_unwrap(o)) if not isinstance(_unwrap(o), Column) else _unwrap(o)
        return _wrap(true_div(num, den))

    def __rtruediv__(self, o):
        num = F.lit(_unwrap(o)) if not isinstance(_unwrap(o), Column) else _unwrap(o)
        return _wrap(true_div(num, self._col))

    def __floordiv__(self, o):
        return _wrap(floor_div(self._col, _lit_col(o)))

    def __rfloordiv__(self, o):
        return _wrap(floor_div(_lit_col(o), self._col))

    def __mod__(self, o):
        return _wrap(py_mod(self._col, _lit_col(o)))

    def __rmod__(self, o):
        return _wrap(py_mod(_lit_col(o), self._col))

    def __pow__(self, o):  return _wrap(self._col ** _unwrap(o))
    def __rpow__(self, o): return _wrap(_lit_col(o) ** self._col)
    def __neg__(self):     return _wrap(-self._col)
    def __abs__(self):     return _wrap(F.abs(self._col))

    # -- comparison ----------------------------------------------------
    def __eq__(self, o):  return _wrap(self._col == _unwrap(o))  # type: ignore[override]
    def __ne__(self, o):  return _wrap(self._col != _unwrap(o))  # type: ignore[override]
    def __lt__(self, o):  return _wrap(self._col < _unwrap(o))
    def __le__(self, o):  return _wrap(self._col <= _unwrap(o))
    def __gt__(self, o):  return _wrap(self._col > _unwrap(o))
    def __ge__(self, o):  return _wrap(self._col >= _unwrap(o))

    # -- boolean -------------------------------------------------------
    def __and__(self, o):  return _wrap(self._col & _unwrap(o))
    def __rand__(self, o): return _wrap(_unwrap(o) & self._col)
    def __or__(self, o):   return _wrap(self._col | _unwrap(o))
    def __ror__(self, o):  return _wrap(_unwrap(o) | self._col)
    def __invert__(self):  return _wrap(~self._col)

    # -- pandas generic methods ------------------------------------------
    def map(self, mapping, default=None, dtype: str | None = None, na_action: str | None = None) -> "Expr":
        """``Series.map`` (series.py:4889; kernel algorithms.py:1868).

        With a dict: compiles to ``element_at(create_map(...))`` — a
        literal JVM map lookup, no UDF; unmapped values → NULL (pandas)
        unless ``default`` is given. With a *callable*: an Arrow-
        vectorized scalar pandas_udf (``dtype`` names the result type —
        required here because an unbound expression has no sample to
        infer from; ``DataFrame.series_apply`` infers it for you)."""
        if callable(mapping) and not isinstance(mapping, Mapping):
            if dtype is None:
                raise ValueError(
                    "map(callable) on a bare expression needs dtype=; "
                    "or use DataFrame.series_apply for inference"
                )
            from pandas_spark.functions import callables as C

            return _wrap(C.elementwise_udf(mapping, dtype, na_action=na_action)(self._col))
        pairs = []
        for k, v in dict(mapping).items():
            pairs.append(F.lit(k))
            pairs.append(F.lit(v))
        looked = F.element_at(F.create_map(*pairs), self._col)
        if default is not None:
            looked = F.coalesce(looked, F.lit(default))
        return _wrap(looked)

    def isin(self, values) -> "Expr":
        return _wrap(self._col.isin(list(values)))

    def isna(self) -> "Expr":
        # pandas treats NaN and NULL uniformly (dtypes/missing.py:99)
        return _wrap(self._col.isNull() | F.isnan(self._col.cast("double")))

    def notna(self) -> "Expr":
        return _wrap(~(self._col.isNull() | F.isnan(self._col.cast("double"))))

    def isnull(self) -> "Expr":
        return self.isna()

    def fillna(self, value) -> "Expr":
        return _wrap(F.coalesce(self._col, _lit_col(value)))

    def between(self, left, right, inclusive: str = "both") -> "Expr":
        lo, hi = _lit_col(left), _lit_col(right)
        ops = {
            "both": (self._col >= lo) & (self._col <= hi),
            "neither": (self._col > lo) & (self._col < hi),
            "left": (self._col >= lo) & (self._col < hi),
            "right": (self._col > lo) & (self._col <= hi),
        }
        return _wrap(ops[inclusive])

    def clip(self, lower=None, upper=None) -> "Expr":
        c = self._col
        if lower is not None:
            c = F.greatest(c, _lit_col(lower))
        if upper is not None:
            c = F.least(c, _lit_col(upper))
        # greatest/least SKIP nulls (a NULL input would clip to the
        # bound); pandas clip leaves NaN in place
        return _wrap(F.when(self._col.isNotNull(), c))

    def astype(self, dtype: str) -> "Expr":
        from pandas_spark.dtypes import to_spark_type

        return _wrap(self._col.cast(to_spark_type(dtype)))

    def where(self, cond, other=None) -> "Expr":
        return _wrap(
            F.when(_unwrap(cond), self._col).otherwise(_lit_col(other))
        )

    def mask(self, cond, other=None) -> "Expr":
        return _wrap(
            F.when(_unwrap(cond), _lit_col(other)).otherwise(self._col)
        )

    def round(self, decimals: int = 0) -> "Expr":
        # pandas rounds half-even — Spark's bround matches
        return _wrap(F.bround(self._col, decimals))

    def abs(self) -> "Expr":
        return _wrap(F.abs(self._col))

    # -- accessors -------------------------------------------------------
    @property
    def str(self):
        from pandas_spark.functions.strings import StringMethods

        return StringMethods(self._col)

    @property
    def dt(self):
        from pandas_spark.functions.datetimes import DatetimeMethods

        return DatetimeMethods(self._col)

    @property
    def period(self):
        from pandas_spark.functions.periods import PeriodMethods

        return PeriodMethods(self._col)

    def __repr__(self) -> str:
        return f"Expr({self._col})"


def _lit_col(v: Any) -> Column:
    v = _unwrap(v)
    return v if isinstance(v, Column) else F.lit(v)


def col(name: str) -> Expr:
    """Deferred reference to a column (pandas ``pd.col``, core/col.py:370).

    The name is a LITERAL pandas label, never a struct path — so names
    containing dots or backticks quote through the shared qi(), the
    same rule as the internal _fcol paths: Spark parses an unquoted
    ``F.col("price.usd")`` as struct-field access and raises
    UNRESOLVED_COLUMN (r9 ADVICE — verified live; the analyzer does
    NOT prefer an exact column-name match). Callers with genuine
    struct paths drop to raw ``F.col``/``F.col(...).getField``."""
    if "." in name or "`" in name:
        from pandas_spark.dtypes import qi

        return Expr(F.col(qi(name)))
    return Expr(F.col(name))


def lit(value: Any) -> Expr:
    return Expr(F.lit(value))


# ---------------------------------------------------------------------------
# pandas arithmetic semantics as Catalyst expression templates
# ---------------------------------------------------------------------------

def true_div(a: Column, b: Column) -> Column:
    """pandas ``/``: x/0 → ±inf, 0/0 → NaN (numpy rules); Spark gives NULL.

    The NULL-operand guard comes FIRST: ``NULL != 0`` is NULL (falsy),
    so without it a NULL divisor would fall through to the sign checks.
    """
    a_d, b_d = a.cast("double"), b.cast("double")
    # IEEE signed zero: x/-0.0 flips the infinity's sign. Spark has no
    # signbit(); the string form of -0.0 carries the sign.
    neg_zero = b_d.cast("string").startswith("-")
    pos_inf = ((a_d > 0) & ~neg_zero) | ((a_d < 0) & neg_zero)
    return (
        F.when(a_d.isNull() | b_d.isNull(), F.lit(None).cast("double"))
        .when(b_d != 0, a_d / b_d)
        .when(a_d == 0, F.lit(float("nan")))  # 0/0
        .when(pos_inf, F.lit(float("inf")))
        .otherwise(F.lit(float("-inf")))
    )


def floor_div(a: Column, b: Column) -> Column:
    """Python floor-division semantics (pandas); Spark's ``div`` truncates."""
    a_d, b_d = a.cast("double"), b.cast("double")
    q = F.floor(a_d / b_d)
    neg_zero = b_d.cast("string").startswith("-")
    pos_inf = ((a_d > 0) & ~neg_zero) | ((a_d < 0) & neg_zero)
    return (
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("double"))
        .when(b_d != 0, q)
        .when(a_d == 0, F.lit(float("nan")))
        .when(pos_inf, F.lit(float("inf")))
        .otherwise(F.lit(float("-inf")))
    )


def py_mod(a: Column, b: Column) -> Column:
    """Python modulo: result takes the sign of the divisor; Spark follows C."""
    m = ((a % b) + b) % b
    return (
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("double"))
        .when(b != 0, m)
        .otherwise(F.lit(float("nan")))
    )


# -- NumPy ufunc → Catalyst function tables ---------------------------------
_UFUNC_UNARY = {
    "sqrt": F.sqrt, "exp": F.exp, "expm1": F.expm1,
    "log": F.log, "log2": F.log2, "log10": F.log10, "log1p": F.log1p,
    "abs": F.abs, "absolute": F.abs, "fabs": F.abs,
    "floor": F.floor, "ceil": F.ceil,
    "trunc": lambda c: c.cast("long").cast("double"),  # toward zero
    "rint": F.rint, "sign": F.signum, "negative": lambda c: -c, "positive": lambda c: c,
    "sin": F.sin, "cos": F.cos, "tan": F.tan,
    "arcsin": F.asin, "arccos": F.acos, "arctan": F.atan,
    "sinh": F.sinh, "cosh": F.cosh, "tanh": F.tanh,
    "degrees": F.degrees, "radians": F.radians,
    "isnan": F.isnan, "cbrt": F.cbrt, "square": lambda c: c * c,
    "reciprocal": lambda c: F.lit(1.0) / c,
}
_UFUNC_BINARY = {
    "add": lambda a, b: a + b,
    "subtract": lambda a, b: a - b,
    "multiply": lambda a, b: a * b,
    "true_divide": lambda a, b: a / b,
    "divide": lambda a, b: a / b,
    "floor_divide": lambda a, b: a // b,
    "mod": lambda a, b: a % b,
    "remainder": lambda a, b: a % b,
    "power": lambda a, b: a ** b,
    "maximum": lambda a, b: _wrap(F.greatest(a.spark, b.spark)),
    "minimum": lambda a, b: _wrap(F.least(a.spark, b.spark)),
    "arctan2": lambda a, b: _wrap(F.atan2(a.spark, b.spark)),
    "hypot": lambda a, b: _wrap(F.hypot(a.spark, b.spark)),
}
