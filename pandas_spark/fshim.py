"""``pyspark.sql.functions`` facade with backtick-safe ``col``.

pyspark's ``F.col`` parses its argument as an attribute path and
raises INVALID_ATTRIBUTE_NAME_SYNTAX on any name containing a stray
backtick — but pandas accepts ANY string as a column label (reference
pandas ``frame.py`` ``__getitem__``), so a user column named
``a`b`` must work through every engine operator. Engine modules
import ``functions as F`` from HERE instead of pyspark; the only
override is ``col``:

* names containing a backtick are quoted through the shared ``qi()``
  (dtypes.py) — doubling embedded backticks — unless the string is
  ALREADY a well-formed quoted identifier (the ``_fcol``/``qi`` call
  sites pass pre-quoted names through this same facade);
* everything else (including dotted names) passes through untouched:
  a dotted string may legitimately be a struct path at raw-F.col call
  sites, so the dot policy stays with the callers (``_fcol`` for
  literal pandas labels, raw for struct access).

This cannot break a working call: an unquoted backtick-containing
name NEVER resolved (pyspark rejects it before analysis), and a
well-formed pre-quoted name is passed through byte-identical.
Everything else delegates via module ``__getattr__`` (PEP 562), so
the facade tracks pyspark's full surface with zero maintenance.

Closes the COVERAGE.md batch-40 KNOWN LIMIT (round-9 verdict #3).
"""

from __future__ import annotations

from pyspark.sql import functions as _F


def _well_formed_quoted(name: str) -> bool:
    """True if ``name`` is already a complete quoted identifier:
    starts and ends with a backtick and every interior backtick is
    doubled — i.e. exactly what ``qi()`` emits."""
    if len(name) < 2 or name[0] != "`" or name[-1] != "`":
        return False
    return name[1:-1].replace("``", "").count("`") == 0


# ---------------------------------------------------------------------------
# Column/literal interning (guide §1.2 — the fixed plan-build floor)
# ---------------------------------------------------------------------------
# A Column wraps an immutable unresolved Catalyst expression: col("x")
# and lit(5) denote the same expression wherever they appear, so the
# JVM handle can be built once per session and reused across every
# plan — one py4j round trip the first time, a dict hit after (the
# engine builds the same few hundred col/lit nodes thousands of times
# across a session's plan constructions). This interns EXPRESSION
# HANDLES, never plans or results. Keyed on the live SparkContext's
# JVM view so a restarted JVM starts clean; bounded so adversarial
# streams of distinct literals (fuzz tests) can't grow it unboundedly.

_INTERN_MAX = 8192
_intern: dict = {"epoch": None, "lit": {}, "col": {}}
# literal types whose (type, value) key is hashable, immutable, and
# equality-faithful for Catalyst literal construction. float NaN never
# equals itself → always misses, harmlessly. bool/int disambiguated by
# the type in the key.
_LIT_TYPES = (bool, int, float, str, type(None))


def _intern_maps():
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    epoch = id(sc._jvm) if sc is not None else None
    if _intern["epoch"] != epoch:
        _intern["epoch"] = epoch
        _intern["lit"] = {}
        _intern["col"] = {}
    return _intern["lit"], _intern["col"]


def lit(value):
    if type(value) not in _LIT_TYPES:
        return _F.lit(value)
    lits, _ = _intern_maps()
    key = (type(value), value)
    c = lits.get(key)
    if c is None:
        if len(lits) >= _INTERN_MAX:
            lits.clear()
        c = lits[key] = _F.lit(value)
    return c


def col(name):
    if isinstance(name, str) and "`" in name and not _well_formed_quoted(name):
        return _F.col("`" + name.replace("`", "``") + "`")
    if not isinstance(name, str):
        return _F.col(name)
    _, cols = _intern_maps()
    c = cols.get(name)
    if c is None:
        if len(cols) >= _INTERN_MAX:
            cols.clear()
        c = cols[name] = _F.col(name)
    return c


def _coerce(arg):
    if isinstance(arg, str) and "`" in arg:
        return col(arg)
    return arg


# pyspark functions that accept ``str | Column`` and treat the str as
# a column NAME — resolved through the same backtick-rejecting
# attribute parser as F.col. The shim coerces a backtick-containing
# str first arg to a quoted Column; clean strings pass through (same
# no-behavior-change guarantee as col above). _COLV are variadic
# all-columns functions: every positional str arg is a name there.
_COL1 = frozenset({
    "sum", "max", "min", "avg", "mean", "count", "median", "mode",
    "product", "first", "last", "lag", "lead", "nth_value",
    "collect_list", "collect_set", "sum_distinct", "any_value",
    "approx_count_distinct", "stddev", "stddev_samp", "stddev_pop",
    "variance", "var_samp", "var_pop", "skewness", "kurtosis",
    "abs", "sqrt", "exp", "log", "log2", "log10", "floor", "ceil",
    "round", "lower", "upper", "length", "trim", "asc", "desc",
    "isnan", "isnull", "sort_array", "size", "reverse", "explode",
    "explode_outer", "posexplode", "asc_nulls_last",
    "desc_nulls_last", "asc_nulls_first", "desc_nulls_first",
})
_COLV = frozenset({
    "coalesce", "greatest", "least", "struct", "array", "concat",
    "countDistinct", "count_distinct", "hash", "xxhash64",
    "min_by", "max_by",
})


def _wrap1(fn):
    def wrapped(*args, **kw):
        if args:
            args = (_coerce(args[0]),) + args[1:]
        return fn(*args, **kw)
    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    return wrapped


def _wrapv(fn):
    def wrapped(*args, **kw):
        return fn(*[_coerce(a) for a in args], **kw)
    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    return wrapped


def __getattr__(attr: str):
    fn = getattr(_F, attr)
    if attr in _COL1:
        fn = _wrap1(fn)
    elif attr in _COLV:
        fn = _wrapv(fn)
    # cache on the module so __getattr__ runs once per name
    globals()[attr] = fn
    return fn
