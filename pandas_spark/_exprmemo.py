"""Session-epoch memo of STATIC Column expression handles.

Several operators build large, completely static expression subtrees on
every invocation — the stopword-array folds of ``add_text_stats``, the
MinHash banding array, the in-bucket pair-expansion HOFs. Each build
pays one py4j round trip per node plus per-element list conversion for
wide ``F.array(...)`` literals (~0.25 ms each on this box), which for
the headline queries is pure fixed driver cost repeated identically per
run (guide §1.2: the fixed intercept, not the slope).

A Column wraps an immutable *unresolved* Catalyst expression — the same
subtree denotes the same thing in every plan it appears in, and Catalyst
transforms copy rather than mutate, so the handle can be built once per
session and reused. This memoizes EXPRESSION HANDLES (plan text in
object form) — never plans' results, rows, or anything derived from
data. Keys must capture every parameter the builder closes over.

Invalidation: keyed on the live JVM view's identity — a restarted
SparkSession/JVM starts a fresh map (stale JVM handles are never
returned). Bounded against unbounded key streams.
"""

from __future__ import annotations

from typing import Callable

_memo: dict = {"epoch": None, "m": {}}
_MEMO_MAX = 4096


def memo_column(key: tuple, builder: Callable):
    """Return ``builder()``, memoized per (live JVM, ``key``)."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    epoch = id(sc._jvm) if sc is not None else None
    if _memo["epoch"] != epoch:
        _memo["epoch"] = epoch
        _memo["m"] = {}
    m = _memo["m"]
    hit = m.get(key)
    if hit is None:
        if len(m) > _MEMO_MAX:
            m.clear()
        hit = m[key] = builder()
    return hit
