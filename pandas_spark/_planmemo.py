"""Cross-build memo of constructed Spark Datasets (a plan cache).

Classic-mode pyspark analyzes EAGERLY: every transform constructs a
Dataset and runs the full analyzer + checkAnalysis over it — measured
~5-8 ms per transform on this box (186 analyzer-rule invocations for a
trivial select), ~10-14 Datasets per headline query build, so ~60-100 ms
of pure fixed driver cost per query PER BENCH RUN (guide §1.2: the
fixed intercept — a real cluster client pays it once per query too).

This memoizes the CONSTRUCTED Dataset object per
(parent Dataset identity, operation, argument fingerprint): the plan in
object form — the same class of metadata cache as the scan-footer and
tiny-dim-compose memos (OPTIMIZATION_r11.md "Caching policy"). Plans
are immutable; every action on a memoized Dataset recomputes from the
parquet/cache inputs. No rows, no results, nothing data-derived is
stored.

Correctness of the key:

* Column arguments are fingerprinted by their **normalized ColumnNode**
  — ``jc.node().normalized()`` — compared JVM-side with
  ``hashCode``/``equals``. This is exactly the equality Spark 4's own
  ``Column.__eq__`` uses: normalization strips only call-site origins;
  literal types, function names, every semantic field participates in
  case-class equality (a string literal never collides with a date
  literal even though their ``toString`` forms can).
* Python/Scala UDF columns arrive as ``ExpressionColumnNode`` whose
  embedded expression keeps a stack-trace origin that ``normalized()``
  does not strip — two builds never fingerprint-equal, so UDF-bearing
  plans simply never hit the memo (fail-safe, not fail-wrong).
* Non-deterministic leaf generators (``monotonically_increasing_id``)
  fingerprint equal across builds — safe: their semantics are
  per-action evaluation, not instance identity, and Spark re-instances
  duplicate attribute ids when one plan object appears on both sides
  of a join (DeduplicateRelations).
* The key includes ``spark.sql.ansi.enabled`` — the one analysis-mode
  conf the test suites flip — because eager analysis bakes coercion
  into the constructed plan.

Invalidation is structural: entries key on the PARENT Dataset's python
object identity (weakref-guarded against id reuse) and die with the
JVM epoch. A parent that is itself rebuilt per query build simply never
hits — the memo composes leaf-up from the stable scan-cache objects.

``SPARK_GRAFT_PLAN_MEMO=0`` disables the whole layer.
"""

from __future__ import annotations

import os
import weakref

_memo: dict = {"epoch": None, "m": {}}
_MEMO_MAX = 4096
_DISABLED = os.environ.get("SPARK_GRAFT_PLAN_MEMO", "1") == "0"


def _epoch(session):
    try:
        return (
            id(session._jvm) if hasattr(session, "_jvm") else id(session._sc._jvm),
            session.conf.get("spark.sql.ansi.enabled", "false"),
        )
    except Exception:
        return None


def _col_fp(col):
    """(normalized ColumnNode handle, its JVM hashCode) for a pyspark
    Column — or None when it cannot be fingerprinted."""
    try:
        node = col._jc.node().normalized()
        return (node, node.hashCode())
    except Exception:
        return None


def plan_memo(parent, op: str, static_key, cols, builder):
    """Return ``builder()``, memoized per (parent identity, op, args).

    ``parent``     — the pyspark DataFrame(s) the op applies to (one or
                     a tuple; identity-keyed, weakref-guarded).
    ``static_key`` — hashable python-only part of the args (names,
                     how, SQL text, ...).
    ``cols``       — pyspark Columns participating in the op, matched
                     by normalized-node JVM equality. Empty/None for
                     string-only ops (zero JVM calls on the hit path).
    """
    if _DISABLED:
        return builder()
    parents = parent if isinstance(parent, tuple) else (parent,)
    try:
        session = parents[0].sparkSession
        epoch = _epoch(session)
    except Exception:
        return builder()
    if epoch is None:
        return builder()
    if _memo["epoch"] != epoch:
        _memo["epoch"] = epoch
        _memo["m"] = {}
    m = _memo["m"]

    pids = tuple(id(p) for p in parents)
    # Object-identity fast path: interned/static Column objects (the
    # expression-subtree memo returns the SAME handle across builds)
    # match by `is` — zero JVM calls; the fingerprint path below costs
    # 4 py4j round trips per Column (node/normalized/hashCode/equals),
    # which measured as HALF the residual build chatter of the widest
    # query. A dead weakref (id reuse) fails the `is` check and falls
    # through to a fresh fingerprint lookup.
    idkey = None
    if cols:
        idkey = (pids, op, static_key, tuple(id(c) for c in cols), "ids")
        hit = m.get(idkey)
        if hit is not None:
            prefs, crefs, out = hit
            if all(r() is p for r, p in zip(prefs, parents)) and all(
                r() is c for r, c in zip(crefs, cols)
            ):
                return out

    fps = []
    for c in cols or ():
        fp = _col_fp(c)
        if fp is None:
            return builder()  # unfingerprintable arg: never memo
        fps.append(fp)
    key = (
        pids,
        op,
        static_key,
        tuple(h for _, h in fps),
    )
    hit = m.get(key)
    if hit is not None:
        prefs, pnodes, out = hit
        if all(r() is p for r, p in zip(prefs, parents)) and all(
            pn.equals(n) for pn, (n, _) in zip(pnodes, fps)
        ):
            _store_idkey(m, idkey, parents, cols, out)
            return out
    out = builder()
    if len(m) > _MEMO_MAX:
        m.clear()
    try:
        m[key] = (
            tuple(weakref.ref(p) for p in parents),
            tuple(n for n, _ in fps),
            out,
        )
        _store_idkey(m, idkey, parents, cols, out)
    except TypeError:
        pass  # unweakrefable parent: skip memoization
    return out


def _store_idkey(m, idkey, parents, cols, out) -> None:
    if idkey is None:
        return
    try:
        m[idkey] = (
            tuple(weakref.ref(p) for p in parents),
            tuple(weakref.ref(c) for c in cols),
            out,
        )
    except TypeError:
        pass  # unweakrefable column: identity path unavailable
