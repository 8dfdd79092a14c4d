"""Joins: pandas merge semantics compiled to Catalyst join plans.

pandas ``merge`` (reference: pandas/core/reshape/merge.py:149,
_MergeOperation:931) supports eight ``how`` values (merge.py:186-204),
matches NULL==NULL keys (docstring warning merge.py:177-179), applies
``suffixes`` to overlapping columns, and offers ``indicator`` and
``validate``. Physical strategy (hash vs sort-merge vs broadcast) is
pandas' dispatch at merge.py:2117; here it's Catalyst + AQE's job —
we only emit the logical join with the right condition.

``merge_asof`` (merge.py:644, _AsOfMerge:2409) has no Spark primitive;
the scalable compilation is union-both-sides + a partitioned ordered
window carrying the last right row forward (one shuffle on the ``by``
key, no range explosion) — SURVEY.md §2.3 strategy (a).
"""

from __future__ import annotations

import os

from typing import Sequence

from pyspark.sql import Column, DataFrame as SparkDF, Window as W
from pandas_spark import fshim as F  # backtick-safe F.col facade

from pandas_spark.dtypes import ordinal_seconds
from pandas_spark.frame import DataFrame, ORDER_COL
from pandas_spark._planmemo import plan_memo

_HOWS = {
    "inner": "inner",
    "left": "left",
    "right": "right",
    "outer": "full",
    "full": "full",
    "cross": "cross",
    "left_anti": "left_anti",
    "anti": "left_anti",
    "right_anti": "right_anti",
    "semi": "left_semi",
    "left_semi": "left_semi",
}


def _aslist(v) -> list[str]:
    if v is None:
        return []
    return [v] if isinstance(v, str) else list(v)


from pandas_spark.dtypes import qi as _qi  # shared SQL identifier quoter
from pandas_spark.dtypes import dfitem as _it  # literal-label sdf[name]


_L_ORD, _R_ORD = "__mlord", "__mrord"


def _side_slots(frame: DataFrame, prefix: str):
    """A join side's declared row order as an ordered SLOT list carried
    INTO the join, so the result can reproduce pandas' merge ordering
    (merge.py: output rows follow the preserved side's order, other
    side breaks ties; sort=False default). Slots are
    ``('val', col, asc, napos)`` — a value sort key that survives the
    join as a real column (zero payload) — or ``('id', col)`` — an
    internal order tiebreak column, renamed side-locally so two sides
    never collide. Map-only; ids are one 8-byte column each."""
    from pandas_spark.frame import is_order_col

    sdf = frame._sdf
    if frame._sort_spec:
        ren: dict[str, str] = {}
        slots: list = []
        for c, a, p in frame._sort_spec:
            if is_order_col(c):
                # internal tiebreak (e.g. the stable-sort id appended
                # by sort_values, or a previous merge's order struct):
                # ride as an id slot under a side-local name
                if c not in ren:
                    ren[c] = f"{prefix}{len(ren)}__"
                slots.append(("id", ren[c]))
            else:
                slots.append(("val", c, a, p))
        extra = [c for c in sdf.columns if is_order_col(c) and c not in ren]
        if ren:
            sdf = plan_memo(
                sdf, "renamed", tuple(sorted(ren.items())), None,
                lambda s=sdf: s.withColumnsRenamed(ren),
            )
        if extra:
            sdf = plan_memo(
                sdf, "drop", tuple(extra), None,
                lambda s=sdf: s.drop(*extra),
            )
        return sdf, slots
    name = f"{prefix}0__"
    if frame._order_col and frame._order_col in sdf.columns:
        return (
            plan_memo(
                sdf, "renamed", ((frame._order_col, name),), None,
                lambda: sdf.withColumnRenamed(frame._order_col, name),
            ),
            [("id", name)],
        )
    # mono-id is per-action evaluation: fingerprint-stable reuse across
    # builds is exactly the scan-cache semantics (_planmemo docstring)
    return (
        plan_memo(
            sdf, "order_stamp", name, None,
            lambda: sdf.withColumn(name, F.monotonically_increasing_id()),
        ),
        [("id", name)],
    )


def _merged_order(out: SparkDF, spark_how: str, l_slots, r_slots,
                  l_ren: dict, r_ren: dict, out_keys=()):
    """Combine the two sides' order slots into the result's declared
    order (pandas merge.py, sort=False):

    * inner/left/cross — left order first, right order breaks ties
      among multiple matches;
    * right — right order first, left breaks ties;
    * full/outer — pandas SORTS the join keys lexicographically (NaN
      keys last), then left order, then right order (unmatched rows
      slot in by key; their missing side-id is NULL → sorts last
      within the key under na_position='last');
    * semi/anti — left order only (no right columns survive).

    Runs of consecutive id slots pack into one internal struct column
    ((is_null, value) pairs → plain lexicographic asc sorts unmatched-
    outer NULLs last for ANY id type, incl. a chained merge's struct
    ids); value slots stay as the real output columns they already are.
    Returns (sdf, sort_spec, order_col)."""
    from pandas_spark.frame import ORDER_COL

    if spark_how == "right":
        sides = [(r_slots, r_ren), (l_slots, l_ren)]
    elif spark_how in ("left_semi", "left_anti"):
        sides = [(l_slots, l_ren)]
    else:
        sides = [(l_slots, l_ren), (r_slots, r_ren)]
    slots: list = [("val", k, True, "last") for k in out_keys]
    for sl, ren in sides:
        for s in sl:
            if s[0] == "val":
                slots.append(("val", ren.get(s[1], s[1]), s[2], s[3]))
            else:
                slots.append(s)
    spec: list = []
    structs: list = []  # (name, [id run]) — materialized in ONE projection
    dropped: set = set()
    i = 0
    while i < len(slots):
        if slots[i][0] == "val":
            spec.append((slots[i][1], slots[i][2], slots[i][3]))
            i += 1
            continue
        run = []
        while i < len(slots) and slots[i][0] == "id":
            run.append(slots[i][1])
            i += 1
        name = ORDER_COL if not structs else f"__ord{len(structs)}__"
        structs.append((name, run))
        dropped.update(run)
        spec.append((name, True, "last"))
    if structs:
        # single selectExpr (one py4j round trip, one analysis pass)
        # instead of ~5 Column-builder calls per id column — plan
        # construction is round-trip-bound at small scale
        struct_exprs = [
            "named_struct("
            + ", ".join(
                f"'o{k}', named_struct('m', {_qi(c)} IS NULL, 'v', {_qi(c)})"
                for k, c in enumerate(run)
            )
            + f") AS {_qi(name)}"
            for name, run in structs
        ]
        mo_exprs = [
            _qi(c) for c in out.columns if c not in dropped
        ] + struct_exprs
        src = out
        out = plan_memo(
            src, "selectExpr", tuple(mo_exprs), None,
            lambda: src.selectExpr(*mo_exprs),
        )
    first_internal = structs[0][0] if structs else None
    if len(spec) == 1 and first_internal:
        return out, (), first_internal
    return out, tuple(spec), first_internal


def _suffix_renames(lsdf: SparkDF, rsdf: SparkDF, lk, rk, suffixes):
    overlap = set(lsdf.columns) & set(rsdf.columns)
    same_key = {l for l, r in zip(lk, rk) if l == r}
    return (
        {c: c + suffixes[0] for c in overlap - same_key},
        {c: c + suffixes[1] for c in overlap - same_key},
    )


def merge(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | None = None,
    how: str = "inner",
    left_on: str | Sequence[str] | None = None,
    right_on: str | Sequence[str] | None = None,
    suffixes: tuple[str, str] = ("_x", "_y"),
    indicator: bool = False,
    validate: str | None = None,
    broadcast: str | None = None,
    sort: bool = False,
) -> DataFrame:
    """pandas ``pd.merge``. ``broadcast='right'|'left'`` hints the small side.

    Row ORDER matches pandas (merge.py, sort=False): preserved-side
    order first, the other side's order breaking ties among multiple
    matches, unmatched outer rows appended — carried as declared-order
    metadata (sort keys or one id column), so order-sensitive ops after
    a merge (rolling, ffill, head) see pandas' row order without any
    physical sort in the join plan."""
    if how not in _HOWS:
        raise ValueError(f"how must be one of {sorted(_HOWS)}, got {how!r}")
    if how == "cross" and (on is not None or left_on is not None or right_on is not None):
        # pandas MergeError (merge.py:149 validation): cross takes no keys
        raise ValueError(
            "Can not pass on, right_on, left_on for how='cross'"
        )
    # pandas suffix rules (reference merge.py _items_overlap_with_suffix):
    # a None component keeps that side's name unsuffixed; BOTH None (or
    # both empty) with any overlapping column raises
    suffixes = tuple("" if s is None else str(s) for s in suffixes)
    if suffixes == ("", ""):
        overlap = set(left.columns) & set(right.columns)
        lk0 = _aslist(left_on) or _aslist(on)
        rk0 = _aslist(right_on) or _aslist(on)
        overlap -= {l for l, r in zip(lk0 or [], rk0 or []) if l == r}
        if overlap:
            raise ValueError(
                f"columns overlap but no suffix specified: {sorted(overlap)}"
            )
    lsdf, l_slots = _side_slots(left, _L_ORD)
    if _HOWS[how] in ("left_semi", "left_anti"):
        rsdf, r_slots = right.spark, []
    else:
        rsdf, r_slots = _side_slots(right, _R_ORD)

    def _out_nonnull(lk: list[str], rk: list[str], spark_how: str) -> frozenset:
        """Null-free proofs surviving the join, under the output's
        suffix renames: the preserved side(s) can't gain NULLs."""
        overlap = set(lsdf.columns) & set(rsdf.columns)
        same_key = {l for l, r in zip(lk, rk) if l == r}
        ren = overlap - same_key
        l_out = {c + suffixes[0] if c in ren else c for c in left._nonnull}
        r_out = {c + suffixes[1] if c in ren else c
                 for c in right._nonnull if c not in same_key}
        if spark_how in ("inner", "cross"):
            return frozenset(l_out | r_out)
        if spark_how in ("left", "left_semi", "left_anti"):
            return frozenset(l_out)
        if spark_how == "right":
            return frozenset(r_out)
        return frozenset()

    def _out_bounds(lk: list[str], rk: list[str], spark_how: str) -> dict:
        """Value-range proofs (bounds.py) surviving the join, under the
        output's suffix renames. Unlike null-proofs these survive EVERY
        how: a join can only drop rows or add NULLs — never alter a
        proven column's non-NULL values, and NULL is neither NaN nor
        inf. The full-join coalesced same-name key takes the union
        interval when both sides are proven."""
        overlap = set(lsdf.columns) & set(rsdf.columns)
        same_key = {l for l, r in zip(lk, rk) if l == r}
        ren = overlap - same_key
        out = {}
        for c, b in left._bounds.items():
            if c in same_key and spark_how in ("full", "right"):
                rb = right._bounds.get(c)
                if rb is not None:
                    out[c] = (min(b[0], rb[0]), max(b[1], rb[1]), b[2] and rb[2])
                continue
            out[c + suffixes[0] if c in ren else c] = b
        if spark_how not in ("left_semi", "left_anti"):
            for c, b in right._bounds.items():
                if c in same_key:
                    continue
                out.setdefault(c + suffixes[1] if c in ren else c, b)
        return out

    if how == "cross":
        out = _disambiguate_and_join(
            lsdf, rsdf, [], [], "cross", suffixes, indicator, broadcast,
            left._nonnull, right._nonnull,
        )
        l_ren, r_ren = _suffix_renames(lsdf, rsdf, [], [], suffixes)
        out, spec, oc = _merged_order(out, "cross", l_slots, r_slots, l_ren, r_ren)
        return DataFrame(out, order_col=oc, sort_spec=spec,
                         nonnull=_out_nonnull([], [], "cross"),
                         bounds=_out_bounds([], [], "cross"))

    lk = _aslist(left_on) or _aslist(on)
    rk = _aslist(right_on) or _aslist(on)
    if not lk or not rk:
        # join on shared index columns, else intersection of column names
        shared = [c for c in left.columns if c in set(right.columns)]
        lk = rk = (list(left._index_cols) if left._index_cols else shared)
    if not lk:
        # pandas raises MergeError here; silently passing empty keys to
        # join() would produce a cartesian product
        raise ValueError(
            "no columns to merge on: no on/left_on/right_on, no index "
            "columns, and no common column names (use how='cross' for a "
            "cartesian product)"
        )
    if len(lk) != len(rk):
        raise ValueError("left_on and right_on must be same length")

    # pandas key-dtype compatibility (reference merge.py
    # _maybe_coerce_merge_keys): merging an int key against a string
    # key RAISES — Spark would instead insert an implicit cast and
    # silently match 1 == "1" (caught by the r11 reference merge
    # sweep). Families: numerics interchange (pandas allows
    # int64↔float64), timestamps interchange; everything else must
    # match its own family. Plan-time only, no scan.
    _lt, _rt = dict(lsdf.dtypes), dict(rsdf.dtypes)

    def _key_family(dt: str) -> str:
        base = dt.split("(")[0]
        if base in ("tinyint", "smallint", "int", "bigint", "float",
                    "double", "decimal"):
            return "numeric"
        if base in ("timestamp", "timestamp_ntz"):
            return "timestamp"
        if base in ("string", "varchar", "char"):
            return "string"
        return base  # boolean, date, binary, array<…>, void, …

    for _l, _r in zip(lk, rk):
        lt, rt = _lt.get(_l), _rt.get(_r)
        if (
            lt and rt and lt not in ("void", "null") and rt not in ("void", "null")
            and _key_family(lt) != _key_family(rt)
        ):
            raise ValueError(
                f"You are trying to merge on {lt} and {rt} columns for "
                f"key {_l!r}. If you wish to proceed you should cast the "
                "key to a common type first"
            )

    if validate:
        _validate(lsdf, rsdf, lk, rk, validate)

    if how == "right_anti":
        # pandas right_anti = swapped left_anti with right's columns
        return merge(right, left, left_on=rk, right_on=lk, how="left_anti",
                     suffixes=(suffixes[1], suffixes[0]))

    out = _disambiguate_and_join(
        lsdf, rsdf, lk, rk, _HOWS[how], suffixes, indicator, broadcast,
        left._nonnull, right._nonnull, right._rows_max,
        r_anchor=(
            right._sdf,
            right._order_col,
            tuple(tuple(s) for s in (right._sort_spec or ())),
        ),
    )
    l_ren, r_ren = _suffix_renames(lsdf, rsdf, lk, rk, suffixes)
    out_keys: list[str] = []
    if _HOWS[how] == "full":
        # pandas outer merge with sort=False still sorts the join keys
        # lexicographically, NaN keys last (merge.py get_join_indexers
        # over the sorted union); left/right order only break key ties
        for i, (lc, rc) in enumerate(zip(lk, rk)):
            if lc == rc:
                out_keys.append(lc)  # coalesced shared key column
            else:
                kn = f"__ordk{i}__"
                out = out.withColumn(
                    kn,
                    F.coalesce(
                        F.col(l_ren.get(lc, lc)), F.col(r_ren.get(rc, rc))
                    ),
                )
                out_keys.append(kn)
    out, spec, oc = _merged_order(
        out, _HOWS[how], l_slots, r_slots, l_ren, r_ren, out_keys
    )
    res = DataFrame(out, order_col=oc, sort_spec=spec,
                    nonnull=_out_nonnull(lk, rk, _HOWS[how]),
                    bounds=_out_bounds(lk, rk, _HOWS[how]))
    if sort:
        # pandas merge(sort=True): join keys lexicographically; the
        # output key name is the LEFT name (or coalesced same-name key)
        keys = [c for c in (lk if _HOWS[how] != "right" else rk) if c in res.columns]
        if keys:
            res = res.sort_values(keys)
    return res


_TINY_DIM_ROWS = 256
_TINY_DIM_LITERALS = 4096
_TINY_KEY_TYPES = ("tinyint", "smallint", "int", "bigint", "string",
                   "date", "boolean")


def _sql_lit(v, dtype: str) -> str:
    """One driver value → a Spark SQL literal of the column's type.
    Raises on shapes it can't spell (arrays, structs, binary, decimal)
    — the caller's try/except then takes the real join."""
    import datetime
    import math

    if v is None:
        return f"CAST(NULL AS {dtype})"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return f"CAST({v} AS {dtype})" if dtype != "bigint" else str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
        return f"CAST('{v!r}' AS {dtype if dtype in ('float', 'double') else 'double'})"
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(v, datetime.datetime):
        base = f"'{v.replace(tzinfo=None).isoformat(sep=' ')}'"
        return (f"TIMESTAMP_NTZ {base}"
                if dtype.startswith("timestamp_ntz") else f"TIMESTAMP {base}")
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    raise TypeError(f"unliteralizable {type(v).__name__} for {dtype}")


def _tiny_dim_compose(lsdf2, rtag, lk2, rk2, rk_tag, how, indicator,
                      r_rows_max):
    """Fold a footer-proven TINY driver-local dim join into literal
    expressions — the zero-job broadcast (round-9 verdict #2).

    Even a LocalTableScan dim pays a BroadcastExchange JOB per join
    (measured: 2 jobs of the sf0.1 star join's 3 are dim broadcast
    builds). When the right side is a driver-local relation (tiny-dim
    read path, sources/io.py) with ≤256 unique non-null keys on ONE
    integral/string/date key, the join IS a lookup table: each right
    column becomes ``element_at(create_map(<literals>), left_key)``
    (cast back to its declared type), membership becomes a literal
    IN-set — all whole-stage-codegen'd, no exchange, no job, and
    Catalyst constant-folds the maps once per task. Collecting the dim
    is driver-side (``isLocal`` ⇒ ``executeCollect``), not a job.

    Falls back (returns None) for anything outside the proof: >1 key,
    float keys (NaN), duplicate or NULL right keys (a map can't
    duplicate rows), non-literalizable values, indicator=, or a right
    side that isn't local — the 100 TB case by construction.
    """
    if (
        how not in ("inner", "left", "left_semi", "left_anti")
        or indicator
        or len(lk2) != 1
        or r_rows_max is None
        or not 0 < r_rows_max <= _TINY_DIM_ROWS
    ):
        return None
    try:
        from pandas_spark.frame import is_order_col

        # the right side's order-id slot (a nondeterministic mono-id)
        # blocks locality AND can't literalize — but with UNIQUE right
        # keys (checked below) each left row matches ≤1 right row, so
        # the right-side tiebreak can never decide an order: re-add it
        # as a constant after the compose
        ordcols = [c for c in rtag.columns if is_order_col(c)]
        core = rtag.drop(*ordcols) if ordcols else rtag
        opt = core._jdf.queryExecution().optimizedPlan()
        if opt.getClass().getSimpleName() != "LocalRelation":
            return None
        ktype = dict(core.dtypes).get(rk_tag + rk2[0], "")
        if ktype not in _TINY_KEY_TYPES:
            return None
        rows = core.collect()
        if not rows:
            return None  # empty dim: the real join handles it
        kcol = rk_tag + rk2[0]
        keys = [r[kcol] for r in rows]
        if (
            len(rows) > _TINY_DIM_ROWS
            or len(rows) * (len(core.columns) + 1) > _TINY_DIM_LITERALS
            or len(set(keys)) != len(keys)
            or any(k is None for k in keys)
        ):
            return None
        if how == "left_semi":
            klits = [_sql_lit(k, ktype) for k in keys]
            recipe = ("where", f"{_qi(lk2[0])} IN ({', '.join(klits)})", None)
            return _replay_compose(lsdf2, recipe), recipe
        if how == "left_anti":
            # NULL left keys match nothing (right keys proven
            # non-null) — pandas anti KEEPS them; NOT IN over a NULL
            # key is NULL (filtered), so keep NULLs explicitly
            klits = [_sql_lit(k, ktype) for k in keys]
            k_sql = _qi(lk2[0])
            recipe = (
                "where",
                f"{k_sql} IS NULL OR {k_sql} NOT IN ({', '.join(klits)})",
                None,
            )
            return _replay_compose(lsdf2, recipe), recipe
        # SQL-text construction: the Column-builder form costs 2·rows
        # py4j round trips PER COLUMN (~0.2 s of pure plan build on the
        # 25-row nation dim) — one parsed selectExpr is ~3 calls total
        dt = dict(core.dtypes)
        key_sql = _qi(lk2[0])
        klits = [_sql_lit(k, ktype) for k in keys]
        exprs = ["*"]
        for c in core.columns:
            pairs = ", ".join(
                f"{kl}, {_sql_lit(r[c], dt[c])}" for kl, r in zip(klits, rows)
            )
            exprs.append(
                f"CAST(element_at(map({pairs}), {key_sql}) AS {dt[c]}) "
                f"AS {_qi(c)}"
            )
        rt = dict(rtag.dtypes)
        for c in ordcols:  # constant: can never break a tie (unique keys)
            exprs.append(f"CAST(0 AS {rt[c]}) AS {_qi(c)}")
        where_sql = (
            f"{key_sql} IN ({', '.join(klits)})" if how == "inner" else None
        )
        recipe = ("select", where_sql, exprs)
        return _replay_compose(lsdf2, recipe), recipe
    except Exception:
        return None  # any unliteralizable shape takes the real join


def _replay_compose(lsdf2, recipe):
    """Apply a tiny-dim compose recipe (pure SQL text) to the left side."""
    kind, where_sql, exprs = recipe
    if kind == "where":
        return plan_memo(
            lsdf2, "filter_sql", where_sql, None,
            lambda: lsdf2.where(where_sql),
        )
    src = (
        plan_memo(
            lsdf2, "filter_sql", where_sql, None,
            lambda: lsdf2.where(where_sql),
        )
        if where_sql
        else lsdf2
    )
    return plan_memo(
        src, "selectExpr", tuple(exprs), None,
        lambda: src.selectExpr(*exprs),
    )


# (weakref(rsdf), recipe) keyed on the join shape: the literal-map SQL
# of a tiny-dim compose depends only on the memoized driver-local dim
# (the _SCAN_CACHE object — stable identity until the file changes),
# the rename map and the join keys/how. Re-deriving it each build cost
# ~90 ms of py4j (optimizedPlan probe + collect + dtypes) per merge on
# the star join; replaying the cached SQL is 2 round trips. Plan-TEXT
# metadata caching, same class as _SCAN_CACHE — results are computed
# fresh by every action. The weakref guards id() reuse: a dead or
# different rsdf object misses and re-derives.
_TINY_COMPOSE_MEMO: dict = {}


def _disambiguate_and_join(
    lsdf: SparkDF,
    rsdf: SparkDF,
    lk: list[str],
    rk: list[str],
    how: str,
    suffixes: tuple[str, str],
    indicator: bool,
    broadcast: str | None,
    l_nonnull: frozenset = frozenset(),
    r_nonnull: frozenset = frozenset(),
    r_rows_max: int | None = None,
    r_anchor: tuple | None = None,
) -> SparkDF:
    semi_like = how in ("left_semi", "left_anti")
    # pandas indicator=: True -> '_merge', a string names the column
    ind_name = indicator if isinstance(indicator, str) else "_merge"
    # internal tag names must never collide with USER columns: a column
    # literally named '__rk_<key>' (or '__lp__'/'__rp__') would make the
    # plain-name output projection ambiguous where the old qualified
    # refs resolved — grow the prefix until no input column carries it
    all_cols = set(lsdf.columns) | set(rsdf.columns)
    rk_tag = "__rk_"
    while any(c.startswith(rk_tag) for c in all_cols):
        rk_tag = "_" + rk_tag
    lp_col, rp_col = "__lp__", "__rp__"
    while lp_col in all_cols or rp_col in all_cols:
        lp_col, rp_col = "_" + lp_col, "_" + rp_col
    # rename overlapping non-key output columns with pandas suffixes
    overlap = set(lsdf.columns) & set(rsdf.columns)
    same_key = {l for l, r in zip(lk, rk) if l == r}
    l_ren = {c: c + suffixes[0] for c in overlap - same_key}
    r_ren = {c: c + suffixes[1] for c in overlap - same_key}
    # internal aliases for the join keys to build explicit conditions
    # (skip empty/batched renames — each withColumnRenamed is a py4j
    # round trip and analysis pass; chains of merges add them up)
    lsdf2 = (
        plan_memo(
            lsdf, "renamed", tuple(sorted(l_ren.items())), None,
            lambda: lsdf.withColumnsRenamed(l_ren),
        )
        if l_ren
        else lsdf
    )
    lk2 = [l_ren.get(c, c) for c in lk]
    rk2 = [r_ren.get(c, c) for c in rk]
    # right side: suffix renames AND the __rk_ key tags in ONE rename
    # (each withColumnsRenamed is an eager Catalyst analysis pass over
    # the whole plan — classic-mode Datasets analyze on construction,
    # so merge chains pay per-op; measured on the 10x star join)
    rk2set = set(rk2)
    r_all = {
        c: (rk_tag + m if m in rk2set else m)
        for c in rsdf.columns
        if (m := r_ren.get(c, c)) != c or m in rk2set
    }
    rsdf2_cols = [r_ren.get(c, c) for c in rsdf.columns]
    # tiny-dim compose MEMO probe first: a hit replays the cached SQL
    # on the left side in two round trips, skipping the right-side
    # rename, the join-condition Column building, the optimizedPlan
    # probe and the dim collect (~90 ms of py4j per merge, measured on
    # the star join's build)
    joined = None
    memo_key = None
    if (
        not indicator
        and how in ("inner", "left", "left_semi", "left_anti")
        and len(lk2) == 1
        and r_rows_max is not None
        and 0 < r_rows_max <= _TINY_DIM_ROWS
        and r_anchor is not None
    ):
        # key on the STABLE underlying right sdf (the _SCAN_CACHE
        # object) plus the right frame's order fingerprint — NOT on
        # rsdf, which _side_slots rebuilds per query build (a fresh
        # mono-id withColumn each time), so an rsdf-identity memo can
        # never hit across builds. The recipe is a pure function of
        # (right rows+dtypes ⇐ stable sdf identity, order slots ⇐
        # fingerprint, rename map, keys, how) — all in the key.
        memo_key = (
            tuple(sorted(r_all.items())), tuple(lk2), tuple(rk2),
            rk_tag, how, r_anchor[1], r_anchor[2],
        )
        hit = _TINY_COMPOSE_MEMO.get(memo_key)
        if hit is not None and hit[0]() is r_anchor[0]:
            joined = _replay_compose(lsdf2, hit[1])
            if semi_like:
                return joined
    if joined is None:
        rtag = (
            plan_memo(
                rsdf, "renamed", tuple(sorted(r_all.items())), None,
                lambda: rsdf.withColumnsRenamed(r_all),
            )
            if r_all
            else rsdf
        )
        if indicator:
            lsdf2 = lsdf2.withColumn(lp_col, F.lit(True))
            rtag = rtag.withColumn(rp_col, F.lit(True))
        cond = None
        for (lc0, rc0), (lc, rc) in zip(zip(lk, rk), zip(lk2, rk2)):
            if lc0 in l_nonnull and rc0 in r_nonnull:
                # both key columns PROVEN null-free (parquet footer
                # stats, propagated through null-preserving ops):
                # plain `=` is row-identical to pandas'
                # NULL-matches-NULL `<=>` here, and lets Catalyst push
                # IsNotNull into both scans and skip the null-safe key
                # wrapping in the hash join.
                term = _it(lsdf2, lc) == _it(rtag, rk_tag + rc)
            else:
                # null-safe equality: pandas matches NULL keys
                # (merge.py:177)
                term = _it(lsdf2, lc).eqNullSafe(_it(rtag, rk_tag + rc))
            cond = term if cond is None else (cond & term)

        if broadcast == "right":
            rtag = plan_memo(
                rtag, "bcast", None, None, lambda: F.broadcast(rtag)
            )
        if broadcast == "left":
            lsdf2 = plan_memo(
                lsdf2, "bcast", None, None, lambda: F.broadcast(lsdf2)
            )

        res = _tiny_dim_compose(
            lsdf2, rtag, lk2, rk2, rk_tag, how, indicator, r_rows_max
        )
        if res is not None:
            joined, recipe = res
            if memo_key is not None:
                import weakref

                if len(_TINY_COMPOSE_MEMO) > 256:
                    _TINY_COMPOSE_MEMO.clear()
                _TINY_COMPOSE_MEMO[memo_key] = (
                    weakref.ref(r_anchor[0]), recipe
                )

    if joined is not None:
        if semi_like:
            return joined
    elif how == "cross":
        joined = lsdf2.crossJoin(rtag)
    elif (
        how == "left" and broadcast == "left" and lk2
        and r_rows_max is not None and r_rows_max <= 1_000_000
    ):
        # broadcast='left' with a footer-PROVEN small right: the
        # rewrite below exists for the huge-fact case; here the right
        # itself fits a broadcast (BuildRight IS legal for LeftOuter),
        # so ONE plain join — no distinct, no anti, no union, half the
        # job count on the floor-bound path (r10, verdict #2/#1c).
        # Catalyst picks broadcast-right on its own from the leaf
        # stats; at 100 TB rows_max is absent/huge and the rewrite
        # keeps the fact streaming.
        joined = plan_memo(
            (lsdf2, rtag), "join", "left",
            (cond,) if cond is not None else None,
            lambda: lsdf2.join(rtag, cond, "left"),
        )
    elif how == "left" and broadcast == "left" and lk2:
        # Spark cannot broadcast the PRESERVED side of an outer join
        # (BroadcastHashJoin LeftOuter only supports BuildRight), so a
        # plain `F.broadcast(left)` hint is silently ignored and the
        # plan degrades to shuffling BOTH sides — exactly wrong when
        # the left is a small dim and the right is the fact table.
        # Honor the hint via the classic outer-to-union rewrite:
        #   left ⟕ right  ≡  (left ⋈ right)  ∪  (left ▷ right) ⋈ NULLs
        # The inner part streams the fact with the dim broadcast (the
        # 100 TB-correct plan); the anti part joins the dim against
        # the DISTINCT fact keys (key-only shuffle, dim-sized result).
        inner = lsdf2.join(rtag, cond, "inner")
        rkeys = rtag.selectExpr(*[_qi(rk_tag + c) for c in rk2])
        if r_rows_max is None or r_rows_max > 100_000:
            # the anti join is duplicate-insensitive — distinct() exists
            # to bound the broadcast when the fact side's key count is
            # unknown/huge (the 100 TB case: ALWAYS, absent a proof).
            # A footer-proven TINY right broadcasts raw, skipping the
            # distinct's shuffle and its AQE stage — one fewer job on
            # the floor-bound path. The cap is the measured breakeven:
            # at 150k keys skip-vs-distinct is a wash, at 1.5M keys the
            # raw-key broadcast hash relation costs ~25% MORE than the
            # distinct it saved (r8, .scratch/sf1ish A/B).
            rkeys = rkeys.distinct()
        acond = None
        for lc, rc in zip(lk2, rk2):
            term = _it(lsdf2, lc).eqNullSafe(_it(rkeys, rk_tag + rc))
            acond = term if acond is None else (acond & term)
        anti = lsdf2.join(F.broadcast(rkeys), acond, "left_anti")
        # one selectExpr adds every right column as a typed NULL (the
        # old per-column withColumn chain paid a py4j round trip AND an
        # eager analysis pass per column)
        anti = anti.selectExpr(
            "*", *[f"CAST(NULL AS {t}) AS {_qi(c)}" for c, t in rtag.dtypes]
        )
        # anti's columns are exactly inner's (left cols + null-typed
        # right cols); unionByName resolves by name — no reorder select
        joined = inner.unionByName(anti)
        # column refs like rtag[col] don't resolve against the union;
        # re-root the output projection on plain names (batched: every
        # post-join name is unique — keys ride as __rk_*, overlaps are
        # suffixed — so string exprs resolve unambiguously)
        out_exprs: list[str] = [
            _qi(c) for c in lsdf2.columns if c != lp_col
        ]
        for c in rsdf2_cols:
            if c in same_key:
                continue
            src = rk_tag + c if c in rk2 else c
            out_exprs.append(_qi(c) if src == c else f"{_qi(src)} AS {_qi(c)}")
        if indicator:
            out_exprs.append(
                f"CASE WHEN coalesce({_qi(lp_col)}, false) AND coalesce({_qi(rp_col)}, false) "
                f"THEN 'both' WHEN coalesce({_qi(lp_col)}, false) THEN 'left_only' "
                f"ELSE 'right_only' END AS {_qi(ind_name)}"
            )
        return joined.selectExpr(*out_exprs)
    else:
        joined = plan_memo(
            (lsdf2, rtag), "join", how,
            (cond,) if cond is not None else None,
            lambda: lsdf2.join(rtag, cond, how),
        )

    if semi_like:
        return joined

    # output columns: left cols, then coalesced keys (for outer), then
    # right non-keys — batched into ONE selectExpr (every post-join
    # name is unique: keys ride as __rk_*, overlaps are suffixed)
    out_exprs: list[str] = []
    for c in lsdf2.columns:
        if c == lp_col:
            continue
        if c in same_key and how in ("full", "right"):
            # pandas fills the shared key from whichever side matched
            out_exprs.append(f"coalesce({_qi(c)}, {_qi(rk_tag + c)}) AS {_qi(c)}")
        else:
            out_exprs.append(_qi(c))
    for c in rsdf2_cols:
        if c in same_key:
            continue  # shared equi-key emitted once (pandas collapses it)
        src = rk_tag + c if c in rk2 else c
        out_exprs.append(_qi(c) if src == c else f"{_qi(src)} AS {_qi(c)}")
    if indicator:
        out_exprs.append(
            f"CASE WHEN coalesce({_qi(lp_col)}, false) AND coalesce({_qi(rp_col)}, false) "
            f"THEN 'both' WHEN coalesce({_qi(lp_col)}, false) THEN 'left_only' "
            f"ELSE 'right_only' END AS {_qi(ind_name)}"
        )
    out = joined
    return plan_memo(
        out, "selectExpr", tuple(out_exprs), None,
        lambda: out.selectExpr(*out_exprs),
    )


def _validate(lsdf: SparkDF, rsdf: SparkDF, lk: list[str], rk: list[str], rule: str) -> None:
    """merge(validate=) uniqueness checks (merge.py _MergeOperation)."""
    def unique(sdf, keys):
        return sdf.groupBy(*keys).count().filter("count > 1").limit(1).count() == 0

    lu = rule in ("1:1", "one_to_one", "1:m", "one_to_many")
    ru = rule in ("1:1", "one_to_one", "m:1", "many_to_one")
    if lu and not unique(lsdf, lk):
        raise ValueError(f"merge keys not unique on left (validate={rule})")
    if ru and not unique(rsdf, rk):
        raise ValueError(f"merge keys not unique on right (validate={rule})")


# (left-plan hash, right-plan hash) -> chosen strategy; see the
# inconclusive-estimate probe in merge_asof
_ASOF_STRATEGY_CACHE: dict = {}


def _asof_broadcast(
    lsdf: SparkDF,
    rsdf: SparkDF,
    on: str,
    by_keys: list[str],
    payload: list[str],
    direction: str,
    tolerance,
    allow_exact_matches: bool,
    _num,
) -> DataFrame:
    """Small-right merge_asof: right → per-key sorted struct arrays →
    broadcast equi-join on the by-key → array-filter asof lookup. The
    left side is map-only end-to-end; the only shuffle is the tiny
    right-side groupBy (dim-sized)."""
    # tie resolution on equal ``on`` stamps is POSITIONAL in pandas
    # (backward → last right row, forward → first): carry the right
    # side's row position as the second struct field so array_sort
    # orders ties by position, not by payload values (advisor-found —
    # payload-ordered ties made the picked match depend on which
    # strategy the size-estimate gate selected). Materialized BEFORE
    # the groupBy: nondeterministic exprs are illegal inside
    # aggregates.
    r0 = rsdf
    rsdf = plan_memo(
        r0, "order_stamp", "__pos__", None,
        lambda: r0.withColumn("__pos__", F.monotonically_increasing_id()),
    )
    entry = F.struct(
        F.col(on).alias("__t__"),
        F.col("__pos__").alias("__pos__"),
        *[F.col(c) for c in payload],
    )
    arr_col = F.array_sort(F.collect_list(entry)).alias("__arr__")
    grouped = plan_memo(
        rsdf, "groupby_agg", tuple(by_keys), (arr_col,),
        lambda: rsdf.groupBy(*by_keys).agg(arr_col),
    )
    if by_keys:
        ren = {k: "__rby_" + k for k in by_keys}
        g2 = plan_memo(
            grouped, "renamed", tuple(sorted(ren.items())), None,
            lambda: grouped.withColumnsRenamed(ren),
        )
        cond = None
        for k in by_keys:
            t = _it(lsdf, k).eqNullSafe(_it(g2, "__rby_" + k))
            cond = t if cond is None else (cond & t)
        joined = plan_memo(
            (lsdf, g2), "asof_bjoin", tuple(by_keys), (cond,),
            lambda: lsdf.join(F.broadcast(g2), cond, "left").drop(
                *["__rby_" + k for k in by_keys]
            ),
        )
    else:
        joined = plan_memo(
            (lsdf, grouped), "asof_cross", None, None,
            lambda: lsdf.crossJoin(F.broadcast(grouped)),
        )
    lt = F.col(on)
    if direction == "backward":
        pred = (lambda e: e["__t__"] <= lt) if allow_exact_matches else (
            lambda e: e["__t__"] < lt
        )
        m = F.try_element_at(F.filter(F.col("__arr__"), pred), F.lit(-1))
    else:
        pred = (lambda e: e["__t__"] >= lt) if allow_exact_matches else (
            lambda e: e["__t__"] > lt
        )
        m = F.try_element_at(F.filter(F.col("__arr__"), pred), F.lit(1))
    out = plan_memo(
        joined, "asof_match", None, (m,),
        lambda: joined.withColumn("__m__", m).drop("__arr__"),
    )
    keep = F.lit(True)
    if tolerance is not None:
        if hasattr(tolerance, "total_seconds"):
            tol = tolerance.total_seconds()
        elif isinstance(tolerance, str):
            from pandas_spark.window import parse_offset_seconds

            tol = parse_offset_seconds(tolerance)
        else:
            tol = tolerance
        keep = F.abs(_num(lt) - _num(F.col("__m__")["__t__"])) <= F.lit(tol)
    cols = {c: F.when(keep, F.col("__m__")[c]) for c in payload}
    return DataFrame(
        plan_memo(
            out, "asof_payload", tuple(cols), list(cols.values()),
            lambda: out.withColumns(cols).drop("__m__"),
        )
    )


# every internal tag the asof strategies materialize; user columns
# colliding with these (or the per-payload prefixes) are shielded at
# entry (see collision_renames call below)
_ASOF_TAGS = frozenset(
    {
        "__side__", "__rpos__", "__rid__", "__m_ts__", "__b_ts__",
        "__f_ts__", "__pos__", "__t__", "__arr__", "__m__",
    }
)
_ASOF_TAG_PREFIXES = ("__m_", "__b_", "__f_")


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    on: str | None = None,
    by: str | Sequence[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    allow_exact_matches: bool = True,
    suffixes: tuple[str, str] = ("_x", "_y"),
    left_by: str | Sequence[str] | None = None,
    right_by: str | Sequence[str] | None = None,
    left_on: str | None = None,
    right_on: str | None = None,
    strategy: str | None = None,
) -> DataFrame:
    """pandas ``merge_asof`` via union + ordered window (no range explosion).

    Plan shape (SURVEY §2.3): tag each side, union on (by, on), then for
    every left row take the latest preceding right row's payload with
    ``last(ignorenulls) over (partitionBy(by) orderBy(on, side))`` —
    one shuffle on the by-key, linear work per partition, scales to
    arbitrarily large sides (vs. a range join's quadratic blowup).
    ``direction='forward'`` flips the frame; ``'nearest'`` combines both.

    ``strategy='broadcast'`` (auto-picked for backward/forward when the
    right side's Catalyst size estimate fits the broadcast threshold):
    the right side collapses to per-key SORTED arrays, broadcast-joins
    to the left on the by-key, and the asof lookup is an array filter +
    try_element_at — the LEFT (fact) side never shuffles at all, the
    same reasoning as broadcasting a small dim in an equi-join. The
    window path remains the both-sides-big plan.

    DOCUMENTED divergences from pandas (r11 sweep of reference
    tests/reshape/merge/test_merge_asof.py), both graceful supersets —
    the engine accepts what pandas' merge-path implementation rejects:

    * UNSORTED inputs: pandas raises "left keys must be sorted" (its
      kernel requires pre-sorted frames); the engine's window/
      broadcast plans sort internally, so unsorted input yields the
      CORRECT asof result — at 100 TB requiring a pre-sort pass just
      to satisfy an argument check would be a wasted shuffle.
    * NULL ``on`` keys: pandas raises "Merge keys contain null
      values"; the engine keeps such left rows with NULL payload (no
      right row can match a NULL stamp) — detecting them to raise
      would cost a full data scan before planning.

    Argument validation (direction, allow_exact_matches, tolerance
    sign + on-dtype compatibility) raises exactly like pandas — those
    are plan-time checks, no scan."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction invalid: {direction}")
    if not isinstance(allow_exact_matches, bool):
        raise ValueError(
            f"allow_exact_matches must be boolean, passed {allow_exact_matches}"
        )
    by_keys = _aslist(by)
    lsdf, rsdf = left.spark, right.spark
    if left_on is not None or right_on is not None:
        # pandas left_on=/right_on= (reference reshape/merge.py:689):
        # differently-named asof keys; the matched right row's key
        # VALUE survives in the output as a payload column. Normalize
        # by copying the right key under the left's name (the original
        # right_on column rides on as payload).
        if on is not None or left_on is None or right_on is None:
            raise ValueError("pass either on= or both left_on=/right_on=")
        if left_on in rsdf.columns:
            raise NotImplementedError(
                f"right side already has a column named {left_on!r}; "
                "rename it before merge_asof(left_on=, right_on=)"
            )
        rsdf = rsdf.withColumn(left_on, F.col(right_on))
        on = left_on
    if on is None:
        raise ValueError("merge_asof requires on= (or left_on=/right_on=)")
    if left_by or right_by:
        # pandas left_by/right_by (merge.py:644): differently-named
        # group keys per side — normalize by renaming the right side to
        # the left's names, then proceed as by=
        lb, rb = _aslist(left_by), _aslist(right_by)
        if by_keys or len(lb) != len(rb):
            raise ValueError("pass either by= or matching left_by=/right_by= lists")
        rsdf = rsdf.withColumnsRenamed(dict(zip(rb, lb)))
        by_keys = lb
    # gap/tolerance math needs an epoch number; TIMESTAMP_NTZ (how the
    # driver session reads unannotated parquet) rejects a double cast,
    # so go through the dtype-aware helper
    on_dt = lsdf.schema[on].dataType
    _num = lambda c: ordinal_seconds(c, on_dt)
    if tolerance is not None:
        # pandas argument validation (reference reshape/merge.py
        # _validate_tolerance): sign and on-dtype compatibility are
        # plan-time checks — silent acceptance of a Timedelta against
        # an int key (or a negative tolerance) produced garbage-empty
        # matches before r11. Zero is allowed (pandas raises on < 0
        # only); bool is rejected like pandas (not a numeric).
        _temporal = on_dt.simpleString() in ("timestamp", "timestamp_ntz", "date")
        _td = hasattr(tolerance, "total_seconds") or isinstance(tolerance, str)
        _numtol = isinstance(tolerance, (int, float)) and not isinstance(tolerance, bool)
        if (_td and not _temporal) or (_numtol and _temporal) or not (_td or _numtol):
            raise ValueError(
                f"incompatible tolerance {tolerance!r}, must be compat "
                f"with type {on_dt.simpleString()}"
            )
        from pandas_spark.window import parse_offset_seconds as _pos

        _tval = (
            tolerance.total_seconds()
            if hasattr(tolerance, "total_seconds")
            else _pos(tolerance)
            if isinstance(tolerance, str)
            else tolerance
        )
        if _tval < 0:
            raise ValueError("tolerance must be positive")

    overlap = (set(lsdf.columns) & set(rsdf.columns)) - {on} - set(by_keys)
    l_over = {c: c + suffixes[0] for c in overlap}
    r_over = {c: c + suffixes[1] for c in overlap}
    if l_over:
        l0 = lsdf
        lsdf = plan_memo(
            l0, "renamed", tuple(sorted(l_over.items())), None,
            lambda: l0.withColumnsRenamed(l_over),
        )
    if r_over:
        r0 = rsdf
        rsdf = plan_memo(
            r0, "renamed", tuple(sorted(r_over.items())), None,
            lambda: r0.withColumnsRenamed(r_over),
        )
    # boundary shield (dtypes.collision_renames): the window and
    # broadcast strategies below weave fixed tags through SQL text;
    # user columns named like them must survive, so rename collisions
    # to temps here and invert on every output (shared on/by names
    # must map identically on both sides — hence one map over the
    # union). unmap is {} in the no-collision common case.
    from pandas_spark.dtypes import collision_renames

    _shield = collision_renames(
        set(lsdf.columns) | set(rsdf.columns),
        _ASOF_TAGS,
        _ASOF_TAG_PREFIXES,
    )
    if _shield:
        lsdf = lsdf.withColumnsRenamed(_shield)
        rsdf = rsdf.withColumnsRenamed(_shield)
        on = _shield.get(on, on)
        by_keys = [_shield.get(k, k) for k in by_keys]
    _unmap = {v: k for k, v in _shield.items()}
    _unshield = (
        (lambda f: DataFrame(f.spark.withColumnsRenamed(_unmap)))
        if _unmap
        else (lambda f: f)
    )
    payload = [c for c in rsdf.columns if c != on and c not in by_keys]

    if strategy is None and direction in ("backward", "forward"):
        # broadcast pays off when it SAVES a much bigger left shuffle:
        # right must fit the broadcast threshold AND the left must be
        # decisively larger (comparable sides → the window plan's one
        # co-shuffle costs about the same as building the broadcast)
        try:
            r_size = int(rsdf._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
            l_size = int(lsdf._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
            thr_raw = rsdf.sparkSession.conf.get(
                "spark.sql.autoBroadcastJoinThreshold", "10485760"
            )
            thr = int(str(thr_raw).lower().rstrip("b"))
            if 0 < r_size <= thr and l_size > 3 * r_size:
                strategy = "broadcast"
            elif 0 < r_size <= 8 * thr:
                # Catalyst size estimates ignore filter selectivity
                # without CBO column stats, so a tiny filtered right
                # (purchases out of an events scan) estimates the same
                # as the huge left. When the estimate is plausibly
                # small, ONE bounded row-count probe each side decides:
                # right must be ≤ cap rows (a per-key sorted-array
                # broadcast of that is tens of MB at most) and the
                # left must hold >3x as many rows. limit() makes both
                # probes early-terminating — cost is bounded no matter
                # the true table size — and the decision is CACHED per
                # (left, right) analyzed-plan hash so re-planning the
                # same asof (bench loops, retries) never re-probes.
                key = (
                    lsdf._jdf.queryExecution().analyzed().semanticHash(),
                    rsdf._jdf.queryExecution().analyzed().semanticHash(),
                )
                strategy = _ASOF_STRATEGY_CACHE.get(key)
                if strategy is None:
                    cap = 500_000
                    rc = rsdf.limit(cap + 1).count()
                    strategy = (
                        "broadcast"
                        if rc <= cap and lsdf.limit(3 * rc + 2).count() > 3 * rc
                        else "window"
                    )
                    if len(_ASOF_STRATEGY_CACHE) > 256:
                        _ASOF_STRATEGY_CACHE.clear()
                    _ASOF_STRATEGY_CACHE[key] = strategy
            else:
                strategy = "window"
        except Exception:
            strategy = "window"
    if strategy == "broadcast" and direction in ("backward", "forward"):
        return _unshield(_asof_broadcast(
            lsdf, rsdf, on, by_keys, payload, direction,
            tolerance, allow_exact_matches, _num,
        ))

    # __rid__ (a unique left-row id for the backward/forward result
    # join) is only needed by direction='nearest' — backward/forward
    # never pay the monotonically_increasing_id projection
    need_rid = direction == "nearest" and not allow_exact_matches
    # ties on equal ``on`` stamps resolve POSITIONALLY in pandas
    # (backward → last right row in frame order, forward → first), the
    # same rule the broadcast strategy's __pos__ struct field encodes.
    # Carry the right side's row position through the union so the
    # window ordering can break ties deterministically — without it,
    # duplicate right timestamps yield a nondeterministic winner that
    # can diverge between runs and between strategies (advisor-found).
    # Each side's tag+pad is ONE batched selectExpr (the old
    # per-column withColumn chain paid a py4j round trip and an eager
    # analysis pass per padded column).
    l_cols = [c for c in lsdf.columns if c != on and c not in by_keys]
    r_types = dict(rsdf.dtypes)
    l_types = dict(lsdf.dtypes)
    l_exprs = (
        ["*", "1 AS `__side__`"]
        + (["monotonically_increasing_id() AS `__rid__`"] if need_rid else [])
        + ["CAST(NULL AS BIGINT) AS `__rpos__`"]
        + [f"CAST(NULL AS {r_types[c]}) AS {_qi(c)}" for c in payload]
    )
    l_tag = plan_memo(
        lsdf, "selectExpr", tuple(l_exprs), None,
        lambda: lsdf.selectExpr(*l_exprs),
    )
    # after the suffix renames the sides share ONLY (on, by_keys), so
    # every left payload column needs a typed-NULL pad on the right
    pad_r = [c for c in l_cols if c not in rsdf.columns] + (
        ["__rid__"] if need_rid else []
    )
    r_exprs = (
        ["*", "0 AS `__side__`",
         "monotonically_increasing_id() AS `__rpos__`"]
        + [
            f"CAST(NULL AS {l_types.get(c, 'BIGINT')}) AS {_qi(c)}"
            for c in pad_r
        ]
    )
    r_tag = plan_memo(
        rsdf, "selectExpr", tuple(r_exprs), None,
        lambda: rsdf.selectExpr(*r_exprs),
    )
    unioned = plan_memo(
        (l_tag, r_tag), "unionByName", None, None,
        lambda: l_tag.unionByName(r_tag),
    )

    def one_direction(u: SparkDF, forward: bool, with_ts: bool = True) -> SparkDF:
        # SQL-text window (one selectExpr parse instead of ~8 py4j
        # Column-builder calls per payload column).
        # Exact matches: right rows sort before left at equal ts
        # (backward). Ties among equal right stamps are POSITIONAL:
        # last() reads the row nearest the frame end, so backward
        # (wants the LAST positional right row) orders __rpos__ asc and
        # forward (wants the FIRST) orders desc under its on-desc sort.
        side_dir = "ASC" if allow_exact_matches else "DESC"
        if forward:
            order_sql = f"{_qi(on)} DESC, `__side__` {side_dir}, `__rpos__` DESC"
        else:
            order_sql = f"{_qi(on)} ASC, `__side__` {side_dir}, `__rpos__` ASC"
        part = (
            "PARTITION BY " + ", ".join(_qi(k) for k in by_keys) + " "
            if by_keys else ""
        )
        win = (
            f"OVER ({part}ORDER BY {order_sql} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
        matched = [
            f"last(CASE WHEN `__side__` = 0 THEN {_qi(c)} END, true) "
            f"{win} AS {_qi('__m_' + c)}"
            for c in payload
        ]
        if with_ts:
            # the matched row's own timestamp — only needed for the
            # tolerance gap / nearest tie-break, skipped otherwise
            matched.append(
                f"last(CASE WHEN `__side__` = 0 THEN {_qi(on)} END, true) "
                f"{win} AS `__m_ts__`"
            )
        win_sel = plan_memo(
            u, "selectExpr", ("*",) + tuple(matched), None,
            lambda: u.selectExpr("*", *matched),
        )
        return plan_memo(
            win_sel, "filter_sql", "`__side__` = 1", None,
            lambda: win_sel.filter("`__side__` = 1"),
        )

    def apply_tolerance(sdf: SparkDF, forward: bool) -> SparkDF:
        if tolerance is None:
            return sdf
        gap = F.abs(_num(F.col(on)) - _num(F.col("__m_ts__")))
        if hasattr(tolerance, "total_seconds"):
            tol = tolerance.total_seconds()
        elif isinstance(tolerance, str):
            from pandas_spark.window import parse_offset_seconds

            tol = parse_offset_seconds(tolerance)
        else:
            tol = tolerance
        cols = {}
        for c in payload:
            cols["__m_" + c] = F.when(gap <= tol, F.col("__m_" + c))
        cols["__m_ts__"] = F.when(gap <= tol, F.col("__m_ts__"))
        return plan_memo(
            sdf, "withColumns", tuple(cols), tuple(cols.values()),
            lambda: sdf.withColumns(cols),
        )

    if direction in ("backward", "forward"):
        matched = apply_tolerance(
            one_direction(unioned, direction == "forward", with_ts=tolerance is not None),
            direction == "forward",
        )
        final_exprs = (
            [_qi(c) for c in by_keys + [on] + l_cols]
            + [f"{_qi('__m_' + c)} AS {_qi(c)}" for c in payload]
        )
        return _unshield(DataFrame(plan_memo(
            matched, "selectExpr", tuple(final_exprs), None,
            lambda: matched.selectExpr(*final_exprs),
        )))

    if direction == "nearest" and allow_exact_matches:
        # Both directions over ONE ordering (on asc, right-before-left
        # at ties) — the backward fill uses the preceding frame, the
        # forward fill the following frame. Spark evaluates both frame
        # sets in a single WindowExec: one shuffle, ONE sort, no
        # row-id self-joins. Equal-ts matches sort before the left row
        # so the following frame misses them — harmless: the backward
        # fill captures them with gap 0, which always wins the
        # nearest tie-break.
        # __rpos__ asc serves both fills: last() (backward) lands on the
        # max position among equal stamps, first() (forward) on the min —
        # exactly pandas' positional tie rule for each direction
        wb = (
            W.partitionBy(*by_keys)
            .orderBy(F.col(on).asc(), F.col("__side__").asc(), F.col("__rpos__").asc())
            .rowsBetween(W.unboundedPreceding, 0)
        )
        wf = (
            W.partitionBy(*by_keys)
            .orderBy(F.col(on).asc(), F.col("__side__").asc(), F.col("__rpos__").asc())
            .rowsBetween(0, W.unboundedFollowing)
        )
        right_val = lambda c: F.when(F.col("__side__") == 0, F.col(c))
        cols = {}
        for c in payload:
            cols["__b_" + c] = F.last(right_val(c), ignorenulls=True).over(wb)
            cols["__f_" + c] = F.first(right_val(c), ignorenulls=True).over(wf)
        cols["__b_ts__"] = F.last(right_val(on), ignorenulls=True).over(wb)
        cols["__f_ts__"] = F.first(right_val(on), ignorenulls=True).over(wf)
        j = unioned.withColumns(cols).filter(F.col("__side__") == 1)
        bgap = F.abs(_num(F.col(on)) - _num(F.col("__b_ts__")))
        fgap = F.abs(_num(F.col(on)) - _num(F.col("__f_ts__")))
        if tolerance is not None:
            from pandas_spark.window import parse_offset_seconds

            tol = (
                tolerance.total_seconds()
                if hasattr(tolerance, "total_seconds")
                else (parse_offset_seconds(tolerance) if isinstance(tolerance, str) else tolerance)
            )
            b_ok = F.col("__b_ts__").isNotNull() & (bgap <= tol)
            f_ok = F.col("__f_ts__").isNotNull() & (fgap <= tol)
        else:
            b_ok = F.col("__b_ts__").isNotNull()
            f_ok = F.col("__f_ts__").isNotNull()
        use_b = b_ok & (~f_ok | (bgap <= fgap))
        final_cols = (
            by_keys
            + [on]
            + l_cols
            + [
                F.when(use_b, F.col("__b_" + c))
                .when(f_ok, F.col("__f_" + c))
                .alias(c)
                for c in payload
            ]
        )
        return _unshield(DataFrame(j.select(*final_cols)))

    if direction == "nearest":
        back = apply_tolerance(one_direction(unioned, False), False)
        fwd = apply_tolerance(one_direction(unioned, True), True)
        bsel = back.select("__rid__", F.col("__m_ts__").alias("__b_ts__"),
                           *[F.col("__m_" + c).alias("__b_" + c) for c in payload])
        fsel = fwd.select("__rid__", F.col("__m_ts__").alias("__f_ts__"),
                          *[F.col("__m_" + c).alias("__f_" + c) for c in payload])
        base = unioned.filter(F.col("__side__") == 1)
        j = base.join(bsel, "__rid__", "left").join(fsel, "__rid__", "left")
        bgap = F.abs(_num(F.col(on)) - _num(F.col("__b_ts__")))
        fgap = F.abs(_num(F.col(on)) - _num(F.col("__f_ts__")))
        use_b = F.col("__f_ts__").isNull() | (F.col("__b_ts__").isNotNull() & (bgap <= fgap))
        final_cols = (
            by_keys
            + [on]
            + l_cols
            + [F.when(use_b, F.col("__b_" + c)).otherwise(F.col("__f_" + c)).alias(c) for c in payload]
        )
        return _unshield(DataFrame(j.select(*final_cols)))

    raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")


def merge_ordered(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_by: str | Sequence[str] | None = None,
    right_by: str | Sequence[str] | None = None,
    fill_method: str | None = None,
    suffixes: tuple[str, str] = ("_x", "_y"),
) -> DataFrame:
    """pandas ``merge_ordered`` (merge.py:500): outer join ordered on key,
    optional group-wise forward fill.

    ``left_by``/``right_by`` REPLICATE the other (ungrouped) frame into
    every group of the grouped side (reference merge.py:303
    _groupby_and_merge) — the ungrouped side has no group column, so
    this is a broadcast cross of the distinct group values against it,
    then a plain outer merge on (by, on). The distinct-group side is
    broadcast: pandas' semantics make the output |groups| × |other|
    rows, so the group list being driver-sized is inherent to the
    operation, not a plan choice. (Pre-r11 this joined on the group
    key directly — an UNRESOLVED_COLUMN error, caught by the r11
    reference sweep of tests/reshape/merge/test_merge_ordered.py.)"""
    if fill_method not in (None, "ffill"):
        raise ValueError("fill_method must be 'ffill' or None")
    if left_by is not None and right_by is not None:
        raise ValueError("Can only group either left or right frames")
    by = _aslist(left_by) or _aslist(right_by)
    if left_by is not None:
        groups = left.spark.select(*[F.col(c) for c in by]).dropDuplicates()
        right = DataFrame(right.spark.crossJoin(F.broadcast(groups)))
    elif right_by is not None:
        groups = right.spark.select(*[F.col(c) for c in by]).dropDuplicates()
        left = DataFrame(left.spark.crossJoin(F.broadcast(groups)))
    out = merge(left, right, on=([*by, on] if by else on), how="outer", suffixes=suffixes)
    sdf = out.spark.orderBy(*by, on)
    if fill_method == "ffill":
        w = W.partitionBy(*by).orderBy(on).rowsBetween(W.unboundedPreceding, 0) if by else \
            W.orderBy(on).rowsBetween(W.unboundedPreceding, 0)
        fill_cols = [c for c in sdf.columns if c != on and c not in by]
        sdf = sdf.withColumns({c: F.last(c, ignorenulls=True).over(w) for c in fill_cols})
    return DataFrame(sdf)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-resilient equi-join: replicate the small(er) side across
    ``salt`` buckets and scatter the skewed side uniformly.

    For heavy-hitter keys (one key owning a large share of rows) a
    plain shuffled join lands the whole key on one task. Salting splits
    each key's rows across ``salt`` tasks: the left (skewed, large)
    side gets a uniform salt derived from a per-row hash — deterministic,
    no RNG — and the right side is exploded ``salt``× so every
    (key, salt) bucket finds its match. Result is row-identical to the
    plain join. AQE's skew-join handles moderate skew automatically;
    this is the explicit tool for extreme cases and for non-AQE sinks.

    Only ``inner`` and ``left`` are supported: with the right side
    replicated ``salt``×, an outer/right join would surface each
    unmatched right row once per replica (phantom rows), so those hows
    raise instead of silently corrupting the result.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only (got {how!r}): "
            "the replicated right side would duplicate unmatched right rows"
        )
    keys = _aslist(on)
    lsdf, rsdf = left.spark, right.spark
    l = lsdf.withColumn(
        "__salt__",
        F.pmod(F.xxhash64(*[F.col(c) for c in lsdf.columns]), F.lit(salt)).cast("int"),
    )
    r = rsdf.withColumn(
        "__salt__", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l.join(r, [*keys, "__salt__"], how).drop("__salt__")
    return DataFrame(out)


def bucketed_join(
    spark,
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    buckets: int = 8,
    table_prefix: str = "ps_bucketed",
) -> DataFrame:
    """Co-located join via bucketed tables: both sides are written
    bucketed+sorted on the join key, so the join plans with NO exchange
    on either side (SortMergeJoin over pre-bucketed scans).

    This is the 100 TB pattern for repeated fact-fact joins: pay the
    bucketing shuffle once at write time, join shuffle-free forever
    after. Locally materializes into the Spark warehouse dir.
    """
    import shutil

    keys = _aslist(on)
    lt, rt = f"{table_prefix}_l", f"{table_prefix}_r"
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for name, f in ((lt, left), (rt, right)):
        # a stale warehouse dir without a catalog entry (fresh session)
        # blocks saveAsTable even in overwrite mode
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(
            os.path.join(warehouse.removeprefix("file:"), name), ignore_errors=True
        )
        (
            f.spark.write.mode("overwrite")
            .bucketBy(buckets, *keys)
            .sortBy(*keys)
            .saveAsTable(name)
        )
    return DataFrame(spark.table(lt).join(spark.table(rt), keys, how))


def interval_join(
    left: DataFrame,
    intervals: DataFrame,
    on: str,
    lo: str = "lo",
    hi: str = "hi",
    how: str = "inner",
    closed: str = "left",
) -> DataFrame:
    """Point-in-interval join (pandas IntervalIndex.get_indexer lookups,
    _libs/intervaltree — SURVEY §2.3 interval/range join).

    The intervals side is broadcast (interval tables are small by
    nature); the probe side streams through a broadcast nested-loop
    with a range predicate — no shuffle of the big side. ``closed``
    picks [lo,hi) / (lo,hi] / [lo,hi] like pd.cut's ``right=``.
    """
    p = F.col(f"__l__.{on}")
    lo_c, hi_c = F.col(f"__r__.{lo}"), F.col(f"__r__.{hi}")
    conds = {
        "left": (p >= lo_c) & (p < hi_c),
        "right": (p > lo_c) & (p <= hi_c),
        "both": (p >= lo_c) & (p <= hi_c),
    }
    out = left.spark.alias("__l__").join(
        F.broadcast(intervals.spark.alias("__r__")), conds[closed], how
    )
    return DataFrame(out.select("__l__.*", "__r__.*"))
