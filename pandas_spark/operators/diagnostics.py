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
from pandas_spark import fshim as F  # backtick-safe F.col facade

from pandas_spark.frame import DataFrame


class PlanScaleError(RuntimeError):
    """Raised by ``assert_scalable`` when a plan contains a construct
    that will not survive a 100×–1000× scale-up."""


def _plan_text(sdf: SparkDF, mode: str = "formatted") -> str:
    return sdf._sc._jvm.PythonSQLUtils.explainString(sdf._jdf.queryExecution(), mode)


def plan_report(frame) -> dict:
    """Machine-readable audit of the physical plan — the facts that
    decide whether a query survives the jump from test data to 100 TB:

    * ``shuffles`` — data-moving Exchange nodes (hash/range); each is
      a full network pass over its input
    * ``single_partition_exchanges`` — ``Exchange SinglePartition``
      over full-width data: the whole dataset serializes through ONE
      task (the unkeyed-window scale trap ``strict_scale`` guards
      against)
    * ``global_agg_exchanges`` — ``Exchange SinglePartition`` fed by
      an UNKEYED partial aggregate: the standard global-reduction
      final step, bounded to one row per upstream partition at any
      data scale — reported separately because it is NOT a scale trap
    * ``broadcast_joins`` / ``sortmerge_joins`` / ``nested_loop_joins``
      — join strategy mix; nested-loop/cartesian is almost always a
      missing equi-key
    * ``arrow_python_nodes`` — vectorized Python crossings
      (pandas_udf / mapInPandas / applyInPandas): the sanctioned slow
      path
    * ``row_python_nodes`` — ``BatchEvalPython`` row-at-a-time UDFs:
      the UNsanctioned one (the engine itself never emits these)
    * ``scans`` — per-scan (read_schema, pushed_filters) so column
      pruning and predicate pushdown are checkable
    * ``codegen_stages`` — whole-stage-codegen span count (from the
      ``simple`` explain)

    Pure plan introspection — nothing is executed. The programmatic
    twin of eyeballing ``df.explain("formatted")``, usable in tests and
    CI gates (see ``assert_scalable``).
    """
    import re

    sdf = frame.spark if hasattr(frame, "spark") else frame
    text = _plan_text(sdf, "formatted")
    nodes = re.findall(r"^\((\d+)\) (\S+)", text, re.M)
    counts: dict[str, int] = {}
    for _, name in nodes:
        counts[name] = counts.get(name, 0) + 1
    # Exchange arguments distinguish hash/range vs SinglePartition.
    # A SinglePartition exchange fed by an UNKEYED partial aggregate is
    # the standard global-reduction final step — its input is one row
    # per upstream partition (bounded at any data scale), not the full
    # dataset. Those count as global_agg_exchanges; only the genuinely
    # dangerous kind (full-width rows through one task: unkeyed
    # Sort/Window/row passes) remains in single_partition_exchanges.
    # split the details section into per-node blocks (attr names can
    # contain parens — line-by-line splitting, not lookahead regexes)
    blocks: dict[str, str] = {}
    header = re.compile(r"^\((\d+)\) (\S+)")
    cur_id = None
    cur: list[str] = []
    for line in text.splitlines():
        hm = header.match(line)
        if hm:
            if cur_id is not None:
                blocks[cur_id] = "\n".join(cur)
            cur_id, cur = hm.group(1), [line]
        elif cur_id is not None:
            cur.append(line)
    if cur_id is not None:
        blocks[cur_id] = "\n".join(cur)
    sp_ids = [
        nid
        for nid, blk in blocks.items()
        if blk.startswith(f"({nid}) Exchange")
        and "Arguments: SinglePartition" in blk
    ]
    # parse the plan tree (the header block) for child relationships
    tree: list[tuple[int, str, str]] = []  # (depth, name, id)
    for line in text.splitlines():
        if not line.strip():
            break
        tm = re.match(r"^([ :+\-|]*)(\S.*?)\s*\((\d+)\)$", line)
        if tm:
            # non-AQE plans print whole-stage-codegen nodes as
            # "* HashAggregate" — the star is a codegen marker, not
            # part of the node name (AQE plans omit it pre-execution,
            # which is why classification by bare name worked there)
            name = re.sub(r"^\*\s*", "", tm.group(2))
            tree.append((len(tm.group(1)) // 3, name, tm.group(3)))
    pos = {nid: i for i, (_, _, nid) in enumerate(tree)}

    def _is_bounded_global_agg_final(nid: str) -> bool:
        i = pos.get(nid)
        if i is None:
            return False
        d = tree[i][0]
        for depth, name, cid in tree[i + 1:]:
            if depth <= d:
                return False
            if depth == d + 1:
                if not name.split()[0].endswith("Aggregate"):
                    return False
                # zero grouping keys prints as "Keys: []" (keyed aggs
                # print "Keys [n]: [...]")
                return "\nKeys: []" in blocks.get(cid, "")
        return False

    agg_final = sum(1 for nid in sp_ids if _is_bounded_global_agg_final(nid))
    single = len(sp_ids) - agg_final
    exchanges = counts.get("Exchange", 0)
    scans = []
    for m in re.finditer(
        r"^\(\d+\) Scan [^\n]*\n(?:.*\n)*?ReadSchema: ([^\n]+)", text, re.M
    ):
        block = m.group(0)
        pf = re.search(r"PushedFilters: \[([^\]]*)\]", block)
        loc = re.search(r"Location: \S+ \[([^\]]*)\]", block)
        scans.append(
            {
                "location": loc.group(1) if loc else None,
                "read_schema": m.group(1),
                "pushed_filters": pf.group(1) if pf else "",
            }
        )
    simple = _plan_text(sdf, "simple")
    codegen: int | None = len(set(re.findall(r"\*\((\d+)\)", simple)))
    if codegen == 0 and "AdaptiveSparkPlan" in simple:
        # under AQE the codegen spans only materialize in the FINAL
        # plan (post-execution); pre-execution audits can't see them —
        # report unknown rather than a misleading 0
        codegen = None
    return {
        "shuffles": exchanges - single - agg_final,
        "single_partition_exchanges": single,
        "global_agg_exchanges": agg_final,
        "broadcast_exchanges": counts.get("BroadcastExchange", 0),
        "broadcast_joins": counts.get("BroadcastHashJoin", 0),
        "sortmerge_joins": counts.get("SortMergeJoin", 0),
        "shuffled_hash_joins": counts.get("ShuffledHashJoin", 0),
        "nested_loop_joins": counts.get("BroadcastNestedLoopJoin", 0)
        + counts.get("CartesianProduct", 0),
        "arrow_python_nodes": sum(
            counts.get(k, 0)
            for k in (
                "ArrowEvalPython",
                "MapInPandas",
                "FlatMapGroupsInPandas",
                "FlatMapGroupsInPandasWithState",
                "MapInArrow",
            )
        ),
        "row_python_nodes": counts.get("BatchEvalPython", 0),
        "scans": scans,
        "codegen_stages": codegen,
    }


def assert_scalable(
    frame,
    max_shuffles: int | None = None,
    allow_single_partition: bool = False,
    allow_row_python: bool = False,
    allow_nested_loop: bool = False,
) -> dict:
    """CI gate over ``plan_report``: raise ``PlanScaleError`` if the
    plan contains a scale-killer. Returns the report on success, so a
    test can gate and inspect in one call.

    Defaults flag the three constructs that are *never* what you want
    on big data — single-partition exchanges, row-at-a-time Python,
    cartesian joins — and leave shuffle budgeting opt-in
    (``max_shuffles=``), since the right number is query-specific.
    """
    r = plan_report(frame)
    problems = []
    if not allow_single_partition and r["single_partition_exchanges"]:
        problems.append(
            f"{r['single_partition_exchanges']} SinglePartition exchange(s): "
            "the full dataset serializes through one task"
        )
    if not allow_row_python and r["row_python_nodes"]:
        problems.append(
            f"{r['row_python_nodes']} row-at-a-time Python node(s) "
            "(BatchEvalPython): use pandas_udf / mapInPandas"
        )
    if not allow_nested_loop and r["nested_loop_joins"]:
        problems.append(
            f"{r['nested_loop_joins']} nested-loop/cartesian join(s): "
            "missing equi-join key?"
        )
    if max_shuffles is not None and r["shuffles"] > max_shuffles:
        problems.append(f"{r['shuffles']} shuffles > budget {max_shuffles}")
    if problems:
        raise PlanScaleError("; ".join(problems))
    return r


# Above this many requested rows, ``orderBy().limit(n)`` is the wrong
# physical plan: Spark lowers it to TakeOrderedAndProject, whose top-k
# selector EAGERLY allocates a 2·n-element buffer per partition —
# top_n=10⁹ means ~16 GB of object references before reading a single
# row (reproduced: default-heap JVM OOM in TopKSelector.<init>).
# Past the threshold we switch to a rank-filter plan whose memory is
# O(rows-per-partition) with spillable sort, independent of top_n.
_TAKE_ORDERED_MAX = 1 << 20


def skew_report(
    frame: DataFrame,
    keys: str | Sequence[str],
    top_n: int | None = 20,
) -> DataFrame:
    """Heavy-hitter profile of a prospective shuffle/join key.

    Returns the ``top_n`` most frequent key values (``top_n=None`` for
    ALL keys) with:

    * ``cnt``   — rows carrying the key value
    * ``share`` — fraction of all rows (1.0 == every row is this key)
    * ``skew``  — cnt / mean-group-size; a key with ``skew`` ≈ k gets
      a partition k× the average — the number that says "salt this"

    Plan shape: ONE shuffle (partial-count then final over the keys —
    the same cost as ``value_counts``), then a two-row broadcast of the
    (total, n_groups) scalars, then the bounded top-n:

    * small ``top_n`` (≤ 2²⁰): ``TakeOrderedAndProject`` — per-partition
      top-k then a k-row merge on the driver; memory O(top_n)
    * large ``top_n``: a ``row_number() <= n`` rank filter — the sort is
      spillable external sort, so memory stays O(partition), never
      O(top_n) (``orderBy().limit(huge)`` would eagerly allocate a
      2·top_n buffer and OOM — the exact plan class this module exists
      to catch)
    * ``top_n=None``: no limit at all — a fully parallel range-exchange
      sort over the (already reduced) per-key counts

    Deterministic order: cnt desc, then key asc (ties at the cut line
    resolve identically in any engine).
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    counts = frame.spark.groupBy(*key_list).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("__total__"), F.count(F.lit(1)).alias("__groups__")
    )
    order = [F.col("cnt").desc(), *[F.col(k).asc() for k in key_list]]
    enriched = counts.crossJoin(F.broadcast(totals)).select(
        *key_list,
        F.col("cnt"),
        (F.col("cnt") / F.col("__total__")).alias("share"),
        (
            F.col("cnt")
            * F.col("__groups__").cast("double")
            / F.col("__total__")
        ).alias("skew"),
    )
    if top_n is None:
        out = enriched.orderBy(*order)
    elif top_n <= _TAKE_ORDERED_MAX:
        out = enriched.orderBy(*order).limit(top_n)
    else:
        from pyspark.sql import Window as W

        # Two-level cut. A bare row_number over W.orderBy(*order) is a
        # single-partition window — every per-key count row through ONE
        # task. Level 1 takes each input partition's local top_n (the
        # order is strict/total, so any global top-n row is in its own
        # partition's top-n → the local cut keeps a superset); the
        # global rank then runs over ≤ n_partitions·top_n survivors.
        # (materialized in a projection first — Window.partitionBy
        # rejects nondeterministic expressions like spark_partition_id)
        local = W.partitionBy("__pid__").orderBy(*order)
        survivors = (
            enriched.withColumn("__pid__", F.spark_partition_id())
            .withColumn("__lrn__", F.row_number().over(local))
            .filter(F.col("__lrn__") <= top_n)
            .drop("__lrn__", "__pid__")
        )
        rn = F.row_number().over(W.orderBy(*order))
        out = (
            survivors.withColumn("__rn__", rn)
            .filter(F.col("__rn__") <= top_n)
            .drop("__rn__")
            .orderBy(*order)
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


def streaming_state_report(query) -> dict:
    """One-batch snapshot of a StreamingQuery's stateful-operator
    health: total state rows, rows dropped as too-late by Spark's
    watermark filter, and per-operator detail (round-9 verdict #5 —
    the buffered merge_asof docstring pointed readers at lastProgress;
    this is the helper).

    For the watermark-buffered asof (streaming/core.py), state rows ≈
    input rate x lateness horizon per key: a growing ``state_rows``
    across batches at steady rate means the horizon (or a stuck
    watermark — e.g. an idle source) is holding rows; a nonzero
    ``rows_dropped_by_watermark`` means events arrived later than the
    declared ``lateness=`` and were EXCLUDED from results — widen the
    horizon if those rows matter.
    """
    p = query.lastProgress or {}
    return _progress_state(p)


def _progress_state(p: dict) -> dict:
    ops = p.get("stateOperators") or []
    return {
        "batch_id": p.get("batchId"),
        "state_rows": sum(int(o.get("numRowsTotal") or 0) for o in ops),
        "rows_dropped_by_watermark": sum(
            int(o.get("numRowsDroppedByWatermark") or 0) for o in ops
        ),
        "state_bytes": sum(int(o.get("memoryUsedBytes") or 0) for o in ops),
        "operators": [
            {
                "name": o.get("operatorName"),
                "rows": int(o.get("numRowsTotal") or 0),
                "updated": int(o.get("numRowsUpdated") or 0),
                "removed": int(o.get("numRowsRemoved") or 0),
                "dropped_by_watermark": int(
                    o.get("numRowsDroppedByWatermark") or 0
                ),
            }
            for o in ops
        ],
    }


def streaming_state_history(query) -> list[dict]:
    """Per-batch state snapshots over the query's retained progress
    window (``recentProgress``, newest last) — the soak-test view:
    assert ``max(state_rows)`` stays bounded while batches keep
    arriving."""
    return [_progress_state(p) for p in (query.recentProgress or [])]
