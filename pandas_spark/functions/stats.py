"""Statistical expression templates matching pandas' formulas.

pandas and Spark disagree on several estimator conventions
(SURVEY.md §2.4): pandas ``skew``/``kurt`` are the bias-adjusted
sample statistics G1 / excess G2 (reference kernels:
pandas/_libs/groupby.pyx:1069 group_skew, :1139 group_kurt), while
Spark's ``F.skewness``/``F.kurtosis`` are population estimators.
``sem`` is stddev/sqrt(n). All are expressed here as compositions of
built-in aggregates — they stay inside Tungsten hash aggregation
(one pass, partial+final), no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pandas_spark import fshim as F  # backtick-safe F.col facade

# Order-independent summation for double aggregates. Summing doubles
# is order-dependent (partial aggregation merges in shuffle arrival
# order), which makes sum/mean/var nondeterministic in the last bits —
# enough to flip a fixed-decimal rounding at 1e9 magnitude. The fix is
# a BASE-10⁶ DIGIT FOLD: each addend is deterministically decomposed
# into three INTEGER-VALUED doubles
#
#   f0 = floor(x)                       (exact integer part)
#   l1 = floor(frac · 10⁶)              (first 6 fraction digits)
#   l2 = floor((frac·10⁶ − l1) · 10⁶)   (next 6 fraction digits)
#
# (x − floor(x) and frac·10⁶ − l1 are exact double subtractions; each
# ·10⁶ multiply rounds once — all IEEE-deterministic, identical in any
# engine). The three streams are summed as plain doubles: summing
# INTEGERS in double arithmetic is EXACT — hence order-independent —
# while each running sum stays below 2⁵³. l1/l2 addends are < 10⁶, so
# their sums stay exact to ~9·10⁹ rows per group; f0's bound is
# 2⁵³/|x| (~10¹⁰ rows at money magnitude). Result = Σf0 + Σl1/10⁶ +
# Σl2/10¹², THE mathematical sum of the deterministically quantized
# addends (fraction quantization ≤ 1e-12 per addend), independent of
# partitioning. Beyond the 2⁵³ bound the fold degrades gracefully to
# ordinary double summation (last-bit noise) — no overflow error, no
# NULL, under ANSI or not.
#
# Why not decimal? Spark's double→decimal cast routes through
# BigDecimal.valueOf (a Double.toString per value) and wide decimal
# agg buffers box per update — measured +0.7s on a 600k-row 7-agg
# query vs +0.12s for this scheme. pandas reaches the same stability
# via Kahan-compensated kernels (groupby.pyx:720,964).
_B = 1_000_000.0  # 10^6 digit base
_B2 = _B * _B     # 10^12


def _dcol(col: str | Column) -> Column:
    return col if isinstance(col, Column) else F.col(col)


def _split_sum(c: Column, no_inf: bool = False, no_nan: bool = False) -> Column:
    """Σc as Σf0 + Σl1/10⁶ + Σl2/10¹² — three exact integer-in-double folds.

    Non-finite inputs can't ride the fixed-point split (floor(±inf)
    overflows to garbage longs — fuzzer-found: clip→pct_change→sum gave
    9.2e18 where pandas gives inf). They take the IEEE branch instead:
    +inf and −inf together → NaN, else the surviving infinity; NaN
    values are SKIPPED like NULL (pandas skipna — the engine's
    NaN≡missing rule).

    The gating is tiered by PROOF (bounds.py, parquet footer stats):

    * ``no_inf and no_nan`` — fully ungated: the three plain folds,
      zero per-row branching, zero extra aggregate buffers.
    * ``no_inf`` only — a one-branch NaN-skip gate; no ±inf counters,
      no final CASE.
    * unproven — ``c − c == 0`` gates out every non-finite in ONE
      comparison (inf−inf and NaN−NaN are NaN), and a single
      ``bit_or`` of a 2-bit code replaces the former two ±inf counter
      sums (round-6 verdict #1: the two counters + a triple-comparison
      gate inlined ~6× per sum doubled flagship q1)."""
    if no_inf and no_nan:
        fin = c
    elif no_inf:
        # nanvl(c, NULL) — one function node vs a CASE WHEN NOT
        # isnan(c) tree; the gate is inlined ~7x per sum (f0/l1/l2
        # reference chains), so node size is wall time (measured
        # 0.82 -> 0.64 s on flagship q1 at sf0.1)
        fin = F.nanvl(c, F.lit(None).cast("double"))
    else:
        fin = F.when((c - c) == F.lit(0.0), c)
    f0 = F.floor(fin)
    fr = fin - f0
    frB = fr * F.lit(_B)
    l1 = F.floor(frB)
    l2 = F.floor((frB - l1) * F.lit(_B))
    exact = F.sum(f0) + F.sum(l1) / F.lit(_B) + F.sum(l2) / F.lit(_B2)
    if no_inf:
        return exact
    inf = float("inf")
    code = F.bit_or(
        F.when(c == F.lit(inf), F.lit(1))
        .when(c == F.lit(-inf), F.lit(2))
        .otherwise(F.lit(0))
    )
    return (
        F.when(code == 3, F.lit(float("nan")))
        .when(code == 1, F.lit(inf))
        .when(code == 2, F.lit(-inf))
        .otherwise(exact)
    )


# -- SQL-text twins ---------------------------------------------------------
# Building the fold as pyspark Column objects costs one py4j round trip
# PER EXPRESSION NODE (~50 nodes x 7 aggregates on the flagship query —
# ~40% of the query's wall clock was driver-side plan construction,
# measured with cProfile at the 10x decade). When the aggregate input
# is a plain column NAME, the same tree is built as ONE SQL string and
# parsed JVM-side in a single F.expr call. The text mirrors the Column
# builders token-for-token (same ops, same literal types via D/E
# suffixes), so values are bit-identical either way.


def _split_sum_sql(x: str, no_inf: bool = False, no_nan: bool = False) -> str:
    if no_inf and no_nan:
        fin = x
    elif no_inf:
        fin = f"nanvl({x}, CAST(NULL AS DOUBLE))"
    else:
        fin = f"(CASE WHEN (({x} - {x}) = 0.0D) THEN {x} END)"
    f0 = f"FLOOR({fin})"
    fr = f"({fin} - CAST({f0} AS DOUBLE))"
    frB = f"({fr} * 1.0E6)"
    l1 = f"FLOOR({frB})"
    l2 = f"FLOOR((({frB} - CAST({l1} AS DOUBLE)) * 1.0E6))"
    exact = f"(sum({f0}) + sum({l1}) / 1.0E6 + sum({l2}) / 1.0E12)"
    if no_inf:
        return exact
    code = (
        f"bit_or(CASE WHEN ({x} = CAST('Infinity' AS DOUBLE)) THEN 1 "
        f"WHEN ({x} = CAST('-Infinity' AS DOUBLE)) THEN 2 ELSE 0 END)"
    )
    return (
        f"(CASE WHEN {code} = 3 THEN CAST('NaN' AS DOUBLE) "
        f"WHEN {code} = 1 THEN CAST('Infinity' AS DOUBLE) "
        f"WHEN {code} = 2 THEN CAST('-Infinity' AS DOUBLE) "
        f"ELSE {exact} END)"
    )


def _count_skipna_sql(x: str, no_nan: bool = False) -> str:
    if no_nan:
        return f"count({x})"
    return f"count(nanvl({x}, CAST(NULL AS DOUBLE)))"


from pandas_spark.dtypes import qi as _q  # shared SQL identifier quoter


def exact_sum(col: str | Column, no_inf: bool = False, no_nan: bool = False) -> Column:
    """Order-independent sum for double columns (split fixed-point)."""
    if isinstance(col, str):
        return F.expr(_split_sum_sql(_q(col), no_inf, no_nan))
    return _split_sum(_dcol(col), no_inf, no_nan)


def _count_skipna(c: Column, no_nan: bool = False) -> Column:
    # pandas counts exclude NaN (the NaN≡missing rule); Spark's count
    # includes it
    if no_nan:
        return F.count(c)
    return F.count(F.nanvl(c, F.lit(None).cast("double")))


def exact_mean(col: str | Column, no_inf: bool = False, no_nan: bool = False) -> Column:
    """Exact-sum / count — deterministic mean for double columns."""
    if isinstance(col, str):
        x = _q(col)
        return F.expr(
            f"({_split_sum_sql(x, no_inf, no_nan)} / {_count_skipna_sql(x, no_nan)})"
        )
    c = _dcol(col)
    return _split_sum(c, no_inf, no_nan) / _count_skipna(c, no_nan)


def _exact_moments(c: Column, no_inf: bool = False, no_nan: bool = False):
    n = _count_skipna(c, no_nan).cast("double")
    s1 = _split_sum(c, no_inf, no_nan)
    # x*x is computed per-row in double (deterministic), then summed
    # exactly — only the final subtraction rounds, once. Callers may
    # only pass no_inf when c*c provably can't overflow (bounds check
    # in groupby.resolve_agg).
    s2 = _split_sum(c * c, no_inf, no_nan)
    return n, s1, s2


def _var_sql(col: str, ddof: int, no_inf: bool, no_nan: bool) -> str:
    x = f"CAST({_q(col)} AS DOUBLE)"
    n = f"CAST({_count_skipna_sql(x, no_nan)} AS DOUBLE)"
    s1 = _split_sum_sql(x, no_inf, no_nan)
    s2 = _split_sum_sql(f"({x} * {x})", no_inf, no_nan)
    d = float(ddof)
    return (
        f"(CASE WHEN {n} > {ddof} THEN "
        f"(({s2} - {s1} * {s1} / {n}) / ({n} - {d!r}D)) END)"
    )


def exact_var(col: str | Column, ddof: int = 1, no_inf: bool = False,
              no_nan: bool = False) -> Column:
    """Sample variance from exact decimal moments (order-independent)."""
    if isinstance(col, str):
        return F.expr(_var_sql(col, ddof, no_inf, no_nan))
    c = _dcol(col).cast("double")
    n, s1, s2 = _exact_moments(c, no_inf, no_nan)
    return F.when(n > ddof, (s2 - s1 * s1 / n) / (n - F.lit(float(ddof))))


def exact_std(col: str | Column, ddof: int = 1, no_inf: bool = False,
              no_nan: bool = False) -> Column:
    if isinstance(col, str):
        return F.expr(f"SQRT({_var_sql(col, ddof, no_inf, no_nan)})")
    return F.sqrt(exact_var(col, ddof, no_inf, no_nan))


def exact_sem(col: str | Column, ddof: int = 1, no_inf: bool = False,
              no_nan: bool = False) -> Column:
    if isinstance(col, str):
        return F.expr(
            f"(SQRT({_var_sql(col, ddof, no_inf, no_nan)}) / SQRT(count({_q(col)})))"
        )
    c = _dcol(col)
    return exact_std(col, ddof, no_inf, no_nan) / F.sqrt(F.count(c))


def exact_covar(x: str | Column, y: str | Column, ddof: int = 1) -> Column:
    """Sample covariance from exact split fixed-point cross-moments."""
    cx, cy = _dcol(x).cast("double"), _dcol(y).cast("double")
    both = F.when(cx.isNotNull() & cy.isNotNull(), True)
    n = F.count(both).cast("double")
    sx = _split_sum(F.when(both, cx))
    sy = _split_sum(F.when(both, cy))
    sxy = _split_sum(F.when(both, cx * cy))
    return F.when(n > ddof, (sxy - sx * sy / n) / (n - F.lit(float(ddof))))


def exact_corr(x: str | Column, y: str | Column) -> Column:
    """Pearson correlation from exact split fixed-point moments."""
    cx, cy = _dcol(x).cast("double"), _dcol(y).cast("double")
    both = F.when(cx.isNotNull() & cy.isNotNull(), True)
    n = F.count(both).cast("double")
    sx = _split_sum(F.when(both, cx))
    sy = _split_sum(F.when(both, cy))
    sxx = _split_sum(F.when(both, cx * cx))
    syy = _split_sum(F.when(both, cy * cy))
    sxy = _split_sum(F.when(both, cx * cy))
    cov = sxy - sx * sy / n
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    return F.when((n > 1) & (vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))


def skew(col: str | Column, over=None) -> Column:
    """Bias-adjusted sample skewness G1 = g1 * sqrt(n(n-1))/(n-2).

    Built on Spark's ``skewness`` (one-pass *centered* moment
    aggregation — CentralMomentAgg), which avoids the catastrophic
    cancellation of the raw-moment formula when |mean| >> std, then
    bias-adjusted to pandas' G1 (reference groupby.pyx:1069).
    ``over=`` windows each component aggregate (rolling/expanding skew
    — aggregations.pyx:529 roll_skew uses the same composite).
    """
    c = (col if isinstance(col, Column) else F.col(col)).cast("double")
    w = (lambda e: e.over(over)) if over is not None else (lambda e: e)
    n = w(F.count(c)).cast("double")
    g1 = w(F.skewness(c))
    adj = F.sqrt(n * (n - 1)) / (n - 2)
    return F.when((n > 2) & g1.isNotNull(), adj * g1)


def kurt(col: str | Column, over=None) -> Column:
    """Bias-adjusted excess kurtosis G2 (pandas' formula).

    G2 = ((n+1)*g2 + 6) * (n-1)/((n-2)(n-3)) where g2 is Spark's
    excess ``kurtosis`` (centered one-pass kernel — no cancellation;
    reference groupby.pyx:1139). ``over=`` windows each component
    (aggregations.pyx:686 roll_kurt).
    """
    c = (col if isinstance(col, Column) else F.col(col)).cast("double")
    w = (lambda e: e.over(over)) if over is not None else (lambda e: e)
    n = w(F.count(c)).cast("double")
    g2 = w(F.kurtosis(c))
    out = ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
    return F.when((n > 3) & g2.isNotNull(), out)


def sem(col: str | Column, ddof: int = 1) -> Column:
    """Standard error of the mean: std(ddof)/sqrt(count)."""
    c = col if isinstance(col, Column) else F.col(col)
    std = F.stddev_samp(c) if ddof == 1 else F.stddev_pop(c)
    return std / F.sqrt(F.count(c))


def mode_agg(col: str | Column) -> Column:
    """Most frequent value (ties → smallest, matching pandas sort)."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.mode(c)


def product(col: str | Column) -> Column:
    c = col if isinstance(col, Column) else F.col(col)
    return F.product(c)


# ---------------------------------------------------------------------------
# Kendall tau-b (Knight 1966, O(n log n)) — numpy kernel, no scipy.
# Reference: pandas frame.py:15791 corr(method='kendall') routes to
# nanops nancorr_kendall; same tau-b definition.
# ---------------------------------------------------------------------------

def _count_inversions(a) -> int:
    """Strict inversions (i<j, a[i]>a[j]) — bottom-up merge counting.

    Base level: 64-element blocks compared pairwise in ONE broadcast
    over all blocks (O(n·64) vectorized comparisons) and block-sorted
    with one ``np.sort(axis=1)``. Merge levels then double the run
    length; each adjacent-run merge counts cross-inversions with one
    ``searchsorted`` and re-sorts the concatenation with numpy's
    stable timsort (which detects the two runs — linear merge). Python
    loop iterations total ~n/64 across ALL levels, vs the previous
    top-down recursion's per-level argsort (O(n log² n) with python
    call overhead — 18 s at 2M rows; this form measures ~50×)."""
    import numpy as np

    n = len(a)
    if n < 2:
        return 0
    B = 64
    pad = (-n) % B
    work = np.asarray(a, dtype=np.float64)
    if pad:
        # +inf padding at the tail inverts with nothing (x > inf never)
        work = np.concatenate([work, np.full(pad, np.inf)])
    m = len(work)
    blocks = work.reshape(-1, B)
    iu, ju = np.triu_indices(B, 1)
    inv = 0
    for s in range(0, len(blocks), 4096):  # bound the fancy-index temp
        ch = blocks[s : s + 4096]
        inv += int((ch[:, iu] > ch[:, ju]).sum())
    work = np.sort(blocks, axis=1).reshape(-1)
    L = B
    while L < m:
        out = np.empty_like(work)
        for s in range(0, m, 2 * L):
            A = work[s : s + L]
            Bc = work[s + L : s + 2 * L]
            if len(Bc) == 0:
                out[s : s + len(A)] = A
                continue
            inv += int((len(A) - np.searchsorted(A, Bc, side="right")).sum())
            merged = np.concatenate([A, Bc])
            merged.sort(kind="stable")
            out[s : s + len(merged)] = merged
        work = out
        L *= 2
    return inv


def kendall_cd_np(x, y) -> tuple:
    """``(C − D, x-tie pairs, y-tie pairs, n)`` over two NaN-free
    arrays — the per-tile kernel of the DISTRIBUTED tau-b
    (frame._corr_kendall). C − D = n0 − n1 − n2 + n3 − 2·swaps with
    swaps = strict y-inversions after the lexicographic (x, y) sort
    (Knight's identity, same derivation as :func:`kendall_tau_np`).
    All integer math — tile sums merge exactly."""
    import numpy as np

    n = len(x)
    if n < 2:
        return 0, 0, 0, n
    perm = np.lexsort((y, x))
    x, y = x[perm], y[perm]
    n0 = n * (n - 1) // 2

    def ties(v):
        _, counts = np.unique(v, return_counts=True)
        return int((counts * (counts - 1) // 2).sum())

    n1 = ties(x)
    n2 = ties(y)
    # joint-tie pairs n3, run-length encoded (tiles reach millions of
    # rows — the per-element Python loop of the gathered kernel would
    # dominate the tile)
    same = (x[1:] == x[:-1]) & (y[1:] == y[:-1])
    breaks = np.flatnonzero(~same) + 1
    run_lens = np.diff(np.concatenate(([0], breaks, [n])))
    n3 = int((run_lens * (run_lens - 1) // 2).sum())
    swaps = _count_inversions(y)
    return n0 - n1 - n2 + n3 - 2 * swaps, n1, n2, n


def kendall_tau_np(x, y) -> float:
    """tau-b over two float arrays (NaN pairs dropped — pandas'
    pairwise-complete rule): (n_c − n_d) / sqrt((n0−n1)(n0−n2)) with
    n_d counted as strict y-inversions after a lexicographic (x, y)
    sort (Knight's algorithm)."""
    import numpy as np

    m = ~(np.isnan(x) | np.isnan(y))
    x, y = x[m], y[m]
    n = len(x)
    if n < 2:
        return float("nan")
    perm = np.lexsort((y, x))
    x, y = x[perm], y[perm]
    n0 = n * (n - 1) // 2

    def ties(v):
        _, counts = np.unique(v, return_counts=True)
        return int((counts * (counts - 1) // 2).sum())

    n1 = ties(x)
    n2 = ties(y)
    # joint ties: (x, y) both sorted lexicographically → equal pairs
    # are consecutive runs
    same = (x[1:] == x[:-1]) & (y[1:] == y[:-1])
    n3 = 0
    run = 1
    import itertools
    for s in itertools.chain(same, [False]):
        if s:
            run += 1
        else:
            n3 += run * (run - 1) // 2
            run = 1
    swaps = _count_inversions(y)
    num = n0 - n1 - n2 + n3 - 2 * swaps
    den = float(n0 - n1) * float(n0 - n2)
    if den <= 0:
        return float("nan")
    return num / den ** 0.5
