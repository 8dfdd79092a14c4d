"""Distributed Lloyd's k-means over embedding columns.

The training-pipeline clustering operator (corpus bucketing for
SemDeDup-style dedup, domain discovery, stratified curriculum mixes).
The reference has no clustering; the published algorithm is Lloyd
(1957/1982). Spark-first layout per iteration:

  1. ASSIGN — pure Catalyst: argmin ||x−c||² computed as
     argmax(x·c − ||c||²/2) with the centroid matrix riding as ONE
     nested-array literal and a HOF dot fold per cell (the allocation
     profile that survived the 10⁴× decade in similarity.py's IVF —
     no Arrow crossing, no per-row objects).
  2. PARTIAL SUMS — one zero-copy mapInArrow pass: per Arrow batch, a
     (n×dim) matrix view and np.add.at accumulate per-cell vector sums
     and counts; each batch emits ≤k tiny rows (cell, n, sum).
  3. COMBINE — the ≤ batches·k partials are collected (bounded driver
     receipt: 32 partitions × k × dim doubles ≈ kilobytes; at 1000
     executors still ≤ a few MB) and summed in deterministic
     (cell, batch) order, so re-runs are bit-identical.

Empty cells keep their previous centroid (standard Lloyd's rule).
Assignment tie-break: equal distance → smaller cell index (np.argmin
convention), encoded as (score, −index) struct max.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame as SparkDF
from pandas_spark import fshim as F  # backtick-safe F.col facade

from pandas_spark.frame import DataFrame


def _l2_assign_expr(C: np.ndarray, v: Column) -> Column:
    """argmin_j ||v − C_j||² as a Catalyst fold: argmax(v·C_j − b_j)
    with b_j = ||C_j||²/2 (the ||v||² term is constant per row).
    Same literal/fold shape as similarity._cells_expr (one nested-array
    node, HOF dot), with the per-cell bias riding in a second literal."""
    c_lit = F.lit([[float(x) for x in row] for row in C])
    b_lit = F.lit([float(0.5 * (row * row).sum()) for row in C])
    pairs = F.transform(
        F.sequence(F.lit(0), F.lit(len(C) - 1)),
        lambda j: F.struct(
            (
                F.aggregate(
                    F.zip_with(
                        v,
                        F.element_at(c_lit, j + 1),
                        lambda a, b: a.cast("double") * b,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                - F.element_at(b_lit, j + 1)
            ).alias("s"),
            (-j).alias("ni"),
        ),
    )
    return (-F.array_max(pairs)["ni"]).cast("int")


def _partial_sums(assigned: SparkDF, vec_col: str, k: int, dim: int) -> SparkDF:
    """mapInArrow partial reduction: (cell, vec) batches → per-cell
    (count, vector sum) — ≤k rows per batch, zero-copy matrix view."""
    import pyarrow as pa

    from pandas_spark.operators.similarity import _vec_matrix

    def gen(batches):
        for batch in batches:
            cells = batch.column("cell").to_numpy(zero_copy_only=False)
            X = _vec_matrix(batch.column(vec_col))
            sums = np.zeros((k, X.shape[1]), dtype=np.float64)
            np.add.at(sums, cells, X)
            counts = np.bincount(cells, minlength=k).astype(np.int64)
            present = np.nonzero(counts)[0]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(present.astype(np.int32)),
                    pa.array(counts[present]),
                    pa.array(list(sums[present])),
                ],
                names=["cell", "n", "s"],
            )

    return assigned.mapInArrow(gen, "cell int, n long, s array<double>")


def kmeans(
    frame: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
    init_ids: Sequence | None = None,
):
    """Lloyd's k-means: returns ``(assignments, centroids)`` where
    assignments = the frame plus an int ``cell`` column under the FINAL
    centroids, and centroids is the k×dim driver-side list.

    ``init_ids`` picks the seed vectors by id (default: the k smallest
    ids — deterministic, oracle-reproducible; for production quality
    pass a hash-spread sample, e.g. similarity._bounded_hash_sample).
    Each iteration is one assign (map-only) + one partial-sum pass; no
    corpus-sized shuffle anywhere, driver receipt bounded by
    batches·k·dim."""
    sdf = frame.spark
    v = F.col(vec_col).cast("array<double>")
    if init_ids is not None:
        seed_rows = (
            sdf.filter(F.col(id_col).isin(list(init_ids)))
            .orderBy(id_col)
            .select(v.alias("e"))
            .collect()
        )
    else:
        seed_rows = sdf.orderBy(id_col).limit(k).select(v.alias("e")).collect()
    C = np.array([r["e"] for r in seed_rows], dtype=np.float64)
    if C.shape[0] < k:
        raise ValueError(f"kmeans: only {C.shape[0]} seed vectors for k={k}")
    dim = C.shape[1]
    for _ in range(int(iters)):
        assigned = sdf.select(
            _l2_assign_expr(C, v).alias("cell"), v.alias(vec_col)
        )
        partials = _partial_sums(assigned, vec_col, k, dim)
        # deterministic combine: fixed (cell, partial order) on the
        # driver — float sums don't depend on shuffle arrival order
        rows = sorted(
            partials.collect(), key=lambda r: (r["cell"], tuple(r["s"]))
        )
        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for r in rows:
            sums[r["cell"]] += np.asarray(r["s"], dtype=np.float64)
            counts[r["cell"]] += r["n"]
        nonempty = counts > 0
        C = C.copy()
        C[nonempty] = sums[nonempty] / counts[nonempty, None]
    out = frame._with(
        frame._sdf.withColumn("cell", _l2_assign_expr(C, v))
    )
    return out, [[float(x) for x in row] for row in C]


def kmeans_assign(
    frame: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """The assignments half of :func:`kmeans` (suite-friendly)."""
    out, _ = kmeans(frame, vec_col=vec_col, id_col=id_col, k=k, iters=iters)
    return out
