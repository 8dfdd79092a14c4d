"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, and an LSH
(random-hyperplane) bucketed variant as the scale path — at 100 TB the
bucketed join touches ~1/2^bits of the corpus per query instead of all
of it. Dot products run as ``F.aggregate``/``F.zip_with`` higher-order
functions — JVM-side, no Python per row.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame as SparkDF, Window as W
from pyspark.sql import functions as F

from pandas_spark.frame import DataFrame


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double"))
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query (brute force).

    Queries are broadcast (the small side); the corpus never shuffles —
    per-partition score + per-query top-k via window. Tie-break on
    corpus id for determinism.
    """
    q = queries.spark.select(
        F.col(query_id_col), F.col(vec_col).alias("__qv__")
    )
    c = corpus.spark.select(F.col(id_col), F.col(vec_col).alias("__cv__"))
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine", cosine_expr(F.col("__cv__"), F.col("__qv__"))
    )
    w = W.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    out = (
        scored.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .select(query_id_col, id_col, "cosine", F.col("__rn__").alias("rank"))
    )
    return DataFrame(out)


def _hyperplanes(dim: int, bits: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(bits)]


def lsh_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(v · plane_i)."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append((dot_expr(vec, plane) > 0).cast("long") * F.lit(1 << i))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket equi-join, then exact
    cosine within the bucket. At scale the equi-join on the signature
    replaces the cross join (probe cost /2^bits); multi-probe (flip one
    bit) lifts recall."""
    planes = _hyperplanes(dim, bits, seed)
    c = corpus.spark.select(F.col(id_col), F.col(vec_col).alias("__cv__")).withColumn(
        "__bucket__", lsh_bucket_expr(F.col("__cv__"), planes)
    )
    q = queries.spark.select(
        F.col(query_id_col), F.col(vec_col).alias("__qv__")
    ).withColumn("__qbucket__", lsh_bucket_expr(F.col("__qv__"), planes))
    # multi-probe: exact bucket + all 1-bit-flipped buckets
    probes = q.select(
        query_id_col,
        "__qv__",
        F.explode(
            F.array(
                F.col("__qbucket__"),
                *[
                    F.col("__qbucket__").bitwiseXOR(F.lit(1 << i))
                    for i in range(bits)
                ],
            )
        ).alias("__bucket__"),
    )
    scored = c.join(F.broadcast(probes), "__bucket__").withColumn(
        "cosine", cosine_expr(F.col("__cv__"), F.col("__qv__"))
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    out = (
        scored.groupBy(query_id_col, id_col, "cosine")
        .agg(F.lit(1))
        .withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .select(query_id_col, id_col, "cosine", F.col("__rn__").alias("rank"))
    )
    return DataFrame(out)


def blocked_neardup_pairs(
    frame: DataFrame,
    block_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Exact cosine near-dup pairs within a blocking key (label,
    source, shard…): the deterministic alternative to LSH blocking —
    the quadratic term is bounded per block, the block equi-join is the
    only shuffle, and recall within a block is 1."""
    sdf = frame.spark.select(F.col(block_col), F.col(id_col), F.col(vec_col).alias("__v__"))
    l, r = sdf.alias("l"), sdf.alias("r")
    out = (
        l.join(
            r,
            (F.col(f"l.{block_col}") == F.col(f"r.{block_col}"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .withColumn("cosine", cosine_expr(F.col("l.__v__"), F.col("r.__v__")))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col(f"l.{id_col}").alias("id1"),
            F.col(f"r.{id_col}").alias("id2"),
            "cosine",
        )
    )
    return DataFrame(out)


def embedding_neardup_pairs(
    frame: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    bits: int = 6,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH blocking + exact
    cosine filter (the embedding analog of minhash_dedup_pairs)."""
    planes = _hyperplanes(dim, bits, seed)
    sdf = frame.spark.select(F.col(id_col), F.col(vec_col).alias("__v__")).withColumn(
        "__bucket__", lsh_bucket_expr(F.col("__v__"), planes)
    )
    l, r = sdf.alias("l"), sdf.alias("r")
    out = (
        l.join(
            r,
            (F.col("l.__bucket__") == F.col("r.__bucket__"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .withColumn("cosine", cosine_expr(F.col("l.__v__"), F.col("r.__v__")))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col(f"l.{id_col}").alias("id1"),
            F.col(f"r.{id_col}").alias("id2"),
            "cosine",
        )
    )
    return DataFrame(out)
