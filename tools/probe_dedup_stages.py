"""Per-stage timing of dedup_minhash_lsh at the current core count.

Splits the plan into: md5-collapse agg, + shingle projection,
+ signature (full cached-base fill), LSH bucket pairs, Jaccard verify,
and the full query. Warm medians of N.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("PROBE_RUNS", "5"))


def timed(label, build):
    build().write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(RUNS):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        ts.append(time.time() - t0)
    print(f"{label:40s} med={statistics.median(ts):.3f}  all={[round(t,3) for t in ts]}", flush=True)


def main():
    from pandas_spark import get_spark
    from pandas_spark import fshim as F
    from pandas_spark import read_parquet
    from pandas_spark.operators import dedup
    from pandas_spark.operators.text import shingles_expr
    from pandas_spark._exprmemo import memo_column

    spark = get_spark("probe_dedup")
    print(f"defaultParallelism={spark.sparkContext.defaultParallelism}")

    def docs():
        return read_parquet(spark, f"{SF_DIR}/documents.parquet")

    def pre(sdf):
        t = sdf.sparkSession.sparkContext.defaultParallelism
        return sdf.repartition(t, F.md5(F.col("text")))

    def collapsed(sdf):
        return pre(sdf).groupBy(F.md5(F.col("text")).alias("__k__")).agg(
            F.min("doc_id").alias("__rep__"),
            F.sort_array(F.collect_list(F.col("doc_id"))).alias("__members__"),
            F.first(F.col("text")).alias("text"),
        )

    def with_sh(sdf):
        return collapsed(sdf).withColumn(
            "__s__",
            F.array_distinct(
                F.transform(shingles_expr(F.col("text"), 5), lambda sh: F.xxhash64(sh))
            ),
        )

    def base(sdf):
        return dedup.minhash_signature(
            with_sh(sdf), "text", 64, 5, shingles_col="__s__"
        ).select("__rep__", "__members__", "minhash", "__s__")

    timed("scan only", lambda: docs().spark)
    timed("repartition(md5)", lambda: pre(docs().spark))
    timed("collapse agg", lambda: collapsed(docs().spark))
    timed("+ hashed shingles", lambda: with_sh(docs().spark))
    timed("+ signature (full base)", lambda: base(docs().spark))
    # full query for reference
    from pandas_spark import suite

    qs = suite.queries()
    timed("FULL dedup_minhash_lsh", lambda: qs["dedup_minhash_lsh"](spark, SF_DIR))


if __name__ == "__main__":
    main()
