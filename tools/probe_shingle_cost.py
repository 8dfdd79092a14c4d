"""Decompose the hashed-shingle projection cost of dedup_minhash_lsh.

Times the collapse aggregate plus, incrementally: normalize (codegen
regex), split, shingle HOF, xxhash64 transform, array_distinct — the
chain `_collapsed_rep_pairs` evaluates JVM-side before the signature
UDF. Warm medians of N at the current core count.
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
    print(
        f"{label:44s} med={statistics.median(ts):.3f}  all={[round(t, 3) for t in ts]}",
        flush=True,
    )


def main():
    from pandas_spark import get_spark
    from pandas_spark import fshim as F
    from pandas_spark import read_parquet
    from pandas_spark.operators.text import normalize_expr, shingles_expr

    spark = get_spark("probe_shingle_cost")
    print(f"defaultParallelism={spark.sparkContext.defaultParallelism}")

    def docs():
        return read_parquet(spark, f"{SF_DIR}/documents.parquet").spark

    def collapsed():
        sdf = docs()
        t = sdf.sparkSession.sparkContext.defaultParallelism
        return (
            sdf.repartition(16, F.md5(F.col("text")))
            .groupBy(F.md5(F.col("text")).alias("__k__"))
            .agg(
                F.min("doc_id").alias("__rep__"),
                F.sort_array(F.collect_list(F.col("doc_id"))).alias("__members__"),
                F.first(F.col("text")).alias("text"),
            )
        )

    timed("collapse agg", collapsed)
    timed(
        "+ normalize (regex only)",
        lambda: collapsed().withColumn("__n__", normalize_expr(F.col("text"))),
    )
    timed(
        "+ split",
        lambda: collapsed().withColumn(
            "__t__", F.split(normalize_expr(F.col("text")), " ")
        ),
    )
    timed(
        "+ shingles HOF",
        lambda: collapsed().withColumn("__sh__", shingles_expr(F.col("text"), 5)),
    )
    timed(
        "+ xxhash64 transform",
        lambda: collapsed().withColumn(
            "__h__",
            F.transform(shingles_expr(F.col("text"), 5), lambda sh: F.xxhash64(sh)),
        ),
    )
    timed(
        "+ array_distinct (full with_sh)",
        lambda: collapsed().withColumn(
            "__s__",
            F.array_distinct(
                F.transform(shingles_expr(F.col("text"), 5), lambda sh: F.xxhash64(sh))
            ),
        ),
    )


if __name__ == "__main__":
    main()
