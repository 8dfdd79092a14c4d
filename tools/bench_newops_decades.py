"""Pipeline-decade measurement for the round-6 operators (SCALE.md):
repetition_signals (map-only scan), remove_repeated_ngrams (the
ExactSubstr dedup — corpus-wide window-hash count), and the PQ ANN
pipeline (train + encode + ADC shortlist + exact rerank).

Same protocol as the prior pipeline decades (CROSSOVER.json
"10000x_pipeline"): documents+embeddings only, replicated from sf0.1
with join-graph-preserving id shifts, engine-only, 1 warmup + 1 timed
run, noop sink. Replication makes every document an exact clone family
— the worst case for ExactSubstr (every window is corpus-duplicated,
so the span set is maximal).

    SPARK_GRAFT_PROFILE=large python tools/bench_newops_decades.py 100
    SPARK_GRAFT_PROFILE=large python tools/bench_newops_decades.py 1000
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
DIR = f"{REPO}/.scratch/newops_r{REPS}"
SRC = "/root/testdata/sf0.1"


def ensure_data(spark):
    from pyspark.sql import functions as F

    done = f"{DIR}/.complete"
    if os.path.exists(done):
        return
    for t, (col, step) in {
        "documents": ("doc_id", 1_000_000),
        "embeddings": ("vec_id", 1_000_000),
    }.items():
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        out = src.repartition(64).withColumn(
            "__rep__", F.explode(F.sequence(F.lit(0), F.lit(REPS - 1)))
        )
        out = out.withColumn(
            col,
            F.col(col) + F.col("__rep__").cast("bigint") * F.lit(step).cast("bigint"),
        ).drop("__rep__")
        out.write.mode("overwrite").parquet(f"{DIR}/{t}.parquet")
    with open(done, "w") as f:
        f.write("ok\n")


def noop(sdf):
    sdf.write.format("noop").mode("overwrite").save()


def main():
    from pyspark.sql import functions as F

    from pandas_spark import get_spark, read_parquet
    from pandas_spark.frame import DataFrame
    from pandas_spark.operators import dedup, similarity, text

    spark = get_spark("newops_decades")
    ensure_data(spark)
    docs = read_parquet(spark, f"{DIR}/documents.parquet")
    emb = read_parquet(spark, f"{DIR}/embeddings.parquet")
    nrm = similarity.norm_expr(F.col("embedding"))
    nemb = DataFrame(
        emb.spark.select(
            "vec_id",
            F.transform(F.col("embedding"), lambda x: x.cast("double") / nrm).alias(
                "embedding"
            ),
        )
    )
    queries = DataFrame(
        nemb.spark.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
    )

    def run_rep():
        noop(text.repetition_signals(docs).spark)

    def run_substr():
        noop(dedup.remove_repeated_ngrams(docs, window=8).spark)

    def run_pq():
        cb = similarity.pq_train(nemb, m=16, ksub=16, sample_n=100_000, iters=8, seed=42)
        noop(similarity.pq_topk_rerank(nemb, queries, cb, k=10, shortlist=50).spark)

    def run_kmeans():
        from pandas_spark.operators.clustering import kmeans_assign

        noop(kmeans_assign(emb, k=8, iters=2).spark)

    results = {}
    for name, fn in (
        ("text_repetition_gopher", run_rep),
        ("dedup_exact_substring", run_substr),
        ("sim_topk_pq_pipeline", run_pq),
        ("cluster_kmeans", run_kmeans),
    ):
        if ONLY is not None and name not in ONLY:
            continue
        fn()  # warmup (codegen, Arrow pool, broadcast machinery)
        t0 = time.perf_counter()
        fn()
        results[name] = round(time.perf_counter() - t0, 3)
        print(f"[{REPS}x] {name}: {results[name]} s", file=sys.stderr)
    print(json.dumps({"reps": REPS, "dir": DIR, "queries": results}))


if __name__ == "__main__":
    main()
