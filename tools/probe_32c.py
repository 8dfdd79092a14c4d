"""Isolate the 32-core anti-scaling of dedup_minhash_lsh / sim_topk_cosine.

Runs one query's plan variants warm (median of N) under the current
SPARK_GRAFT_CPUS, printing per-variant wall seconds. Usage:

    SPARK_GRAFT_CPUS=32 python tools/probe_32c.py sim
    SPARK_GRAFT_CPUS=32 python tools/probe_32c.py dedup
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("PROBE_RUNS", "5"))


def timed(label, build, spark):
    # warmup
    build().write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(RUNS):
        t0 = time.time()
        df = build()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.time() - t0)
    med = statistics.median(ts)
    print(f"{label:50s} med={med:.3f}  all={[round(t,3) for t in ts]}", flush=True)
    return med


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "sim"
    from pandas_spark import get_spark
    from pandas_spark import suite

    spark = get_spark("probe32")
    qs = suite.queries()
    print(f"defaultParallelism={spark.sparkContext.defaultParallelism}")

    if which == "sim":
        timed("sim_topk_cosine baseline", lambda: qs["sim_topk_cosine"](spark, SF_DIR), spark)
        # variant: coalesce the corpus scan to 1 partition inside the op
        from pandas_spark.suite_datapipe import _emb
        from pandas_spark.operators import similarity
        from pandas_spark.frame import DataFrame
        from pandas_spark import fshim as F

        def build_coalesced(n):
            def b():
                emb = _emb(spark, SF_DIR)
                queries = DataFrame(
                    emb.spark.filter(F.col("vec_id") < 5).select(
                        F.col("vec_id").alias("query_id"), "embedding"
                    )
                )
                emb2 = DataFrame(emb.spark.coalesce(n))
                out = similarity.cosine_topk(
                    emb2, queries, k=10, id_col="vec_id", vec_col="embedding"
                )
                return out.to_spark().withColumn("rank", F.col("rank").cast("long"))
            return b

        for n in (1, 2, 4, 8):
            timed(f"sim_topk corpus coalesce({n})", build_coalesced(n), spark)
    elif which == "dedup":
        timed("dedup_minhash baseline", lambda: qs["dedup_minhash_lsh"](spark, SF_DIR), spark)
        # variant: shrink the fan-out via env-tunable spread target
        for n in (1, 2, 4, 8, 16):
            os.environ["SPARK_GRAFT_SPREAD_MAX"] = str(n)
            timed(f"dedup_minhash SPREAD_MAX={n}", lambda: qs["dedup_minhash_lsh"](spark, SF_DIR), spark)
        os.environ.pop("SPARK_GRAFT_SPREAD_MAX", None)
    elif which == "runsplit":
        # Is run 1 the slow one (worker spawn) or every run (per-task cost)?
        build = lambda: qs[sys.argv[2]](spark, SF_DIR)
        build().write.format("noop").mode("overwrite").save()
        for i in range(RUNS):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            print(f"run {i}: {time.time()-t0:.3f}", flush=True)


if __name__ == "__main__":
    main()
