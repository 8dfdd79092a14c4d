"""Engine-vs-pandas crossover measurement at 10× data (BASELINE.md).

The sf0.1 headline numbers are dominated by Spark's fixed per-query
floor (~0.2-0.5s of job scheduling / shuffle setup that does not scale
with data). This script measures the point the design claim is
actually about: the SAME headline queries on 10× data (6M-row
lineitem, 1.5M orders, 1M events, 150k customer, 200k part), engine
and eager pandas side by side. Both sides run their standard harness:

  engine : bench.py            (warmup pass + median of 3, noop sink)
  pandas : tools/bench_pandas_ref.py  (median of 5 after 1 warmup)

Usage:

    python tools/bench_crossover.py [dir] > CROSSOVER.json

Generates the 10× data on first run by replicating sf0.1 with shifted
keys (deterministic — key shifts preserve every join relationship the
headline queries use: lineitem.l_orderkey ↔ orders.o_orderkey,
orders.o_custkey ↔ customer.c_custkey; nation/region/supplier copy
unchanged). documents/embeddings replicate with shifted ids so the
dedup/similarity entries run too (each document gains 9 exact clones —
a realistic dedup workload, though it does inflate the near-dup pair
count relative to sf0.1).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ARGS = [a for a in sys.argv[1:] if a != "--engine-only"]
# --engine-only skips the pandas reference side — the 1000× decade
# (600M-row lineitem ≈ sf100) needs ~30 GB per pruned query in pandas,
# which stops being a comparison and starts being an OOM experiment
ENGINE_ONLY = "--engine-only" in sys.argv[1:]
DIR = ARGS[0] if len(ARGS) > 0 else "/root/repo/.scratch/sf1ish"
SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# replication factor: 10 → ~sf1 (6M-row lineitem); 100 → ~sf10 (60M).
# The key-shift spacings below support up to 1000 replicas without
# collisions (10M spacing vs ≤600k source keys).
REPS = int(ARGS[1]) if len(ARGS) > 1 else 10

sys.path.insert(0, REPO)

# table -> columns shifted per replica (shift, column) pairs keep the
# join graph intact across replicas
SHIFTS = {
    "lineitem": [("l_orderkey", 10_000_000), ("l_partkey", 1_000_000), ("l_suppkey", 100_000)],
    "orders": [("o_orderkey", 10_000_000), ("o_custkey", 1_000_000)],
    "customer": [("c_custkey", 1_000_000)],
    "part": [("p_partkey", 1_000_000)],
    "supplier": [("s_suppkey", 100_000)],
    "events": [("event_id", 10_000_000), ("user_id", 1_000_000)],
    "documents": [("doc_id", 1_000_000)],
    # vec_id, not emb_id: the wrong name silently skipped the shift
    # (the `col in cols` guard), leaving every vec_id duplicated REPS×
    # — which turned a 5-query probe set into 5·REPS rows and blew the
    # sim entries' candidate joins up by REPS× at every decade
    "embeddings": [("vec_id", 1_000_000)],
}
COPY = ["nation", "region"]


def ensure_data(spark):
    from pyspark.sql import functions as F

    done = f"{DIR}/.complete_v2" if REPS == 10 else f"{DIR}/.complete_v2_r{REPS}"
    if os.path.exists(done):
        return
    # refuse to silently overwrite a DIFFERENT replication's data: the
    # dir's completion marker encodes the REPS it was generated at, and
    # regenerating (e.g. running sf10ish without the explicit `100`
    # arg, which defaults REPS=10) destroys the larger decade. Delete
    # the stale markers first if a rebuild is really intended.
    import glob as _glob

    others = [
        m
        for m in _glob.glob(f"{DIR}/.complete_v2*")
        if os.path.basename(m) != os.path.basename(done)
    ]
    if others:
        sys.exit(
            f"REFUSED: {DIR} holds data generated at a different replication "
            f"({', '.join(os.path.basename(m) for m in others)}); rerun with the "
            f"matching REPS arg, or delete the markers to force a rebuild"
        )
    for t, shifts in SHIFTS.items():
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        cols = set(src.columns)
        if REPS <= 20:
            reps = []
            for i in range(REPS):
                r = src
                for col, step in shifts:
                    if col in cols:
                        r = r.withColumn(col, F.col(col) + F.lit(i * step))
                reps.append(r)
            out = reps[0]
            for r in reps[1:]:
                out = out.unionAll(r)
        else:
            # a REPS-way union makes Catalyst analyze a REPS-node plan;
            # at 100-1000 replicas, explode a replica index instead —
            # one map-side row multiplier, O(1) plan size. Repartition
            # BEFORE the explode (the source has only a few row groups
            # → a few tasks; 64-way spread gives every core a slice of
            # the multiplication) and write the exploded rows straight
            # out — no post-explode shuffle of REPS× the data.
            out = src.repartition(64).withColumn(
                "__rep__", F.explode(F.sequence(F.lit(0), F.lit(REPS - 1)))
            )
            for col, step in shifts:
                if col in cols:
                    # cast BEFORE multiplying: int __rep__ × int step
                    # wraps at rep·step > 2³¹ (silent in non-ANSI) —
                    # rep ≥ 215 with a 10M step produced NEGATIVE keys
                    # and hundreds of millions of key collisions in the
                    # 1000× decade data
                    out = out.withColumn(
                        col,
                        F.col(col)
                        + F.col("__rep__").cast("bigint") * F.lit(step).cast("bigint"),
                    )
            out = out.drop("__rep__")
        out.write.mode("overwrite").parquet(f"{DIR}/{t}.parquet")
    for t in COPY:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DIR}/{t}.parquet"
        )
    with open(done, "w") as f:
        f.write("ok\n")


def main():
    from pandas_spark import get_spark

    # Memory sizing is part of the committed protocol, not ambient
    # shell state (the r5/r6 lesson): in local mode the driver IS the
    # executor, and the 8g default that is right for sf0.1 makes the
    # 100x decade GC-bound (join_inner measured 8.4 s under an 8g heap
    # across the full suite vs 5.2 s focused — heap churn, not plan).
    # A real deployment sizes executor memory to the data; committing
    # the same two knobs here keeps every decade reproducible from
    # this file alone. setdefault: an explicit export still wins.
    if REPS >= 100:
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
        os.environ.setdefault(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS", "64" if REPS < 1000 else "256"
        )

    spark = get_spark("crossover_gen")
    ensure_data(spark)
    spark.stop()

    runs = os.environ.get("CROSSOVER_RUNS", "5" if REPS <= 10 else "3")
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=DIR,
        SPARK_GRAFT_BENCH_RUNS=runs,
        PANDAS_REF_RUNS=runs,
    )
    eng = subprocess.run(
        [sys.executable, f"{REPO}/bench.py"], env=env, capture_output=True, text=True
    )
    engine = json.loads(eng.stdout.strip().splitlines()[-1])

    # refuse to emit a column measured on a box whose state differs
    # >25% from the one the committed BENCH_HEAD record was taken on —
    # round 7's driver artifact was a 45%-slow contention run that only
    # the committed record could rebut; this makes crossover columns
    # self-policing. CROSSOVER_IGNORE_CALIB=1 overrides (e.g. first
    # record on a new box).
    calib = engine.get("box_calib_ms")
    head_path = os.path.join(REPO, "BENCH_HEAD.json")
    if calib and os.path.exists(head_path) and not os.environ.get("CROSSOVER_IGNORE_CALIB"):
        with open(head_path) as f:
            ref_calib = json.load(f).get("box_calib_ms")
        if ref_calib and abs(calib - ref_calib) / ref_calib > 0.25:
            print(
                f"REFUSED: box_calib_ms {calib} is >25% off the committed "
                f"BENCH_HEAD record ({ref_calib}) — box state not comparable; "
                "rerun on an idle box or set CROSSOVER_IGNORE_CALIB=1",
                file=sys.stderr,
            )
            sys.exit(2)

    if ENGINE_ONLY:
        print(
            json.dumps(
                {
                    "dir": DIR,
                    "replication": REPS,
                    "protocol": "engine only: bench.py (target-sf warmup, "
                    f"median of {runs}); pandas side skipped (--engine-only)",
                    "engine_box_calib_ms": calib,
                    "engine_only": engine["queries"],
                    "total": len(engine["queries"]),
                }
            )
        )
        return

    ref = subprocess.run(
        [sys.executable, f"{REPO}/tools/bench_pandas_ref.py", DIR],
        env=env,
        capture_output=True,
        text=True,
    )
    pandas_side = json.loads(ref.stdout.strip().splitlines()[-1])

    # BOTH columns must come from the same box moment (round-9 verdict
    # #7): the engine and pandas sides each stamp box_calib_ms; a >25%
    # spread between them means one column ran on a loaded box and the
    # per-query ratios are fiction — refuse the mix.
    pd_calib = pandas_side.get("box_calib_ms")
    if (
        calib and pd_calib
        and abs(calib - pd_calib) / min(calib, pd_calib) > 0.25
        and not os.environ.get("CROSSOVER_IGNORE_CALIB")
    ):
        print(
            f"REFUSED: engine column calib {calib} vs pandas column calib "
            f"{pd_calib} — >25% cross-moment drift within one crossover run; "
            "rerun on an idle box or set CROSSOVER_IGNORE_CALIB=1",
            file=sys.stderr,
        )
        sys.exit(2)

    shared = sorted(set(engine["queries"]) & set(pandas_side["queries"]))
    table = {
        q: {
            "pandas": pandas_side["queries"][q],
            "engine": engine["queries"][q],
            "engine_wins": engine["queries"][q] < pandas_side["queries"][q],
        }
        for q in shared
    }
    print(
        json.dumps(
            {
                "dir": DIR,
                "replication": REPS,
                "protocol": "engine: bench.py (target-sf warmup, median of 3); "
                "pandas: bench_pandas_ref.py (median of 5 after 1 warmup)",
                "engine_box_calib_ms": calib,
                "pandas_box_calib_ms": pd_calib,
                "queries": table,
                "engine_only": {
                    q: engine["queries"][q]
                    for q in engine["queries"]
                    if q not in pandas_side["queries"]
                },
                "engine_wins": sum(1 for v in table.values() if v["engine_wins"]),
                "total": len(table),
            }
        )
    )


if __name__ == "__main__":
    main()
