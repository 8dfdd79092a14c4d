"""Round-12 scale-safety tests: data-sized fan-out, the LocalRelation
row-cap boundary, and the per-invocation recompute (honesty) invariant.

The r11 verdict's one scale failure was core-count-keyed fan-out of
tiny Python stages (dedup spread = defaultParallelism, a 2 000-row
LocalRelation sliced defaultParallelism ways into mapInArrow). These
pin the r12 replacements: partition counts derive from proven data
size, the 2 000-row LocalRelation cliff is explicit, and no dedup
intermediate ever survives into the next invocation.
"""

from __future__ import annotations

import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas_spark as ps
from pandas_spark._sizing import bytes_sized_parts, plan_input_bytes, rows_sized_parts

from conftest import SF_DIR  # noqa: E402


def _plan(sdf) -> str:
    return sdf._jdf.queryExecution().explainString(
        sdf.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_rows_sized_parts_clamps():
    # data-derived, ceiling-clamped, floor 1
    assert rows_sized_parts(5000, 320, 32) == 16
    assert rows_sized_parts(100, 320, 32) == 1
    assert rows_sized_parts(10**9, 320, 32) == 32  # production scale: ceiling
    assert rows_sized_parts(None, 320, 32) is None  # unknown -> caller keeps layout
    assert rows_sized_parts(5000, 0, 32) is None  # knob disabled


def test_bytes_sized_parts_clamps():
    assert bytes_sized_parts(1 << 20, 32 << 20, 32) == 1
    assert bytes_sized_parts(100 << 30, 32 << 20, 32) == 32
    assert bytes_sized_parts(None, 32 << 20, 32) is None


def test_plan_input_bytes_reads_leaf_stats(spark):
    emb = ps.read_parquet(spark, f"{SF_DIR}/embeddings.parquet")
    b = plan_input_bytes(emb.spark)
    assert b is not None and b > 0


def test_dedup_spread_is_data_sized_not_core_count(spark, tmp_path, monkeypatch):
    """The fused collapse+spread exchange's partition count must come
    from the corpus row count (rows / SPARK_GRAFT_PY_PART_ROWS), not
    defaultParallelism. Uses a generated corpus above the LocalRelation
    cap (a local-relation input has no files, so the gate is moot) and
    a per-rows knob that lands BELOW the core ceiling, so a regression
    back to defaultParallelism is distinguishable."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pandas_spark.operators import dedup

    n = 2100  # above the 2000-row LocalRelation cap
    p = str(tmp_path / "docs.parquet")
    # cells must be WIDE (>64 B) so the corpus stays a FileScan — a
    # pool-eligible narrow table becomes an InMemoryRelation whose
    # inputFiles() is empty, and the spread gate (rightly) never fires
    filler = " ".join(f"w{j}" for j in range(30))
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(n)),
                "text": [f"{filler} alpha beta gamma {i % 97}" for i in range(n)],
            }
        ),
        p,
    )
    monkeypatch.setenv("SPARK_GRAFT_PY_PART_ROWS", "1024")
    docs = ps.read_parquet(spark, p)
    assert docs._rows_max == n
    target = spark.sparkContext.defaultParallelism
    expect = max(1, min((n + 1023) // 1024, target))  # 3 at the test corpus
    assert expect < target, "test must distinguish data-sizing from the core count"
    plan = _plan(
        dedup.minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.8).to_spark()
    )
    m = re.search(r"hashpartitioning\(md5\([^,]*, (\d+)\), REPARTITION_BY_NUM", plan)
    assert m, "fused collapse+spread exchange missing from the plan"
    assert int(m.group(1)) == expect


def test_cosine_topk_tiny_corpus_single_arrow_partition(spark):
    """A footer-proven tiny corpus must not fan the mapInArrow kernel
    out core-count ways: the plan carries a Coalesce below MapInArrow
    and the window needs no exchange (single partition satisfies its
    distribution)."""
    from pandas_spark import fshim as F
    from pandas_spark.operators.similarity import cosine_topk

    emb = ps.read_parquet(spark, f"{SF_DIR}/embeddings.parquet")
    emb = ps.DataFrame(
        emb.spark.withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    q = ps.DataFrame(
        emb.spark.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
    )
    plan = _plan(cosine_topk(emb, q, k=5).to_spark())
    assert "Coalesce" in plan
    assert "WindowGroupLimit" in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0


def test_local_relation_row_cap_boundary(spark, tmp_path):
    """The SPARK_GRAFT_LOCAL_REL_ROWS=2000 cliff, pinned on both sides:
    <=cap -> driver-local relation (LocalTableScan, no file scan);
    cap+1 -> a real scan plan (pool or parquet). Results identical."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cap = int(os.environ.get("SPARK_GRAFT_LOCAL_REL_ROWS", "2000"))
    paths = {}
    for n in (cap - 1, cap, cap + 1):
        p = str(tmp_path / f"t{n}.parquet")
        pq.write_table(
            pa.table({"k": list(range(n)), "v": [float(i) for i in range(n)]}), p
        )
        paths[n] = p

    def analyzed(path):
        f = ps.read_parquet(spark, path)
        return f, f.spark._jdf.queryExecution().analyzed().toString()

    for n in (cap - 1, cap):
        f, a = analyzed(paths[n])
        assert "LocalRelation" in a, f"{n} rows should be a driver-local relation"
        assert f.spark.count() == n
    f, a = analyzed(paths[cap + 1])
    assert "LocalRelation" not in a, "cap+1 rows must keep a real scan plan"
    assert f.spark.count() == cap + 1


def test_dedup_recomputes_every_invocation(spark):
    """HONESTY INVARIANT (r11 finding, r12 pinned): no dedup
    intermediate materialized by one invocation may serve the next.
    Build+run the query twice; by the time the second build finishes,
    the first run's MATERIALIZED column buffers must be gone, so the
    second action recomputes from the parquet inputs. (`storageLevel`
    is the wrong probe: the CacheManager matches plans semantically,
    so build 2's re-registration makes run 1's handle report
    persisted again — the buffers-loaded bit is the physical truth.)"""
    from pandas_spark.operators import dedup

    docs = ps.read_parquet(spark, f"{SF_DIR}/documents.parquet")

    def build():
        return dedup.minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.8).to_spark()

    def buffers_loaded(sdf):
        cm = spark._jsparkSession.sharedState().cacheManager()
        opt = cm.lookupCachedData(sdf._jdf)
        if opt.isEmpty():
            return None
        cd = opt.get().cachedRepresentation().cacheBuilder()
        return cd.isCachedColumnBuffersLoaded()

    # diff by VALUE identity, not key presence: an earlier test in the
    # same session may have registered the same semantic key, which
    # _cache_once pops and re-inserts under the same key
    before = {k: id(v) for k, v in dedup._CACHE_REGISTRY.items()}
    out1 = build()
    out1.write.format("noop").mode("overwrite").save()
    new_entries = [
        v for k, v in dedup._CACHE_REGISTRY.items() if before.get(k) != id(v)
    ]
    assert new_entries, "dedup build must register its cached base"
    first = new_entries[0]
    assert buffers_loaded(first) is True, "run 1 must materialize its own base"
    out2 = build()
    # the second build unpersisted run 1's materialization: its batches
    # cannot serve run 2's action
    assert buffers_loaded(first) is False, (
        "run 1's materialized buffers survived into run 2 — cross-run result reuse"
    )
    # and run 2 still computes the same answer from the inputs
    assert out2.count() == out1.count()
