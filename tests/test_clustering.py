"""Distributed Lloyd's k-means vs a single-node numpy reference.

The engine's two-phase iteration (Catalyst assign fold + Arrow
partial sums + deterministic driver combine) must be bit-identical to
textbook Lloyd on the same seeds — same assignments, same centroids.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import conftest  # noqa: E402,F401

import pandas_spark as ps  # noqa: E402
from pandas_spark.operators.clustering import kmeans  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _reference(X, k, iters):
    C = X[:k].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        for j in range(k):
            if (a == j).any():
                C[j] = X[a == j].mean(0)
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    return d.argmin(1), C


@pytest.mark.parametrize("k,iters", [(8, 2), (5, 3)])
def test_kmeans_matches_numpy_lloyd(spark, k, iters):
    emb = ps.read_parquet(spark, f"{SF_DIR}/embeddings.parquet")
    out, C = kmeans(emb, k=k, iters=iters)
    got = {r["vec_id"]: r["cell"] for r in
           out.to_spark().select("vec_id", "cell").collect()}

    rows = sorted(
        emb.to_spark().select("vec_id", "embedding").collect(),
        key=lambda r: r["vec_id"],
    )
    X = np.array([list(map(float, r["embedding"])) for r in rows])
    want_a, want_C = _reference(X, k, iters)
    ids = [r["vec_id"] for r in rows]
    mismatches = [i for i, a in zip(ids, want_a) if got[i] != a]
    assert not mismatches, mismatches[:5]
    assert np.abs(np.array(C) - want_C).max() == 0.0


def test_kmeans_empty_cell_keeps_centroid(spark):
    # k larger than distinct data clusters: some cells go empty on
    # iteration 1 and must keep their seed centroid (Lloyd's rule)
    import pandas as pd

    pdf = pd.DataFrame({
        "vec_id": range(6),
        "embedding": [[0.0, 0.0], [0.1, 0.0], [0.0, 0.1],
                      [9.0, 9.0], [9.1, 9.0], [9.0, 9.1]],
    })
    f = ps.from_pandas(spark, pdf)
    out, C = kmeans(f, k=3, iters=2)
    cells = sorted(r["cell"] for r in out.to_spark().select("cell").collect())
    X = np.array(list(pdf["embedding"]))
    want_a, want_C = _reference(X, 3, 2)
    assert cells == sorted(want_a)
    assert np.abs(np.array(C) - want_C).max() == 0.0
