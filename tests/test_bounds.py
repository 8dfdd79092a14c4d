"""Footer value-range proofs (bounds.py) and the tiered exact-sum gate.

The proofs must be SOUND against both parquet writer families:
parquet-cpp (pyarrow) ignores NaN when computing min/max, so its
finite stats prove only inf-absence; parquet-mr (Spark) orders NaN
as the largest double, so finite stats prove NaN-absence too.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import pandas_spark as ps
from pandas_spark.sources.io import _footer_proofs


def _write_pa(tmp_path, name, vals):
    p = str(tmp_path / name)
    pq.write_table(pa.table({"x": pa.array(vals, type=pa.float64())}), p)
    return p


def test_footer_proofs_pyarrow_clean(tmp_path):
    p = _write_pa(tmp_path, "clean.parquet", [1.0, 2.5, 3.0])
    nonnull, bounds, _ = _footer_proofs(p)
    assert "x" in nonnull
    lo, hi, nan_free = bounds["x"]
    assert (lo, hi) == (1.0, 3.0)
    assert nan_free is False  # parquet-cpp stats can't prove NaN-absence


def test_footer_proofs_pyarrow_inf_blocks_bounds(tmp_path):
    p = _write_pa(tmp_path, "inf.parquet", [1.0, float("inf"), 3.0])
    _, bounds, _ = _footer_proofs(p)
    assert "x" not in bounds  # inf reaches max → no finite proof


def test_footer_proofs_pyarrow_nan_still_bounds(tmp_path):
    # pyarrow IGNORES NaN in min/max: bounds exist (inf-freedom is
    # still proven) but nan_free must stay False
    p = _write_pa(tmp_path, "nan.parquet", [1.0, float("nan"), 3.0])
    _, bounds, _ = _footer_proofs(p)
    assert bounds["x"][:2] == (1.0, 3.0)
    assert bounds["x"][2] is False


def test_footer_proofs_sparkwriter_nan_free(spark, tmp_path):
    # parquet-mr writes NaN into max when present → finite stats imply
    # NaN-free; a clean Spark-written file must earn nan_free=True
    clean = str(tmp_path / "mr_clean")
    spark.createDataFrame([(1.0,), (2.0,)], "x double").coalesce(1) \
        .write.mode("overwrite").parquet(clean)
    _, bounds, _ = _footer_proofs(clean)
    assert bounds["x"] == (1.0, 2.0, True)
    nanny = str(tmp_path / "mr_nan")
    spark.createDataFrame([(1.0,), (float("nan"),)], "x double").coalesce(1) \
        .write.mode("overwrite").parquet(nanny)
    _, bounds, _ = _footer_proofs(nanny)
    assert "x" not in bounds  # NaN leaked into max → not finite


def test_column_interval_arithmetic(spark):
    from pandas_spark.bounds import column_interval
    import pyspark.sql.functions as F

    b = {"a": (1.0, 3.0, True), "d": (0.0, 0.1, False)}
    c = F.col("a") * (1 - F.col("d"))
    lo, hi, nan_free = column_interval(c, b)
    assert lo == pytest.approx(0.9) and hi == pytest.approx(3.0)
    assert nan_free is False  # d unproven → product unproven
    assert column_interval(F.col("a") + 2.5, b) == (3.5, 5.5, True)
    assert column_interval(-F.col("a"), b) == (-3.0, -1.0, True)
    assert column_interval(F.col("a") / F.col("d"), b) is None  # div unsupported
    assert column_interval(F.col("zzz") + 1, b) is None  # unknown leaf
    # overflow to inf → no proof
    big = {"a": (1e300, 1e308, True)}
    assert column_interval(F.col("a") * F.col("a"), big) is None


def test_bounds_propagate_and_ungate(spark, tmp_path):
    """read_parquet → filter → assign → groupby.agg: the proven
    columns' aggregates plan WITHOUT non-finite gating (no isnan, no
    inf counters), and the computed column inherits a proof by
    interval arithmetic."""
    p = str(tmp_path / "t.parquet")
    pdf = pd.DataFrame({"g": ["a", "b"] * 50,
                        "v": np.linspace(1.0, 2.0, 100),
                        "w": np.linspace(0.0, 0.5, 100)})
    pq.write_table(pa.Table.from_pandas(pdf), p)
    f = ps.read_parquet(spark, p)
    assert f._bounds["v"][:2] == (1.0, 2.0)
    f2 = f.filter(ps.col("v") <= 2.0).assign(z=ps.col("v") * (1 - ps.col("w")))
    assert f2._bounds["z"] is not None
    out = f2.groupby("g").agg(s=("z", "sum"), m=("v", "mean"))
    plan = out._sdf._jdf.queryExecution().optimizedPlan().toString()
    assert "Infinity" not in plan  # no ±inf counter aggregates
    got = out.sort_values("g").to_pandas()
    want = (pdf.assign(z=pdf.v * (1 - pdf.w)).groupby("g")
            .agg(s=("z", "sum"), m=("v", "mean")).reset_index())
    assert np.allclose(got["s"].values, want["s"].values)
    assert np.allclose(got["m"].values, want["m"].values)


def test_unproven_nan_and_inf_still_exact(spark, tmp_path):
    """Files CONTAINING non-finites keep pandas semantics: NaN skipped
    (pyarrow stats still yield bounds — the NaN gate must stay), inf
    propagates (no bounds — full gate)."""
    p1 = _write_pa(tmp_path, "nan2.parquet", [1.5, float("nan"), 2.25])
    got = ps.read_parquet(spark, p1).agg(s=("x", "sum"), m=("x", "mean")).to_pandas()
    assert got["s"][0] == pytest.approx(3.75)   # NaN skipped
    assert got["m"][0] == pytest.approx(1.875)
    p2 = _write_pa(tmp_path, "inf2.parquet", [1.0, float("inf"), 2.0])
    got = ps.read_parquet(spark, p2).agg(s=("x", "sum")).to_pandas()
    assert math.isinf(got["s"][0])
    p3 = _write_pa(tmp_path, "bothinf.parquet", [float("inf"), float("-inf")])
    got = ps.read_parquet(spark, p3).agg(s=("x", "sum")).to_pandas()
    assert math.isnan(got["s"][0])


def test_cast_to_float_is_narrowing(spark):
    """double→float overflows beyond ~3.4e38 — a proof must NOT
    propagate through the cast unless the child interval fits well
    inside float range (advisor-found soundness hole)."""
    from pandas_spark.bounds import column_interval
    import pyspark.sql.functions as F

    big = {"a": (1e38, 3e38, True)}
    assert column_interval(F.col("a").cast("float"), big) is None
    small = {"a": (1.0, 3.0, True)}
    iv = column_interval(F.col("a").cast("float"), small)
    assert iv is not None
    lo, hi, nan_free = iv
    assert lo == pytest.approx(1.0) and hi == pytest.approx(3.0)
    assert nan_free is True
    # cast-to-double stays provable (widening), endpoints ±1 ULP
    iv2 = column_interval(F.col("a").cast("double"), small)
    assert iv2 is not None and iv2[0] == pytest.approx(1.0) and iv2[1] == pytest.approx(3.0)
